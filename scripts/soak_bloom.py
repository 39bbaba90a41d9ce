#!/usr/bin/env python3
"""Bloom-vs-exact decontamination macro A/B at 1M docs.

Scenario: a 100k-document eval suite (10% slice of a 1M-doc corpus)
must be decontaminated against the other 900k training docs.  Two
packaged paths over the SAME input:

  exact   job.py --corpus-op decontaminate — explodes the benchmark
          into ~7M distinct 4-gram shingle strings and broadcasts them
          into a hash join (the broadcast grows WITH the benchmark);
          emits one row per contaminated (doc, bench) pair.
  packed  job.py --corpus-op bloom-decontaminate-packed — packs the
          same shingle set into a FIXED k×16^w-bit bitmap (fill and
          size printed by the job), broadcasts ~100 MB of bytes, and
          probes with one narrow mapInPandas pass: zero joins, zero
          shuffle, one verdict row per doc.

Verification: the packed verdict set must CONTAIN the exact
contaminated-doc set (Bloom filters have no false negatives); the
difference is the measured false-positive count at this fill.

Usage: python scripts/soak_bloom.py [--n-total 1000000]
       [--bloom-width 7 --bloom-k 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("SOAK_WORK", "/root/tmpwork/bloom_soak")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_dedup import sample_rss_max  # noqa: E402  (tree-scoped RSS)


def run_packaged(argv: list[str], engine_zip: str) -> dict:
    stop = threading.Event()
    rss: dict = {}
    pid_box: dict = {}
    sampler = threading.Thread(
        target=sample_rss_max, args=(pid_box, stop, rss), daemon=True
    )
    sampler.start()
    t0 = time.time()
    child = subprocess.Popen(
        [
            "spark-submit", "--master", "local[32]",
            "--driver-memory", "8g", "--py-files", engine_zip, "job.py",
        ] + argv,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    pid_box["pid"] = child.pid
    out_s, err_s = child.communicate()
    wall = round(time.time() - t0, 1)
    stop.set()
    sampler.join()
    # spark-submit merges app stderr into its stdout when stderr is not
    # a TTY — harvest JSON from both streams
    lines = out_s.splitlines() + err_s.splitlines()
    js = [json.loads(ln) for ln in lines if ln.startswith("{")]
    return {
        "rc": child.returncode, "sec": wall,
        "max_rss_gib": rss.get("max_rss_gib"), "json": js,
        "stderr_tail": err_s[-1500:] if child.returncode else "",
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-total", type=int, default=1_000_000)
    p.add_argument("--bloom-width", type=int, default=7)
    p.add_argument("--bloom-k", type=int, default=4)
    args = p.parse_args()

    os.makedirs(WORK, exist_ok=True)
    bench_path = f"{WORK}/bench.parquet"
    train_path = f"{WORK}/train.parquet"

    from pyspark.sql import functions as F

    from jochre3_ocr_spark.plans.pipeline import get_spark
    from jochre3_ocr_spark.sources.corpus import adversarial_corpus

    # ---- phase 1: generate + split (10% eval slice, 90% train)
    t0 = time.time()
    spark = get_spark("bloom-gen", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = adversarial_corpus(
        spark, args.n_total, n_exact=1_000, n_near=1_000
    )
    # adversarial_corpus ids are "d%07d" — split on the numeric suffix
    idnum = F.substring("doc_id", 2, 12).cast("long")
    corpus.filter(idnum % 10 == 0).write.mode(
        "overwrite"
    ).parquet(bench_path)
    corpus.filter(idnum % 10 != 0).write.mode(
        "overwrite"
    ).parquet(train_path)
    n_bench = spark.read.parquet(bench_path).count()
    n_train = spark.read.parquet(train_path).count()
    bench_grams = (
        spark.read.parquet(bench_path)
        .select(F.explode(F.expr(
            "transform(sequence(1, greatest(size(split(text,' '))-3, 0)),"
            " i -> concat_ws(' ', slice(split(text,' '), i, 4)))"
        )).alias("g")).agg(F.countDistinct("g")).collect()[0][0]
    )
    spark.stop()
    print(json.dumps({
        "phase": "generate", "n_bench": n_bench, "n_train": n_train,
        "bench_distinct_4grams": int(bench_grams),
        "sec": round(time.time() - t0, 1),
    }), flush=True)

    engine_zip = f"{WORK}/engine.zip"
    if os.path.exists(engine_zip):
        os.remove(engine_zip)
    subprocess.run(["zip", "-qr", engine_zip, "jochre3_ocr_spark"],
                   cwd=REPO, check=True)

    # ---- phase 2: exact shingle-join decontamination, packaged
    exact = run_packaged([
        "--corpus-op", "decontaminate", "--ngram", "4",
        "--benchmark", bench_path,
        "--input", train_path, "--output", f"{WORK}/exact.parquet",
    ], engine_zip)
    print(json.dumps({"phase": "exact_packaged", **exact}), flush=True)
    if exact["rc"] != 0:
        print(exact["stderr_tail"], file=sys.stderr)
        return 1

    # ---- phase 3: packed-bitmap bloom, packaged
    packed = run_packaged([
        "--corpus-op", "bloom-decontaminate-packed", "--ngram", "4",
        "--bloom-width", str(args.bloom_width),
        "--bloom-k", str(args.bloom_k),
        "--benchmark", bench_path,
        "--input", train_path, "--output", f"{WORK}/bloom.parquet",
    ], engine_zip)
    print(json.dumps({"phase": "packed_packaged", **packed}), flush=True)
    if packed["rc"] != 0:
        print(packed["stderr_tail"], file=sys.stderr)
        return 1

    # ---- phase 4: verify no-false-negatives + measure FP count
    spark = get_spark("bloom-verify", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    exact_ids = spark.read.parquet(f"{WORK}/exact.parquet").select(
        "doc_id"
    ).distinct()
    bloom_pos = spark.read.parquet(f"{WORK}/bloom.parquet").filter(
        "contaminated"
    ).select("doc_id")
    n_exact_ids = exact_ids.count()
    n_bloom = bloom_pos.count()
    missed = exact_ids.join(bloom_pos, "doc_id", "left_anti").count()
    fp = n_bloom - (n_exact_ids - missed)
    verdict = {
        "phase": "verify",
        "exact_contaminated_docs": n_exact_ids,
        "bloom_contaminated_docs": n_bloom,
        "false_negatives": missed,
        "false_positives": fp,
        "ok": missed == 0,
    }
    spark.stop()
    print(json.dumps(verdict), flush=True)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
