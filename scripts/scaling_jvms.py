#!/usr/bin/env python3
"""N→4N EXECUTOR-JVM scaling probe (north_rule criterion ≥0.8).

This sandbox has no multi-node cluster, so the truest N→4N-executor
experiment it allows is Spark's `local-cluster[N, cores, mem]` master:
N separate executor JVMs with separate Python worker pools and real
(loopback) shuffles between them — unlike `local[N]`, which shares one
JVM. Protocol (BENCH.md rounds 2-3, now committed instead of ad hoc):

  * materialize one corpus to parquet (excluded from timing)
  * for each config: warm the executors, then min-of-3 timed runs of
    the salted extraction pipeline writing parquet
  * efficiency = (throughput_4N / throughput_N) / 4

Run from the repo root with an idle box (check `uptime`); the package
is shipped to the executor JVMs via addPyFile of a fresh zip.

Usage: python scripts/scaling_jvms.py [--n-docs 20000] [--cores 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=20_000)
    p.add_argument("--cores", type=int, default=2,
                   help="cores PER executor JVM (keep N*cores*2 <= box "
                   "cores so the 4N config is not bandwidth-bound)")
    p.add_argument("--mem-mb", type=int, default=3072)
    args = p.parse_args()
    sys.path.insert(0, REPO)

    # under /root/tmpwork, never /tmp: this box reaps /tmp externally
    # (CLAUDE.md), and the materialized corpus must survive the whole
    # warmup + min-of-3 protocol
    base_dir = "/root/tmpwork"
    os.makedirs(base_dir, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jochre3_jvm_scaling_", dir=base_dir)
    try:
        return _run(args, work)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _run(args, work: str) -> int:
    from jochre3_ocr_spark.plans.pipeline import (
        extract_with_salting,
        get_spark,
    )
    from jochre3_ocr_spark.sources.corpus import docs_df, lexicon_words

    engine_zip = f"{work}/engine.zip"
    subprocess.run(
        ["zip", "-qr", engine_zip, "jochre3_ocr_spark"], cwd=REPO,
        check=True,
    )
    inp = f"{work}/docs.parquet"
    spark = get_spark("jvm-scaling-gen", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs_df(spark, args.n_docs, partitions=128).write.mode(
        "overwrite"
    ).parquet(inp)
    spark.stop()

    try:
        la1 = round(os.getloadavg()[0], 2)
    except Exception:
        la1 = None
    result: dict = {"n_docs": args.n_docs, "cores_per_executor": args.cores,
                    "load_1m_at_start": la1}
    for n_exec in (1, 4):
        master = f"local-cluster[{n_exec},{args.cores},{args.mem_mb}]"
        spark = get_spark(
            f"jvm-scaling-{n_exec}", master=master,
            shuffle_partitions=n_exec * args.cores,
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.addPyFile(engine_zip)
        docs = spark.read.parquet(inp)
        # warm executor registration + python workers + plan JIT
        extract_with_salting(
            docs.limit(4 * n_exec * args.cores), lexicon_words()
        ).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            t0 = time.time()
            extract_with_salting(docs, lexicon_words()).write.mode(
                "overwrite"
            ).parquet(f"{work}/out_{n_exec}.parquet")
            el = time.time() - t0
            best = el if best is None else min(best, el)
        result[f"executors_{n_exec}"] = {
            "master": master,
            "sec": round(best, 2),
            "docs_per_sec": round(args.n_docs / best, 2),
        }
        spark.stop()
    thr1 = result["executors_1"]["docs_per_sec"]
    thr4 = result["executors_4"]["docs_per_sec"]
    result["scaling_efficiency_1_to_4_jvms"] = round((thr4 / thr1) / 4, 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
