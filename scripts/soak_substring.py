#!/usr/bin/env python3
"""Exact-substring dedup at adversarial density (round-5 operator,
macro-scale drive).

Runs `job.py --corpus-op substring-strip` PACKAGED over the same
1M-document adversarial corpus as the dedup soak (100k-member exact
boilerplate group + 10k-member near-dup family + 890k xorshift-unique
docs, `sources/corpus.adversarial_corpus`), then verifies the output
against a CLOSED-FORM expectation computed independently:

* every exact-group doc is fully covered by corpus-repeated windows ->
  clean_text '' and n_removed == 110;
* every near-dup doc keeps EXACTLY the tokens no mutation-free 8-token
  window can cover — its 2 unique mutation tokens plus any position
  trapped within < 8 clear tokens of a document edge or the other
  mutation; the expected kept-count per doc is simulated per index
  (pure python, no Spark) and compared doc-for-doc;
* every unique doc is untouched (xorshift mixing means no accidental
  8-token window repeats at 50k vocab — n_removed == 0 for all 890k).

A failure in any segment is a real operator bug, not a flaky fixture.
Results go to stdout as JSON lines; BENCH.md records the run.

Usage: python scripts/soak_substring.py [--n-total 1000000]
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
WORK = os.environ.get("SOAK_WORK", "/root/tmpwork/substr_soak")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from soak_dedup import sample_rss_max  # noqa: E402  (tree-scoped RSS)

K = 8
NEAR_LEN = 110


def expected_near_kept(j: int) -> int:
    """Positions of near-doc j that NO mutation-free k-window covers.

    Mirrors `adversarial_corpus`: mutations at (j*7)%55 and
    55+(j*13)%55. A position is covered iff some window [s, s+K) within
    [0, NEAR_LEN) contains it and avoids both mutations (such a window
    repeats across thousands of family members, so it is always
    corpus-duplicated)."""
    m1, m2 = (j * 7) % 55, 55 + (j * 13) % 55
    covered = [False] * NEAR_LEN
    for s in range(NEAR_LEN - K + 1):
        if m1 not in range(s, s + K) and m2 not in range(s, s + K):
            for p in range(s, s + K):
                covered[p] = True
    return sum(1 for c in covered if not c)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-total", type=int, default=1_000_000)
    p.add_argument("--n-exact", type=int, default=100_000)
    p.add_argument("--n-near", type=int, default=10_000)
    args = p.parse_args()

    os.makedirs(WORK, exist_ok=True)
    corpus_path = f"{WORK}/corpus.parquet"
    out_path = f"{WORK}/stripped.parquet"

    # ---- phase 1: generate (reuses the dedup soak's corpus if present)
    import duckdb

    have = 0
    if os.path.isdir(corpus_path):
        try:
            have = duckdb.sql(
                f"SELECT count(*) FROM '{corpus_path}/*.parquet'"
            ).fetchone()[0]
        except Exception:
            have = 0
    if have != args.n_total:
        from jochre3_ocr_spark.plans.pipeline import get_spark
        from jochre3_ocr_spark.sources.corpus import adversarial_corpus

        t0 = time.time()
        spark = get_spark("substr-gen", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        adversarial_corpus(
            spark, args.n_total, args.n_exact, args.n_near
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()
        print(json.dumps({
            "phase": "generate", "n_total": args.n_total,
            "sec": round(time.time() - t0, 1),
        }), flush=True)
    else:
        print(json.dumps({"phase": "generate", "reused": True,
                          "n_total": have}), flush=True)

    # ---- phase 2: packaged substring-strip with tree-scoped RSS
    engine_zip = f"{WORK}/engine.zip"
    if os.path.exists(engine_zip):
        os.remove(engine_zip)
    subprocess.run(["zip", "-qr", engine_zip, "jochre3_ocr_spark"],
                   cwd=REPO, check=True)
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
            "--driver-memory", "8g", "--py-files", engine_zip,
            "job.py", "--corpus-op", "substring-strip",
            "--input", corpus_path, "--output", out_path,
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    pid_box["pid"] = child.pid
    out_s, err_s = child.communicate()
    wall = round(time.time() - t0, 1)
    stop.set()
    sampler.join()
    all_lines = out_s.splitlines() + err_s.splitlines()
    job_line = [ln for ln in all_lines if ln.startswith('{"corpus_op"')]
    print(json.dumps({
        "phase": "strip_packaged", "rc": child.returncode, "sec": wall,
        "max_rss_gib": rss.get("max_rss_gib"),
        "job": json.loads(job_line[-1]) if job_line else None,
    }), flush=True)
    if child.returncode != 0:
        sys.stderr.write(err_s[-4000:])
        return 1

    # ---- phase 3: closed-form verification
    seg = duckdb.sql(f"""
        SELECT CASE WHEN doc_id < 'd{args.n_exact:07d}' THEN 'exact'
                    WHEN doc_id < 'd{args.n_exact + args.n_near:07d}'
                         THEN 'near' ELSE 'unique' END AS seg,
               count(*) AS n,
               sum(CASE WHEN clean_text = '' THEN 1 ELSE 0 END) AS empty,
               sum(n_removed) AS removed,
               min(n_kept) AS min_kept, max(n_kept) AS max_kept
        FROM '{out_path}/*.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    stats = {r[0]: r for r in seg}
    near_rows = duckdb.sql(f"""
        SELECT CAST(substr(doc_id, 2) AS INTEGER) - {args.n_exact} AS j,
               n_kept
        FROM '{out_path}/*.parquet'
        WHERE doc_id >= 'd{args.n_exact:07d}'
          AND doc_id < 'd{args.n_exact + args.n_near:07d}'
    """).fetchall()
    near_bad = sum(
        1 for j, kept in near_rows if kept != expected_near_kept(j)
    )
    ok = (
        stats["exact"][1] == args.n_exact
        and stats["exact"][2] == args.n_exact          # all fully stripped
        and stats["exact"][3] == args.n_exact * 110
        and stats["near"][1] == args.n_near
        and near_bad == 0
        and stats["unique"][1] == args.n_total - args.n_exact - args.n_near
        and stats["unique"][3] == 0                    # untouched
    )
    print(json.dumps({
        "phase": "verify", "ok": ok,
        "segments": {k: {"n": v[1], "empty": v[2], "removed": v[3],
                         "kept_range": [v[4], v[5]]}
                     for k, v in stats.items()},
        "near_docs_mismatching_simulation": near_bad,
    }), flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
