#!/usr/bin/env python3
"""Crawl-frontier macro drive: packaged `job.py --corpus-op frontier`
over 10M raw urls at two parallelism levels.

Scenario: 10 000 000 messy crawl urls over 2 000 000 canonical pages
(5 surface variants each — the dedup pressure the canonical groupBy
collapses) across the 256-host space, with md5-steered robots rules
and a precomputed host-authority table (so the measured job is the
frontier composition itself, not the upstream PageRank — that one has
its own soak).

Verification:
  * determinism — the two runs (different partitioning/parallelism)
    must produce identical (canonical_url, n_variants, host_rank,
    allowed, priority) sets (full DuckDB anti-join both ways);
  * sanity — canonical page count, verdict mix, priority spread;
  * scaling — throughput efficiency between the two levels.

Usage: python scripts/soak_frontier.py [--n-urls 10000000]
       [--share-mod 2000000] [--cores-small 2 --cores-big 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("SOAK_WORK", "/root/tmpwork/frontier_soak")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_pagerank import run_packaged  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-urls", type=int, default=10_000_000)
    p.add_argument("--share-mod", type=int, default=2_000_000)
    p.add_argument("--cores-small", type=int, default=2)
    p.add_argument("--cores-big", type=int, default=8)
    args = p.parse_args()

    os.makedirs(WORK, exist_ok=True)
    urls_path = f"{WORK}/urls.parquet"
    ranks_path = f"{WORK}/ranks.parquet"

    from jochre3_ocr_spark.operators.graphs import (
        pagerank,
        synthesize_link_graph,
    )
    from jochre3_ocr_spark.operators.urls import (
        bridge_node_ranks,
        synthesize_urls,
    )
    from jochre3_ocr_spark.plans.pipeline import get_spark

    t0 = time.time()
    spark = get_spark("frontier-gen", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(args.n_urls).withColumnRenamed("id", "doc_id")
    synthesize_urls(ids, share_mod=args.share_mod).write.mode(
        "overwrite"
    ).parquet(urls_path)
    # host authority precomputed once (the frontier job's --benchmark
    # input) — node → url-host bridge over the shared 2-hex id
    bridge_node_ranks(
        pagerank(synthesize_link_graph(ids), iters=3)
    ).write.mode("overwrite").parquet(ranks_path)
    n_urls = spark.read.parquet(urls_path).count()
    spark.stop()
    print(json.dumps({
        "phase": "generate", "n_urls": n_urls,
        "share_mod": args.share_mod, "sec": round(time.time() - t0, 1),
    }), flush=True)

    engine_zip = f"{WORK}/engine.zip"
    if os.path.exists(engine_zip):
        os.remove(engine_zip)
    subprocess.run(["zip", "-qr", engine_zip, "jochre3_ocr_spark"],
                   cwd=REPO, check=True)

    walls: dict[int, float] = {}
    for cores in (args.cores_small, args.cores_big):
        out_path = f"{WORK}/frontier_c{cores}.parquet"
        res = run_packaged([
            "--corpus-op", "frontier",
            "--shuffle-partitions", str(max(cores * 4, 8)),
            "--benchmark", ranks_path,
            "--input", urls_path, "--output", out_path,
        ], engine_zip, cores)
        print(json.dumps(
            {"phase": f"frontier_local[{cores}]", **res}), flush=True)
        if res["rc"] != 0:
            print(res["stderr_tail"], file=sys.stderr)
            return 1
        walls[cores] = next(
            j["sec"] for j in res["json"] if j.get("corpus_op") == "frontier"
        )

    import duckdb

    con = duckdb.connect()
    a = f"{WORK}/frontier_c{args.cores_small}.parquet/*.parquet"
    b = f"{WORK}/frontier_c{args.cores_big}.parquet/*.parquet"
    cols = "canonical_url, host, n_variants, host_rank, allowed, priority"
    diff = con.execute(f"""
        SELECT count(*) FROM (
          (SELECT {cols} FROM '{a}' EXCEPT SELECT {cols} FROM '{b}')
          UNION ALL
          (SELECT {cols} FROM '{b}' EXCEPT SELECT {cols} FROM '{a}')
        )""").fetchone()[0]
    n_pages, n_blocked, n_prio, max_prio = con.execute(f"""
        SELECT count(*),
               sum(CASE WHEN NOT allowed THEN 1 ELSE 0 END),
               sum(CASE WHEN priority > 0 THEN 1 ELSE 0 END),
               max(priority)
        FROM '{a}'""").fetchone()
    ratio = args.cores_big / args.cores_small
    eff = round(walls[args.cores_small] / walls[args.cores_big] / ratio, 3)
    verdict = {
        "phase": "verify",
        "cross_parallelism_diff_rows": diff,
        "n_pages": n_pages,
        "n_blocked": n_blocked,
        "n_positive_priority": n_prio,
        "max_priority": max_prio,
        "wall_small": walls[args.cores_small],
        "wall_big": walls[args.cores_big],
        "scaling_efficiency": eff,
        "ok": diff == 0 and n_pages == args.share_mod and n_blocked > 0,
    }
    print(json.dumps(verdict), flush=True)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
