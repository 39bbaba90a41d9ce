#!/usr/bin/env python3
"""PageRank macro drive: packaged `job.py --corpus-op pagerank` over a
page-level link graph at two parallelism levels.

Scenario: a 1M-node / 5M-edge two-tier web graph (hubs collect ~2 500
in-links each — the hot reduce keys partial aggregation must absorb)
ranked for 3 iterations, packaged under spark-submit, once at
local[N] and once at local[4N].

Verification:
  * determinism — the integer-arithmetic promise at macro scale: the
    two runs (DIFFERENT partitioning, different parallelism) must
    produce byte-identical (node, rank) sets, checked by a full
    anti-join both ways in DuckDB;
  * mass bound — total rank never exceeds n_nodes × scale (floors
    only lose mass);
  * scaling — throughput efficiency between the two levels, the
    north-rule N→4N criterion evidenced on an ITERATIVE job.

Usage: python scripts/soak_pagerank.py [--n-pages 1000000]
       [--out-deg 5] [--iters 3] [--cores-small 2 --cores-big 8]
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
WORK = os.environ.get("SOAK_WORK", "/root/tmpwork/pagerank_soak")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_dedup import sample_rss_max  # noqa: E402


def run_packaged(argv: list[str], engine_zip: str, cores: int) -> dict:
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
            "spark-submit", "--master", f"local[{cores}]",
            "--driver-memory", "8g", "--py-files", engine_zip, "job.py",
        ] + argv,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    pid_box["pid"] = child.pid
    out_s, err_s = child.communicate()
    wall = round(time.time() - t0, 1)
    stop.set()
    sampler.join()
    lines = out_s.splitlines() + err_s.splitlines()
    js = [json.loads(ln) for ln in lines if ln.startswith("{")]
    return {
        "rc": child.returncode, "sec": wall,
        "max_rss_gib": rss.get("max_rss_gib"), "json": js,
        "stderr_tail": err_s[-1500:] if child.returncode else "",
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-pages", type=int, default=1_000_000)
    p.add_argument("--out-deg", type=int, default=5)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--cores-small", type=int, default=2)
    p.add_argument("--cores-big", type=int, default=8)
    args = p.parse_args()

    os.makedirs(WORK, exist_ok=True)
    edges_path = f"{WORK}/edges.parquet"

    from jochre3_ocr_spark.operators.graphs import synthesize_page_graph
    from jochre3_ocr_spark.plans.pipeline import get_spark

    t0 = time.time()
    spark = get_spark("pagerank-gen", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_page_graph(
        spark, args.n_pages, out_deg=args.out_deg
    ).write.mode("overwrite").parquet(edges_path)
    n_edges = spark.read.parquet(edges_path).count()
    spark.stop()
    print(json.dumps({
        "phase": "generate", "n_pages": args.n_pages,
        "n_edges": n_edges, "sec": round(time.time() - t0, 1),
    }), flush=True)

    engine_zip = f"{WORK}/engine.zip"
    if os.path.exists(engine_zip):
        os.remove(engine_zip)
    subprocess.run(["zip", "-qr", engine_zip, "jochre3_ocr_spark"],
                   cwd=REPO, check=True)

    walls: dict[int, float] = {}
    for cores in (args.cores_small, args.cores_big):
        out_path = f"{WORK}/ranks_c{cores}.parquet"
        res = run_packaged([
            "--corpus-op", "pagerank", "--pr-iters", str(args.iters),
            "--shuffle-partitions", str(max(cores * 4, 8)),
            "--input", edges_path, "--output", out_path,
        ], engine_zip, cores)
        print(json.dumps(
            {"phase": f"pagerank_local[{cores}]", **res}), flush=True)
        if res["rc"] != 0:
            print(res["stderr_tail"], file=sys.stderr)
            return 1
        # job wall from the job's own JSON line (excludes submit cost)
        job_sec = next(
            j["sec"] for j in res["json"] if j.get("corpus_op") == "pagerank"
        )
        walls[cores] = job_sec

    import duckdb

    con = duckdb.connect()
    a = f"{WORK}/ranks_c{args.cores_small}.parquet/*.parquet"
    b = f"{WORK}/ranks_c{args.cores_big}.parquet/*.parquet"
    diff = con.execute(f"""
        SELECT count(*) FROM (
          (SELECT node, rank, out_deg, in_deg FROM '{a}'
           EXCEPT SELECT node, rank, out_deg, in_deg FROM '{b}')
          UNION ALL
          (SELECT node, rank, out_deg, in_deg FROM '{b}'
           EXCEPT SELECT node, rank, out_deg, in_deg FROM '{a}')
        )""").fetchone()[0]
    total, n_nodes, max_rank = con.execute(
        f"SELECT CAST(sum(rank) AS BIGINT), count(*), max(rank) FROM '{a}'"
    ).fetchone()
    ratio = args.cores_big / args.cores_small
    eff = round(walls[args.cores_small] / walls[args.cores_big] / ratio, 3)
    verdict = {
        "phase": "verify",
        "cross_parallelism_diff_rows": diff,
        "n_nodes": n_nodes,
        "mass_ok": total <= n_nodes * 10**9,
        "max_rank_units": max_rank,
        "wall_small": walls[args.cores_small],
        "wall_big": walls[args.cores_big],
        "scaling_efficiency": eff,
        "ok": diff == 0 and total <= n_nodes * 10**9,
    }
    print(json.dumps(verdict), flush=True)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
