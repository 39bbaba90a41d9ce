"""Copy-on-write MERGE (upsert) and compaction over a bucket-
partitioned parquet corpus table — the Iceberg-shaped maintenance
operations a standing 10¹²-doc corpus needs, expressed with plain
Spark so they run without any table-format runtime (the same fallback
posture as ``sources/catalog.py``; the reference engine has no
table-maintenance analog — filesystem in/out, ``Jochre.scala:186``).

Layout: one directory per deterministic key bucket
(``bucket=NNN/part-*.parquet``).  The bucket is the first 4 hex chars
of ``md5(key)`` mod ``n_buckets`` — portable (Python's hashlib
computes the identical bucket driver-side for point lookups) and
independent of partitioning, so writers at any parallelism produce
the same assignment.

Why copy-on-write per bucket: an upsert of U rows touches at most
``min(U, n_buckets)`` bucket directories; the other buckets' files
are NOT rewritten (test-pinned by file identity).  At 100 TB with
n_buckets=4096, merging a 1M-doc crawl drop rewrites ~4096 buckets'
worth of only the data that actually lives there — never the full
table.  Reads prune: ``read_for_keys`` computes the target buckets
driver-side and pushes a partition filter, so a point lookup scans
bucket directories, not the corpus.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "bucket_expr",
    "bucket_of",
    "write_partitioned",
    "merge_upsert",
    "read_for_keys",
    "compact_partitions",
]


def bucket_expr(key: str, n_buckets: int):
    """Deterministic bucket column: first 4 md5 hex chars mod n."""
    return (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10)
        .cast("int")
        % n_buckets
    ).alias("bucket")


def bucket_of(key_value: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`bucket_expr` (same md5 prefix)."""
    return int(hashlib.md5(str(key_value).encode()).hexdigest()[:4], 16) % n_buckets


def write_partitioned(
    df: DataFrame, path: str, key: str = "doc_id", n_buckets: int = 64
) -> None:
    """Create/replace the bucket-partitioned table."""
    df.withColumn("bucket", bucket_expr(key, n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "doc_id",
    n_buckets: int = 64,
) -> dict:
    """MERGE ``updates`` into the table at ``path``: rows whose key
    exists are replaced, new keys are inserted.  ``updates`` must be
    key-unique (the caller's contract, as in SQL MERGE).

    Copy-on-write: only the buckets the updates hash into are read
    (partition filter), merged (anti-join out the stale versions,
    union the updates), and rewritten via DYNAMIC partition overwrite —
    untouched bucket directories keep their exact files.  The merged
    frame is eagerly localCheckpointed before the write so the
    overwrite never reads from the files it replaces.

    Returns {"buckets_rewritten", "buckets_total", "rows_written"}.
    """
    upd = updates.withColumn("bucket", bucket_expr(key, n_buckets))
    # ≤ n_buckets rows — bounded driver collect, like the CC probes
    touched = sorted(
        r.bucket for r in upd.select("bucket").distinct().collect()
    )
    target = spark.read.parquet(path).filter(F.col("bucket").isin(touched))
    merged = (
        target.join(updates.select(key), key, "left_anti")
        .unionByName(upd.select(target.columns))
        .localCheckpoint(eager=True)
    )
    rows = merged.count()
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("bucket").parquet(path)
    return {
        "buckets_rewritten": len(touched),
        "buckets_total": n_buckets,
        "rows_written": rows,
    }


def read_for_keys(
    spark: SparkSession,
    path: str,
    keys: list[str],
    key: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Point lookups with partition pruning: the candidate buckets are
    computed driver-side from the keys, pushed as a partition filter
    (scans only those bucket directories), then the exact key filter
    applies within them."""
    buckets = sorted({bucket_of(k, n_buckets) for k in keys})
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col(key).cast("string").isin([str(k) for k in keys]))
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    max_files_per_bucket: int = 4,
    target_files: int = 1,
) -> dict:
    """Small-file compaction: rewrite only the bucket directories whose
    parquet-file count exceeds ``max_files_per_bucket``, coalescing
    each to ``target_files`` — repeated upserts fragment hot buckets,
    and scan cost at scale tracks file count as much as bytes.  Rows
    are untouched (rewrite-only); cold buckets keep their files.

    Directory listing is driver-side ``os`` (local/posix warehouse —
    the same scope as the rest of the parquet fallback; a real object
    store would list through its FS API)."""
    fragmented = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("bucket="):
            continue
        n_files = sum(
            1
            for f in os.listdir(os.path.join(path, entry))
            if f.endswith(".parquet")
        )
        if n_files > max_files_per_bucket:
            fragmented.append(int(entry.split("=", 1)[1]))
    if fragmented:
        rewrite = (
            spark.read.parquet(path)
            .filter(F.col("bucket").isin(fragmented))
            .repartition(max(target_files, 1) * len(fragmented), "bucket")
            .localCheckpoint(eager=True)
        )
        rewrite.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(path)
    return {"buckets_compacted": len(fragmented)}
