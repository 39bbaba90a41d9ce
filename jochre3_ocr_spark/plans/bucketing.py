"""doc_id-bucketed storage for co-located joins (north_star: "doc_id-
bucketed partitioning").

At 100 TB scale, downstream jobs repeatedly join extraction output with
other per-document tables (gold corpora for evaluation, metadata,
dedup verdicts). Bucketing both sides by ``doc_id`` lets those joins run
with NO exchange: Spark's bucketed scan exposes the hash partitioning
to Catalyst, which elides the shuffle (SortMergeJoin over pre-bucketed
inputs). Bucketed tables require the session catalog (saveAsTable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "doc_id",
    path: str | None = None,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id"
) -> bool:
    """True when the join plan contains no Exchange on either side —
    the observable guarantee bucketing buys."""
    joined = spark.table(left_table).join(spark.table(right_table), key)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
