"""Structured Streaming facade over the batch extraction pipeline.

The reference is batch-per-document (SURVEY.md §2.11 — its only streams
are a PDF page iterator and HTTP bodies), so the streaming surface here
is incremental ingestion of new docs-parquet files: readStream →
the same narrow extraction kernel → writeStream with
``Trigger.AvailableNow`` (process everything currently available, then
stop) and exactly-once file-sink semantics via the checkpoint — the
Spark-idiomatic resume (complements the anti-join resume of
plans/pipeline.run_job).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jochre3_ocr_spark.plans.pipeline import (
    PipelineConfig,
    _RAW_OUT_DDL,
    _make_extract_fn,
    _prune_to_json,
)
from jochre3_ocr_spark.schema import DOCS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    await_termination: bool = True,
):
    """Incrementally extract any docs-parquet files not yet processed.

    Returns the StreamingQuery (already terminated when
    ``await_termination``). Re-running picks up only NEW files — the
    checkpoint's file log is the source of truth.
    """
    config = config or PipelineConfig()
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    pruned = _prune_to_json(docs).drop("n_in_spans")
    raw = pruned.mapInPandas(_make_extract_fn(lexicon_bc, config), schema=_RAW_OUT_DDL)

    query = (
        raw.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
