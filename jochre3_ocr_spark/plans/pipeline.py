"""The end-to-end Spark extraction pipeline.

Physical plan shape (SURVEY.md §4):

    Scan docs (parquet/Iceberg; column-pruned to doc_id, spans)
      → [resume anti-join on checkpointed doc_ids]
      → split: normal docs (narrow mapInPandas, ZERO shuffle)
             | giant docs  (split at block boundaries → salted chunks →
                            kernel → groupBy(doc_id) reassemble — the only
                            shuffle, and only over the skewed 1%)
      → union → write parquet/Iceberg + checkpoint table

Design notes for 100 TB / 1000 executors:
* the normal path is embarrassingly parallel: one Arrow batch in, one
  out, whole job pipelined with no exchange;
* span arrays cross the JVM↔Python boundary as JSON strings
  (``to_json`` / ``from_json``, both JVM whole-stage codegen).
  Arrow conversion of array<struct> columns to pandas dict objects
  measured ~10× slower than JSON round-tripping at this span density
  (~200 spans/doc) — the hot boundary is the engine's main cost;
* the giant-doc path implements the north_rule's salted repartition —
  a 200-page document becomes ~N chunk rows spread across executors;
  correctness of reassembly relies on block independence (content joins
  are per top-level block: Page.scala:156-166);
* the lexicon ships once per executor via SparkContext.broadcast;
* resume is an anti-join against completed doc_ids derived from
  committed output — idempotent because task files commit atomically.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.errors import AnalysisException

from jochre3_ocr_spark.schema import PipelineConfig

# spans-per-chunk when splitting giant docs; docs above the giant
# threshold get split at top-level block boundaries
CHUNK_TARGET_SPANS = 2_000
GIANT_THRESHOLD_SPANS = 8_000
#: resume: broadcast the TODO id set (payload-free semi-join) up to this
#: many ids (~50 B each hashed ≈ 250 MB at the cap); beyond it, fall back
#: to the payload anti-join — at that point most of the corpus is
#: unprocessed and the shuffle is proportionate to the remaining work
RESUME_BROADCAST_MAX_IDS = 5_000_000

_OUT_FIELDS = (
    "doc_id spans_json text processed_text alternatives_json n_spans "
    "n_words mean_confidence language status error".split()
)

_SPAN_ARRAY_DDL = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_RAW_OUT_DDL = (
    "doc_id string, spans_json string, text string, processed_text string, "
    "alternatives_json string, n_spans int, n_words int, "
    "mean_confidence double, language string, "
    "status string, error string"
)

_CHUNK_DDL = "doc_id string, chunk_id int, spans_json string"
_CHUNK_OUT_DDL = "chunk_id int, " + _RAW_OUT_DDL


def get_spark(
    app_name: str = "jochre3-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
) -> SparkSession:
    import os

    builder = (
        SparkSession.builder.appName(app_name)
        # local[N] runs all executor threads in the driver JVM: the 1g
        # default heap OOMs ≥100k docs under 32 threads of string churn.
        # NOTE: this in-code setting only applies when PYTHON launches the
        # JVM (pytest / `python bench.py`). Under spark-submit the JVM
        # pre-exists — pass `--driver-memory 8g` or export
        # SPARK_DRIVER_MEMORY=8g (both honored by spark-submit itself).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.filterPushdown", "true")
        # python-kernel-heavy workload: cost per ROW dwarfs cost per byte,
        # and span columns compress ~30×, so split scans much finer than
        # the 128m default to keep every core busy (tune per cluster)
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "262144")
        # task-granular atomic commits (v2): a killed job leaves only
        # fully-committed task files, which the resume anti-join then
        # skips — v1's job-level commit can resurrect a dead attempt's
        # staging files as duplicates (found by the kill-resume test)
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        # parquet writers buffer a full row group PER TASK before flushing;
        # at 32 local threads the 128 MB default can pin ~4 GB of heap on
        # wide span rows (measured: 100k-doc job OOMs an 8 GB driver).
        # 32 MB keeps scan parallelism fine at these file sizes.
        .config("spark.hadoop.parquet.block.size", str(32 * 1024 * 1024))
        # ...but the writer only CHECKS the block size every
        # min(100, adaptive) records (InternalParquetRecordWriter
        # .checkBlockSizeReached, floor = parquet.page.size.row.check.min)
        # — with multi-MB giant-doc rows the buffer overshoots 32 MB by
        # 100×+ before the first check. Measured at 1M docs / local[32]:
        # 228 MB direct-buffer reservations in the snappy compressor ×
        # 32 writer tasks exhausted a 12 GB MaxDirectMemorySize and
        # killed the job (TASK_WRITE_FAILED). Checking every row bounds
        # writer memory to ~block.size per task; the check is O(columns)
        # and unmeasurable against the per-row kernel cost.
        .config("spark.hadoop.parquet.page.size.row.check.min", "1")
        .config("spark.hadoop.parquet.page.size.row.check.max", "32")
        # the vectorized reader materializes 4096 rows per batch by
        # default; span rows average ~200 struct elements (giants 40k+),
        # so a batch can hit tens of MB PER TASK — the measured OOM site
        # at 100k docs (FileScanRDD.hasNext). 512 bounds scan memory 8×
        # with no measurable throughput cost on this row shape.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
    )
    if master:
        builder = builder.master(master)
    return builder.getOrCreate()


def _spans_json_to_tuples(spans_json: str) -> list[tuple]:
    return [
        (s.get("kind"), s.get("text"), s.get("media_ref"), s.get("offset"))
        for s in json.loads(spans_json)
    ]


_JSON_NEEDS_ESCAPE = re.compile(r'[\x00-\x1f"\\]')


def _json_str(s) -> str:
    if s is None:
        return "null"
    if _JSON_NEEDS_ESCAPE.search(s) is None:
        return '"' + s + '"'
    return json.dumps(s, ensure_ascii=False)


def _tuples_to_json(spans) -> str:
    """Byte-identical to ``json.dumps([{...}, ...], ensure_ascii=False)``
    over the span dicts (same separators, same escaping — strings
    needing escapes fall back to json.dumps), ~35% faster by skipping
    the intermediate dict objects. The span JSON is the engine's hot
    JVM↔Python transport (~0.4 ms/doc of encode at corpus density)."""
    parts = []
    ap = parts.append
    for k, t, m, o in spans:
        ap(
            '{"kind": %s, "text": %s, "media_ref": %s, "offset": %s}'
            % (
                _json_str(k),
                _json_str(t),
                _json_str(m),
                "null" if o is None else o,
            )
        )
    return "[" + ", ".join(parts) + "]"


# per-worker-process lexicon cache: tasks reuse the Lexicon (and its warm
# to_yivo/frequency lru_caches) across the worker's lifetime
_WORKER_LEXICONS: dict[int, object] = {}


def _lexicon_cache_key(lexicon_bc):
    # The Broadcast wrapper is re-deserialized per task, so id() is unstable
    # across tasks AND can be reused by a different broadcast (CPython address
    # reuse). The broadcast FILE PATH is stable per broadcast on both driver
    # and workers and unique across broadcasts — key on it (then _bid for
    # JVM-side wrappers). The content-fingerprint fallback never touches
    # .value on a cache hit only when path/bid exist, so keep it last.
    path = getattr(lexicon_bc, "_path", None)
    if path is not None:
        return ("path", path)
    bid = getattr(lexicon_bc, "_bid", None)
    if bid is not None:
        return ("bid", bid)
    entries = lexicon_bc.value
    h = hashlib.md5()
    h.update(str(len(entries)).encode())
    for w in sorted(entries)[:1000]:
        h.update(w.encode("utf-8", "surrogatepass"))
        h.update(b"\x00")
    return ("fp", h.hexdigest())


def _get_worker_lexicon(lexicon_bc):
    key = _lexicon_cache_key(lexicon_bc)
    lex = _WORKER_LEXICONS.get(key)
    if lex is None:
        from jochre3_ocr_spark.functions.lexicon import Lexicon

        lex = Lexicon(frozenset(lexicon_bc.value))
        _WORKER_LEXICONS.clear()  # one lexicon per job is the norm
        _WORKER_LEXICONS[key] = lex
    return lex


def _finalize(raw: DataFrame) -> DataFrame:
    """Restore the array<struct> spans column from JSON (JVM-side)."""
    return raw.select(
        "doc_id",
        F.from_json("spans_json", _SPAN_ARRAY_DDL).alias("spans"),
        "text",
        "processed_text",
        "alternatives_json",
        "n_spans",
        "n_words",
        "mean_confidence",
        "language",
        "status",
        "error",
    )


def _make_extract_fn(lexicon_bc, config: PipelineConfig):
    """Build the mapInPandas kernel; the lexicon arrives via broadcast."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jochre3_ocr_spark.operators.kernel import process_document_safe

        lexicon = _get_worker_lexicon(lexicon_bc)
        for batch in batches:
            rows = []
            for doc_id, spans_json in zip(batch["doc_id"], batch["spans_json"]):
                out = process_document_safe(
                    doc_id, _spans_json_to_tuples(spans_json), lexicon, config
                )
                out["spans_json"] = _tuples_to_json(out.pop("spans"))
                rows.append(out)
            yield pd.DataFrame(rows, columns=_OUT_FIELDS)

    return extract_batches


def _prune_to_json(docs: DataFrame) -> DataFrame:
    # fast path: a producer that already encodes spans as JSON (plus an
    # optional span count) skips the arrow-struct → JVM to_json round
    # trip — measured ~25% off the salted Yiddish query at sf0.1
    if "spans_json" in docs.columns:
        n = (
            F.col("n_in_spans")
            if "n_in_spans" in docs.columns
            else F.size(F.from_json("spans_json", _SPAN_ARRAY_DDL))
        )
        return docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "spans_json",
            n.cast("int").alias("n_in_spans"),
        )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.to_json("spans").alias("spans_json"),
        F.size("spans").alias("n_in_spans"),
    )


def extract(
    docs: DataFrame,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    materialize_spans: bool = False,
) -> DataFrame:
    """Narrow extraction over a docs DataFrame — no shuffle.

    Column-prunes to (doc_id, spans) so parquet/Iceberg scans read only
    what the kernel needs. With ``materialize_spans`` the output spans
    come back as array<struct> (from_json, JVM); default keeps them as a
    JSON string column — ~2× cheaper end-to-end at high span density.
    """
    config = config or PipelineConfig()
    spark = docs.sparkSession
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))
    pruned = _spread_small_input(_prune_to_json(docs).drop("n_in_spans"))
    raw = pruned.mapInPandas(_make_extract_fn(lexicon_bc, config), schema=_RAW_OUT_DDL)
    return _finalize(raw) if materialize_spans else raw


# ------------------------------------------------------- giant-doc salting
def _split_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Split each giant doc's span list into chunk rows at top-level
    block/media boundaries (blocks are independent for every downstream
    semantic — Page.scala:156-166)."""
    for batch in batches:
        rows = []
        for doc_id, spans_json in zip(batch["doc_id"], batch["spans_json"]):
            spans = json.loads(spans_json)
            chunks: list[list] = [[]]
            for s in spans:
                if (
                    s.get("kind") in ("block", "media")
                    and len(chunks[-1]) >= CHUNK_TARGET_SPANS
                ):
                    chunks.append([])
                chunks[-1].append(s)
            for i, chunk in enumerate(chunks):
                if chunk:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_id": i,
                            "spans_json": json.dumps(chunk, ensure_ascii=False),
                        }
                    )
        yield pd.DataFrame(rows, columns=["doc_id", "chunk_id", "spans_json"])


def _make_chunk_extract_fn(lexicon_bc, config: PipelineConfig):
    def extract_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jochre3_ocr_spark.operators.kernel import process_document_safe

        lexicon = _get_worker_lexicon(lexicon_bc)
        for batch in batches:
            rows = []
            for doc_id, chunk_id, spans_json in zip(
                batch["doc_id"], batch["chunk_id"], batch["spans_json"]
            ):
                out = process_document_safe(
                    doc_id, _spans_json_to_tuples(spans_json), lexicon, config
                )
                out["spans_json"] = _tuples_to_json(out.pop("spans"))
                out["chunk_id"] = int(chunk_id)
                rows.append(out)
            yield pd.DataFrame(rows, columns=["chunk_id", *_OUT_FIELDS])

    return extract_chunks


def _majority_language(pdf: pd.DataFrame):
    counts: dict = {}
    for lang, n in zip(pdf["language"], pdf["n_words"]):
        if lang is not None and not (isinstance(lang, float) and pd.isna(lang)):
            counts[lang] = counts.get(lang, 0) + int(n)
    if not counts:
        return None
    return sorted(counts.items(), key=lambda kv: -kv[1])[0][0]


def _reassemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge chunk outputs back into one document row (applyInPandas).

    Text joins mirror Page.content / Page.processedContent: "\\n\\n" and
    "\\n" over text-bearing chunks."""
    pdf = pdf.sort_values("chunk_id")
    spans: list[dict] = []
    for chunk_json in pdf["spans_json"]:
        for s in json.loads(chunk_json):
            s["offset"] = len(spans)
            spans.append(s)
    texts = [t for t in pdf["text"] if t]
    processed = [t for t in pdf["processed_text"] if t]
    alts: dict = {}
    for a in pdf["alternatives_json"]:
        if a:
            alts.update(json.loads(a))
    errors = [e for e in pdf["error"] if e]
    return pd.DataFrame(
        [
            {
                "doc_id": key[0],
                "spans_json": json.dumps(spans, ensure_ascii=False),
                "text": "\n\n".join(texts),
                "processed_text": "\n".join(processed),
                "alternatives_json": json.dumps(alts, ensure_ascii=False),
                "n_spans": len(spans),
                "n_words": int(pdf["n_words"].sum()),
                # exact word-count-weighted mean over chunks (the page
                # mean is over ALL words, Jochre.scala:365-380)
                "mean_confidence": (
                    float(
                        (pdf["mean_confidence"] * pdf["n_words"]).sum()
                        / pdf["n_words"].sum()
                    )
                    if pdf["n_words"].sum() > 0
                    else 0.0
                ),
                # giant-doc path votes by word count (chunk outputs don't
                # carry per-block language counts; documented deviation
                # from the block-count page vote on the salted path only)
                "language": _majority_language(pdf),
                "status": "error" if errors else "ok",
                "error": "; ".join(errors) or None,
            }
        ]
    )


def extract_with_salting(
    docs: DataFrame,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    giant_threshold: int = GIANT_THRESHOLD_SPANS,
    materialize_spans: bool = False,
    all_giant: bool = False,
) -> DataFrame:
    """Skew-aware extraction: normal docs stay on the narrow zero-shuffle
    path; giant docs are split into block-aligned chunks, spread across
    the cluster (the salt — north_rule), processed, and reassembled.

    The input is scanned twice (once per branch), which is cheap:
    predicate pushdown keeps the giant branch's scan+to_json to the
    skewed ~1%, and column pruning reads only (doc_id, spans). A
    single-scan variant with a persisted intermediate measured ~40%
    slower at sf0.1 — caching the full first-pass output costs more
    than re-scanning compressed parquet."""
    config = config or PipelineConfig()
    spark = docs.sparkSession
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))
    pruned = _prune_to_json(docs)
    # The two-branch split re-executes the input subtree once per
    # branch. For a bare parquet scan that is the RIGHT trade (column-
    # pruned compressed rescan beats materializing — measured ~40%
    # faster at sf0.1, round 5); for a DERIVED input (Python corpus
    # generator, a bridge with joins) the re-execution repeats real
    # work, so materialize it once instead (lazy local checkpoint: the
    # first branch's action computes it, the second reads it back).
    if (
        not all_giant
        and not pruned.isStreaming  # localCheckpoint is batch-only
        and not _rescans_cheaply(pruned)
    ):
        pruned = pruned.localCheckpoint(eager=False)

    # ``all_giant``: the caller asserts every input doc exceeds the
    # threshold (e.g. it already split upstream on a closed-form span
    # estimate). The normal branch would be provably empty — but each
    # branch re-executes the input subtree, so an empty branch over a
    # Python-built input still pays a full builder pass for zero rows.
    if all_giant:
        giant = pruned.drop("n_in_spans")
        normal = None
    else:
        normal = pruned.filter(
            F.col("n_in_spans") <= giant_threshold
        ).drop("n_in_spans")
        giant = pruned.filter(F.col("n_in_spans") > giant_threshold).drop(
            "n_in_spans"
        )

    raw_normal = (
        None
        if normal is None
        else _spread_small_input(normal).mapInPandas(
            _make_extract_fn(lexicon_bc, config), schema=_RAW_OUT_DDL
        )
    )

    chunks = giant.mapInPandas(_split_chunks, schema=_CHUNK_DDL)
    # spread chunks of the same giant doc across executors (the salt).
    # The partition COUNT must be explicit: chunk rows are ~100 KB of
    # span JSON but cost ~40 ms of kernel each — row-cost-bound, not
    # byte-bound — and without a user-specified count AQE's byte-based
    # coalescing folds the whole salt shuffle into ONE partition
    # (measured at sf0.1: 90 chunks → 1 task → the entire giant branch
    # serialized, 3.4 s of kernel on one core). repartition(n, cols) is
    # a user-specified shuffle AQE will not re-coalesce.
    n_salt = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism,
    )
    chunks = chunks.repartition(n_salt, F.col("doc_id"), F.col("chunk_id"))
    chunk_out = chunks.mapInPandas(
        _make_chunk_extract_fn(lexicon_bc, config), schema=_CHUNK_OUT_DDL
    )
    raw_giant = chunk_out.groupBy("doc_id").applyInPandas(
        _reassemble, schema=_RAW_OUT_DDL
    )
    raw = (
        raw_giant
        if raw_normal is None
        else raw_normal.unionByName(raw_giant)
    )
    return _finalize(raw) if materialize_spans else raw


# ----------------------------------------------- plain-text ingestion path
WORDS_PER_LINE = 12


def text_to_spans(text: str, words_per_line: int = WORDS_PER_LINE) -> list[tuple]:
    """Tokenize plain text into the docs span encoding: one block, lines of
    ``words_per_line`` words (the ALTO XML scan analog for text sources —
    SURVEY.md §2.1)."""
    tokens = [t for t in (text or "").split(" ") if t]
    spans: list[tuple] = [("block", None, None, 0)]

    def emit(kind, text=None):
        spans.append((kind, text, None, len(spans)))

    for i in range(0, len(tokens), words_per_line):
        emit("line")
        for j, tok in enumerate(tokens[i : i + words_per_line]):
            if j > 0:
                emit("space", " ")
            emit("word", tok)
    return spans


def extract_text_df(
    docs: DataFrame,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_spans: bool = False,
) -> DataFrame:
    """Run the extraction engine over a plain-text document table
    (e.g. the driver's ``documents`` parquet): tokenize → spans → kernel.
    Narrow (zero-shuffle) like :func:`extract`."""
    config = config or PipelineConfig()
    spark = docs.sparkSession
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))
    pruned = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    pruned = _spread_small_input(pruned)

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jochre3_ocr_spark.operators.kernel import process_document_safe

        lexicon = _get_worker_lexicon(lexicon_bc)
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                out = process_document_safe(
                    doc_id, text_to_spans(text), lexicon, config
                )
                out["spans_json"] = _tuples_to_json(out.pop("spans"))
                rows.append(out)
            yield pd.DataFrame(rows, columns=_OUT_FIELDS)

    raw = pruned.mapInPandas(extract_batches, schema=_RAW_OUT_DDL)
    return _finalize(raw) if materialize_spans else raw


def _rescans_cheaply(df: DataFrame) -> bool:
    """True when re-executing ``df``'s plan is essentially a columnar
    file rescan: no Python stage, shuffle, join, aggregate or window
    upstream. Consumers with multiple branches over the same input use
    this to choose between re-scanning (cheap for parquet — the
    round-5 measurement) and materializing once (right for derived
    inputs). Conservative on any introspection failure: re-scan, the
    long-proven shape. A localCheckpoint'ed input shows as a bare RDD
    scan — correctly 'cheap'."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 — introspection only
        return True
    markers = (
        "MapInPandas",
        "ArrowEvalPython",
        "BatchEvalPython",
        "PythonMapInArrow",
        "FlatMapGroupsInPandas",
        "Join",
        "Aggregate",
        "Repartition",
        "Sort",
        "Window",
        "Union",
        "Generate",
    )
    return not any(m in plan for m in markers)


#: logical-plan markers whose presence means the frame's partitioning is
#: produced by a stage boundary (shuffle/Python/AQE-sized), not by the
#: file scan — ``df.rdd`` on such a frame EXECUTES the upstream stages
#: under AQE (AdaptiveSparkPlanExec materializes every shuffle stage at
#: RDD-construction time), so the partition-count probe below must never
#: touch it.
_WIDE_PLAN_MARKERS = (
    "Repartition",
    "Rebalance",  # RebalancePartitions — AQE-coalescible, probe-unsafe
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "InPandas",  # MapInPandas, FlatMap(Co)GroupsInPandas, …
    "InArrow",
    "EvalPython",
    "Generate",
    "Union",
    "GlobalLimit",
    "Offset",
)


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Kernel cost is per ROW, but scan parallelism is per FILE SPLIT —
    and a parquet file is splittable only at row-group boundaries, so a
    small/compact input (one row group) pins the whole fused
    scan→kernel stage to 1-2 cores. When the input would yield fewer
    partitions than the cluster has slots, pay one metadata-sized
    round-robin shuffle to unlock every core. At production scale the
    input has ≫ cores splits and this is a no-op (no Exchange added —
    the narrow-plan guarantee holds exactly when it matters).

    Probe discipline (round 6): ``df.rdd.getNumPartitions()`` is only
    safe on a scan/narrow subtree — under AQE, constructing the RDD of
    a frame with an upstream shuffle EXECUTES that shuffle's map
    stages at query-CONSTRUCTION time (measured: one full job per
    probe; at corpus scale that is a double execution of the whole
    upstream aggregation). For derived inputs the decision therefore
    comes from the plan alone:

    * the only wide node is an explicit ``Repartition(n >= slots)``
      (an upstream caller already spread this subtree, only narrow
      ops above it) → no-op;
    * otherwise use Catalyst's free ``sizeInBytes`` estimate — AQE's
      byte-based coalescing can pin a frame below ``slots`` partitions
      ONLY when it is byte-small, so a frame estimated ≫
      slots × advisory-partition-size keeps its natural width and
      needs no spread, while a small estimate gets the explicit
      repartition (user counts are AQE-exempt; the shuffle is
      metadata-sized by the same estimate).

    Streaming frames pass through untouched: ``df.rdd`` is illegal on
    a streaming DataFrame, and the spread is a batch-scan concern
    (round-6 self-review — operators like pq_encode/_windows that
    spread their input stay composable under readStream)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        plan_str = plan.toString()
    except Exception:  # noqa: BLE001 — introspection only
        plan_str = None
    if plan_str is None or not any(
        m in plan_str for m in _WIDE_PLAN_MARKERS
    ):
        # scan/narrow subtree: RDD construction schedules nothing
        if df.rdd.getNumPartitions() < slots:
            return df.repartition(slots)
        return df
    import re

    # Already-spread check (two review rounds hardened it): a shuffle
    # repartition prints `Repartition n, true`, a keyed one
    # `RepartitionByExpression [cols], n` — both spread to n
    # partitions (and a keyed one must NOT get a round-robin stacked
    # on top, which would destroy the caller's co-partitioning). A
    # coalesce prints `Repartition n, false`, only REDUCES partitions,
    # and pins the frame regardless of what sits below it — its
    # presence anywhere disqualifies the skip (the size path below
    # then decides: byte-small frames get the explicit spread, undoing
    # the pin).
    counts = [
        int(n) for n in re.findall(r"Repartition (\d+), true", plan_str)
    ] + [
        int(n)
        for n in re.findall(
            r"RepartitionByExpression \[[^\]]*\], (\d+)", plan_str
        )
    ]
    has_coalesce = re.search(r"Repartition \d+, false", plan_str)
    only_repartition = not any(
        m in plan_str for m in _WIDE_PLAN_MARKERS if m != "Repartition"
    )
    if (
        only_repartition
        and counts
        and max(counts) >= slots
        and not has_coalesce
    ):
        return df
    try:
        raw = plan.stats().sizeInBytes()
        # py4j converts scala.math.BigInt to a Python int when it
        # fits; larger values come back as a JavaObject
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:  # noqa: BLE001 — stats estimate only
        return df  # can't see: leave the frame alone (perf-neutral)
    # 64 MB is AQE's default advisory partition size; anything
    # estimated past slots× that keeps >= slots partitions on its own
    if size > slots * (64 << 20):
        return df
    return df.repartition(slots)


# ------------------------------------------------------- vision-path OCR
def ocr_corpus(
    spark: SparkSession,
    n_docs: int,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    partitions: int | None = None,
    pages_per_doc: int = 2,
) -> DataFrame:
    """Distributed end-to-end OCR over layout-oracle pages: each row is a
    document; the kernel segments its pages, classifies glyphs, runs the
    guesser and transformer (operators/ocr.py). Narrow — zero shuffle."""
    config = config or PipelineConfig()
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jochre3_ocr_spark.operators.ocr import ocr_document
        from jochre3_ocr_spark.sources.layout_oracle import (
            build_page,
            glyph_content_lookup,
        )

        lexicon = _get_worker_lexicon(lexicon_bc)
        for batch in batches:
            rows = []
            for i in batch["id"]:
                layouts, lookups = [], []
                for p in range(pages_per_doc):
                    layout, gt = build_page(int(i), p)
                    layouts.append(layout)
                    lookups.append(glyph_content_lookup(gt))
                try:
                    out = ocr_document(
                        f"doc{int(i):08d}", layouts, lookups, lexicon, config
                    )
                    out["spans_json"] = _tuples_to_json(out.pop("spans"))
                except Exception as exc:  # noqa: BLE001
                    out = {
                        "doc_id": f"doc{int(i):08d}",
                        "spans_json": "[]",
                        "text": None,
                        "processed_text": None,
                        "alternatives_json": None,
                        "n_spans": 0,
                        "n_words": 0,
                        "mean_confidence": 0.0,
                        "language": None,
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                rows.append(out)
            yield pd.DataFrame(rows, columns=_OUT_FIELDS)

    rng = spark.range(n_docs, numPartitions=partitions)
    return rng.mapInPandas(run, schema=_RAW_OUT_DDL)


def ocr_documents(
    docs: DataFrame,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 4,
    lines_per_block: int = 3,
    blocks_per_page: int = 4,
) -> DataFrame:
    """Vision-path OCR over a plain-text document table: each document's
    words are laid out as deterministic RTL page geometry (layout oracle
    with injected prediction imperfections), then run through the full
    segment → classify → guess → transform chain. Narrow — zero shuffle.

    Because the layout is an exact function of the input words, the
    recovered processed text equals the input words re-chunked into
    blocks of ``words_per_line * lines_per_block`` — an independently
    SQL-derivable oracle for the whole vision path."""
    config = config or PipelineConfig()
    spark = docs.sparkSession
    lexicon_bc = spark.sparkContext.broadcast(list(lexicon_words))
    pruned = _spread_small_input(
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        from jochre3_ocr_spark.operators.ocr import ocr_document
        from jochre3_ocr_spark.sources.layout_oracle import (
            build_pages_from_words,
            glyph_content_lookup,
        )

        lexicon = _get_worker_lexicon(lexicon_bc)
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                words = [w for w in (text or "").split(" ") if w]
                seed_ix = (
                    int(doc_id)
                    if doc_id.isdigit()
                    else zlib.crc32(doc_id.encode())
                )
                pages = build_pages_from_words(
                    seed_ix,
                    words,
                    words_per_line=words_per_line,
                    lines_per_block=lines_per_block,
                    blocks_per_page=blocks_per_page,
                )
                layouts = [p[0] for p in pages]
                lookups = [glyph_content_lookup(p[1]) for p in pages]
                try:
                    out = ocr_document(doc_id, layouts, lookups, lexicon, config)
                    out["spans_json"] = _tuples_to_json(out.pop("spans"))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    out = {
                        "doc_id": doc_id,
                        "spans_json": "[]",
                        "text": None,
                        "processed_text": None,
                        "alternatives_json": None,
                        "n_spans": 0,
                        "n_words": 0,
                        "mean_confidence": 0.0,
                        "language": None,
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                rows.append(out)
            yield pd.DataFrame(rows, columns=_OUT_FIELDS)

    return pruned.mapInPandas(run, schema=_RAW_OUT_DDL)


# ------------------------------------------- lineage / partition metrics
def _is_missing_read(e: Exception, path: str | None = None) -> bool:
    """True when an AnalysisException means "nothing written here yet".

    Prefers the structured error class (Spark ≥3.4 ``getCondition`` /
    3.3 ``getErrorClass``) over message text — vendor builds word the
    message differently and a missed match fails a legitimate first
    run (ADVICE r4); falls back to the message, then to a literal
    local-path existence probe."""
    cond = None
    for getter in ("getCondition", "getErrorClass"):
        fn_ = getattr(e, getter, None)
        if callable(fn_):
            try:
                cond = fn_()
            except Exception:  # noqa: BLE001 — probe only
                cond = None
            if cond:
                break
    probe = f"{cond or ''} {e}"
    return (
        "PATH_NOT_FOUND" in probe
        or "UNABLE_TO_INFER_SCHEMA" in probe
        or (
            path is not None
            and path.startswith("/")
            and not os.path.exists(path)
        )
    )


def doc_lineage(spark: SparkSession, output_path: str) -> DataFrame:
    """Per-document lineage: which committed task file holds each doc
    (north_rule: per-partition checkpointed lineage). Task files are the
    durable unit of work under FileOutputCommitter v2 — one row per
    (doc_id, committed file)."""
    return spark.read.parquet(output_path).select(
        "doc_id",
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
        "status",
    )


def write_partition_metrics(
    spark: SparkSession, output_path: str, metrics_path: str
) -> int:
    """Append per-partition (per committed task file) metrics rows for
    files not yet checkpointed: doc/ok/error counts, span and word
    totals (north_rule: per-partition lineage + metrics enabling
    resume). Incremental: re-running after a resume adds rows only for
    the newly committed files, so totals never double-count. Returns
    the number of NEW files checkpointed this run.

    Derived from the committed output itself (one cheap column-pruned
    scan), so the metrics are exactly consistent with what a reader of
    the output sees — not with what an in-flight task hoped to write."""
    out = spark.read.parquet(output_path).select(
        "doc_id",
        "n_spans",
        "n_words",
        "status",
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
    )
    # Only a genuinely ABSENT metrics table means "first run, checkpoint
    # everything". A read failure on an EXISTING table (corrupt/partial
    # parquet, permission error, transient IO) must propagate: swallowing
    # it would re-append rows for ALL committed files and silently
    # double-count totals on resume (ADVICE r2, medium).
    fs_path = metrics_path[len("file:"):] if metrics_path.startswith("file:") else metrics_path
    metrics_exist = (
        os.path.isdir(fs_path) or os.path.isfile(fs_path)
        if fs_path.startswith("/")
        else True  # non-local FS: let the read itself decide
    )
    if metrics_exist:
        try:
            seen = spark.read.parquet(metrics_path).select("file").distinct()
        except AnalysisException as e:
            if _is_missing_read(e):
                seen = None  # racing first run / empty dir: nothing seen yet
            else:
                raise
        if seen is not None:
            out = out.join(F.broadcast(seen), "file", "left_anti")
    new = (
        out.groupBy("file")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_error"),
            F.sum("n_spans").alias("total_spans"),
            F.sum("n_words").alias("total_words"),
        )
        .withColumn("committed_at", F.current_timestamp())
    )
    new.write.mode("append").parquet(metrics_path)
    return spark.read.parquet(metrics_path).select("file").distinct().count()


# ----------------------------------------------------------------- resume
def run_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    lexicon_words: list[str],
    config: PipelineConfig | None = None,
    salted: bool = True,
    metrics_path: str | None = None,
) -> int:
    """Resumable batch run: anti-join completed doc_ids, process the rest,
    append. Returns the total number of completed docs."""
    # clear stale staging from a killed attempt: with a fresh job about to
    # write, any leftover _temporary content belongs to a dead run and
    # would otherwise be swept into this job's commit (duplicate rows)
    import shutil

    stale = os.path.join(output_path, "_temporary") if output_path.startswith("/") else None
    if stale and os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)

    # "table:NAME" reads a catalog table (Iceberg / bucketed-parquet,
    # sources/catalog.py); anything else is a parquet path
    if input_path.startswith("table:"):
        docs = spark.table(input_path[len("table:"):])
    else:
        docs = spark.read.parquet(input_path)
    # The missing-output probe catches ONLY the analysis-time "no output
    # yet" errors. Everything after it runs eager Spark jobs (counts,
    # shuffles) whose RUNTIME failures must PROPAGATE: a broad except
    # here would turn e.g. an ENOSPC during the id count into
    # todo = docs — a silent full reprocess APPENDING millions of
    # duplicate rows on top of the committed output.
    try:
        done = (
            spark.read.parquet(output_path).select("doc_id").distinct()
        )
        done.schema  # force analysis inside the guarded region
    except AnalysisException as e:
        if _is_missing_read(e, output_path):
            done = None  # first run: nothing committed yet
        else:
            raise
    todo_ids = None
    if done is None:
        todo = docs
    else:
        # Resume anti-join, PAYLOAD-FREE: the naive
        # docs.join(done, anti) sort-merge-shuffles the full document
        # payload once `done` outgrows Spark's broadcast threshold — at
        # the 10M-doc soak (8.2M committed) that shuffle spilled tens of
        # GB of text to local disk and died ENOSPC (BENCH.md round 4).
        # Whichever id set is small gets broadcast so the payload never
        # shuffles: late resume → broadcast the TODO ids (semi-join);
        # early resume → broadcast the DONE ids (anti-join). Both counts
        # run on ids-only column-pruned scans; the counted frame is
        # persisted so the broadcast reuses it instead of re-scanning
        # the (large) output ids and re-running the anti-join. Only when
        # BOTH sides exceed the cap (mid-backfill of a corpus ≫ 10M on
        # one box) does the payload anti-join remain — on a real
        # cluster that regime is served by doc_id-bucketed tables
        # instead (co-located join, zero shuffle; sources/catalog.py,
        # SCALE.md §5).
        done = done.persist()
        n_done = done.count()
        if n_done <= RESUME_BROADCAST_MAX_IDS:
            todo = docs.join(F.broadcast(done), "doc_id", "left_anti")
        else:
            todo_ids = docs.select("doc_id").join(
                done, "doc_id", "left_anti"
            ).persist()
            n_todo = todo_ids.count()
            if n_todo == 0:
                todo = docs.limit(0)
            elif n_todo <= RESUME_BROADCAST_MAX_IDS:
                todo = docs.join(
                    F.broadcast(todo_ids), "doc_id", "left_semi"
                )
            else:
                todo = docs.join(done, "doc_id", "left_anti")
    fn = extract_with_salting if salted else extract
    result = fn(todo, lexicon_words, config)
    try:
        result.write.mode("append").parquet(output_path)
    finally:
        if done is not None:
            done.unpersist()
        if todo_ids is not None:
            todo_ids.unpersist()
    if metrics_path:
        write_partition_metrics(spark, output_path, metrics_path)
    return spark.read.parquet(output_path).select("doc_id").distinct().count()
