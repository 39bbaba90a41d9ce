"""Exact-substring deduplication: find token windows that repeat anywhere
in the corpus, merge them into per-document spans, and strip them.

This is the span-level companion to the whole-document dedup family in
``dedup.py`` — the construction popularised for LLM training corpora by
Lee et al., *Deduplicating Training Data Makes Language Models Better*
(ACL 2022): a fixed-width sliding window over the token stream, a
corpus-wide repeat test on the window hash, and removal of every token
covered by a repeated window.  The reference engine has no corpus-level
analog (it processes one document at a time, ``Jochre.scala:186-211``);
this exists for the training-data side of the pipeline.

100 TB posture: the window table is linear in corpus tokens (one row per
token position, never tokens × k), the repeat test is a hash-partitioned
aggregate on the window hash followed by a semi-join on the SAME key (so
AQE reuses the exchange), and span merging is a per-document window
function — no operator is quadratic in anything.  A pathological hash
shared by millions of positions costs one hot reduce key in the count
aggregate only; it never fans out (the semi-join returns each position
once).  Suffix-array formulations find *maximal* repeats; the fixed-k
window form trades that exactness for a shuffle-only plan, the standard
trade at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "duplicated_window_spans",
    "strip_duplicated_spans",
    "contaminated_window_spans",
    "decontaminate_spans",
    "contamination_stats",
]


def _windows(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, whash) — one row per k-token window start position."""
    from jochre3_ocr_spark.plans.pipeline import _spread_small_input

    # one md5 per window start is row-cost-bound work fused into the
    # scan; a compact parquet input yields only a few splits, pinning it
    # to as many cores — spread first (no-op at production split counts)
    toks = _spread_small_input(
        docs.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
        ).where(F.size("__toks") >= k)
    )
    # sequence(0, n-k) is safe: n >= k is enforced above (Spark's sequence
    # DESCENDS when stop < start, which would fabricate windows).
    return toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - k),
                lambda i: F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, F.lit(k)))),
            )
        ).alias("pos", "whash"),
    )


def _bench_window_hashes(
    benchmark: DataFrame, text_col: str, k: int
) -> DataFrame:
    """Distinct window hashes of the benchmark side — derived without
    touching any id column (the benchmark only contributes text, so its
    schema need not carry the corpus id_col)."""
    b = benchmark.select(
        F.lit("").alias("__bid"), F.col(text_col).alias("__btxt")
    )
    return _windows(b, "__btxt", "__bid", k).select("whash").distinct()


def _merge_hit_spans(hit: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge (id, pos) window-start hits into disjoint per-document token
    spans: (id_col, span_start, span_end, n_windows), end exclusive."""
    w = Window.partitionBy(id_col).orderBy("pos")
    # Uniform window width k makes interval merging a lag test: positions
    # are sorted, so the running max end IS lag(pos)+k — a new island
    # starts exactly when the gap to the previous window exceeds k.
    flagged = hit.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + F.lit(k)),
            1,
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("__island")
    )


def duplicated_window_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Merged per-document token spans covered by any k-token window whose
    exact text occurs ``min_count``+ times corpus-wide (same-document
    repeats count).

    Returns (id_col, span_start, span_end, n_windows): 0-based token
    indices, end exclusive; overlapping and adjacent windows merge.
    """
    wins = _windows(docs, text_col, id_col, k)
    dup = (
        wins.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("whash")
    )
    hit = wins.join(dup, "whash", "left_semi").select(id_col, "pos")
    return _merge_hit_spans(hit, id_col, k)


def contaminated_window_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Merged per-document token spans covered by any k-token window that
    also occurs verbatim in the ``benchmark`` (eval-set) table — the
    span-granular form of benchmark decontamination (``dedup.decontaminate``
    flags whole documents; this localises WHICH tokens leaked so the
    document can be salvaged instead of dropped, the Lee et al.
    exact-substring construction pointed at an eval suite).

    Returns (id_col, span_start, span_end, n_windows), 0-based token
    indices, end exclusive, overlapping/adjacent windows merged.

    Scale shape: the benchmark side is SMALL (an eval suite) — its
    distinct window-hash set broadcasts, so the corpus side is one
    narrow scan + broadcast semi-join; the only shuffled rows are the
    (id, pos) hits themselves (two ints per contaminated window), never
    corpus text.
    """
    wins = _windows(docs, text_col, id_col, k)
    bench_w = _bench_window_hashes(benchmark, bench_text_col, k)
    hit = (
        wins.join(F.broadcast(bench_w), "whash", "left_semi")
        .select(id_col, "pos")
    )
    return _merge_hit_spans(hit, id_col, k)


def _strip_spans(
    docs: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Remove the tokens covered by ``spans`` from every document.

    Returns (id_col, clean_text, n_kept, n_removed).  A fully-covered
    document keeps an empty ``clean_text`` rather than disappearing;
    documents with no spans pass through untouched.
    """
    per_doc = spans.groupBy(id_col).agg(
        # sort for determinism under any partitioning, then expand the
        # (merged, disjoint) spans to the removed index list — bounded by
        # the document's own token count.
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("span_start", "span_end"))
                ),
                lambda s: F.sequence(s.span_start, s.span_end - 1),
            )
        ).alias("__removed")
    )
    joined = docs.select(
        id_col, F.split(F.col(text_col), " ").alias("__toks")
    ).join(per_doc, id_col, "left")
    filled = joined.withColumn(
        "__removed", F.coalesce("__removed", F.array().cast("array<int>"))
    )
    kept = filled.withColumn(
        "__kept",
        F.filter("__toks", lambda x, i: ~F.array_contains("__removed", i)),
    )
    return kept.select(
        id_col,
        F.array_join("__kept", " ").alias("clean_text"),
        F.size("__kept").cast("int").alias("n_kept"),
        (F.size("__toks") - F.size("__kept")).cast("int").alias("n_removed"),
    )


def strip_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Every input document with corpus-repeated-window spans removed
    (see :func:`duplicated_window_spans` for the span definition).

    Returns (id_col, clean_text, n_kept, n_removed).  A fully-covered
    document (e.g. an exact duplicate) keeps an empty ``clean_text``
    rather than disappearing; documents shorter than k tokens pass
    through untouched.
    """
    spans = duplicated_window_spans(docs, text_col, id_col, k, min_count)
    return _strip_spans(docs, spans, text_col, id_col)


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 8,
    max_fraction: float = 0.05,
) -> DataFrame:
    """Per-document contamination *fraction* and keep/drop verdict — the
    GPT-3-appendix-C-style fuzzy policy between ``dedup.decontaminate``
    (drop on ANY k-gram hit) and :func:`decontaminate_spans` (strip the
    hits): measure what fraction of a document's k-token windows occur
    verbatim in the benchmark and keep the document iff the fraction is
    at most ``max_fraction``.

    Returns (id_col, n_windows, n_contaminated, contaminated_frac, keep);
    ``contaminated_frac`` is rounded to 6 places.  Documents shorter than
    k tokens have zero windows and are kept with fraction 0.0.

    Scale shape: identical to :func:`contaminated_window_spans` — the
    benchmark window-hash set broadcasts, the per-doc hit count is one
    map-side-combinable aggregate keyed by doc id; corpus text never
    shuffles.
    """
    wins = _windows(docs, text_col, id_col, k)
    bench_w = _bench_window_hashes(benchmark, bench_text_col, k)
    hits = (
        wins.join(F.broadcast(bench_w), "whash", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_contaminated"))
    )
    totals = docs.select(
        id_col,
        # raw split, matching _windows: window count is over the same
        # token sequence the hashes were built from
        F.greatest(
            F.size(F.split(F.col(text_col), " ")) - k + 1, F.lit(0)
        ).cast("int").alias("n_windows"),
    )
    frac = F.when(
        F.col("n_windows") > 0,
        F.round(F.col("n_contaminated") / F.col("n_windows"), 6),
    ).otherwise(F.lit(0.0))
    return (
        totals.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce("n_contaminated", F.lit(0))
        )
        .select(
            id_col,
            "n_windows",
            "n_contaminated",
            frac.alias("contaminated_frac"),
            (frac <= max_fraction).alias("keep"),
        )
    )


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Every input document with benchmark-leaked windows removed (see
    :func:`contaminated_window_spans`) — surgical decontamination that
    keeps the document, unlike the drop-the-document policy of
    ``dedup.decontaminate``.

    Returns (id_col, clean_text, n_kept, n_removed); uncontaminated
    documents pass through untouched with n_removed = 0.
    """
    spans = contaminated_window_spans(
        docs, benchmark, text_col, id_col, bench_text_col, k
    )
    return _strip_spans(docs, spans, text_col, id_col)
