"""Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
*Data Selection for Language Models via Importance Resampling*): score
every raw-corpus document by how target-like its hashed-n-gram feature
distribution is, then keep the top slice.  The importance log-weight of
a document is

    log w(x) = Σ_b c_b(x) · (log p_b − log q_b)

where c_b(x) counts the document's unigrams+bigrams hashed into bucket
``b``, and p / q are add-one-smoothed bucket unigram models fit on the
TARGET split and the RAW corpus respectively.  (The paper samples with
Gumbel noise; the deterministic top-k variant implemented here is its
"top-k heuristic" baseline — reproducible, resume-stable, and exactly
replayable in SQL.)

The reference engine has no data-selection analog (per-document OCR,
``Jochre.scala:186-211``); this sits next to ``lm.bigram_lm_scores``
in the training-data filter stack.

100 TB posture: fitting each model is one map-side-combinable
aggregation whose output is CAPPED at ``16^width_hex`` rows regardless
of corpus size (the whole point of hashed features), so both model
tables broadcast; scoring is one narrow pass — explode grams, bucket,
broadcast-join the two fixed-size models, partial-sum back to one row
per document.  No vocabulary-sized shuffle, no driver-side state.  The
final ranking is the only global exchange, and it moves one slim row
per doc (id + weight), never text.

Determinism: buckets are md5 hex prefixes (identical strings in Spark,
DuckDB, Python); log is natural log in both engines; weights round to
6 decimals like ``lm.score_documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "hashed_gram_buckets",
    "bucket_logprobs",
    "dsir_log_weights",
    "dsir_select",
]


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width_hex: int = 2,
) -> DataFrame:
    """(doc_id, bucket, c): per-document hashed-feature counts —
    whitespace unigrams and bigrams, bucketed by the first
    ``width_hex`` hex chars of their md5 (``16^width_hex`` buckets).
    ``doc_id`` is cast to string, matching the dedup family."""
    toks = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("t"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("t"),
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at("t", i), F.element_at("t", i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy(
            "doc_id", F.substring(F.md5("gram"), 1, width_hex).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_logprobs(
    split: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width_hex: int = 2,
) -> DataFrame:
    """(bucket, lp): add-one-smoothed log bucket probabilities of a
    split's hashed-gram distribution — ``log((c_b + 1) / (N + B))``
    with ``B = 16^width_hex``.  Only observed buckets get a row;
    consumers fall back to the closed-form unseen mass
    ``log(1 / (N + B))`` via ``n_total`` carried on every row (keeps
    the table self-contained so scoring never collects a scalar)."""
    b = 16 ** width_hex
    per_bucket = (
        hashed_gram_buckets(split, id_col, text_col, width_hex)
        .groupBy("bucket")
        .agg(F.sum("c").alias("cb"))
    )
    totals = per_bucket.agg(F.sum("cb").cast("double").alias("n_total"))
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.log((F.col("cb") + 1) / (F.col("n_total") + F.lit(float(b)))).alias("lp"),
        "n_total",
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    width_hex: int = 2,
) -> DataFrame:
    """(doc_id, n_grams, log_weight): per-document DSIR importance
    log-weight of ``docs`` toward ``target``'s feature distribution,
    against ``raw``'s (default: ``docs`` itself, the paper's setting).
    Zero-gram documents weigh 0.0 by convention."""
    if raw is None:
        raw = docs
    b = 16 ** width_hex
    p = bucket_logprobs(target, text_col, id_col, width_hex).select(
        "bucket", F.col("lp").alias("lp_t"), F.col("n_total").alias("nt_t")
    )
    q = bucket_logprobs(raw, text_col, id_col, width_hex).select(
        "bucket", F.col("lp").alias("lp_q"), F.col("n_total").alias("nt_q")
    )
    # unseen-bucket mass log(1/(N+B)) needs each model's N even on rows
    # the OTHER model misses — carry both totals via tiny cross joins
    nt_t = p.agg(F.coalesce(F.max("nt_t"), F.lit(0.0)).alias("nt_t"))
    nt_q = q.agg(F.coalesce(F.max("nt_q"), F.lit(0.0)).alias("nt_q"))
    scored = (
        hashed_gram_buckets(docs, id_col, text_col, width_hex)
        .join(F.broadcast(p.drop("nt_t")), "bucket", "left")
        .join(F.broadcast(q.drop("nt_q")), "bucket", "left")
        .crossJoin(F.broadcast(nt_t))
        .crossJoin(F.broadcast(nt_q))
        .select(
            "doc_id",
            "c",
            (
                F.coalesce("lp_t", -F.log(F.col("nt_t") + F.lit(float(b))))
                - F.coalesce("lp_q", -F.log(F.col("nt_q") + F.lit(float(b))))
            ).alias("__diff"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("__diff")), 6).alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("string").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    weights: DataFrame,
    keep: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Add ``rnk`` (1-based, by weight desc then id asc — deterministic)
    and ``selected`` = rnk ≤ ``keep``.  One global slim-row sort; at
    production scale swap the exact rank for a sampled-quantile
    threshold the same way ``lm.quality_buckets`` takes explicit cuts."""
    w = Window.orderBy(F.desc(weight_col), F.asc(id_col))
    return weights.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).withColumn("selected", F.col("rnk") <= keep)
