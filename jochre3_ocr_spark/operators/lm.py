"""Distributed n-gram language-model scoring — the CCNet-style quality
signal (Wenzek et al. 2020, *CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data*): train a smoothed LM on a held-out split,
score every document's per-token log-probability, and bucket the corpus
by score.  CCNet uses a KenLM 5-gram; no LM runtime exists in this
sandbox, so the model is an add-one-smoothed bigram LM trained *inside
the engine* as plain aggregations — which also makes the whole
construction exactly reproducible in SQL for the oracle.

Model: P(w2 | w1) = (c(w1, w2) + 1) / (h(w1) + V), where c is the
bigram count over the training split, h(w1) = Σ_w2 c(w1, w2) is the
history count, and V is the distinct-token count of the training split.
Unseen histories score 1/V.  Documents with fewer than two tokens have
no bigrams and score 0.0 by convention.

The reference engine has no LM-scoring analog (per-document OCR,
``Jochre.scala:186-211``); this sits in the training-data filter stack
next to ``text_metrics.quality_features``.

100 TB posture: training is two map-side-combinable aggregations
(bigram counts keyed (w1, w2); V one approx-free distinct agg); the
model tables are vocabulary-bounded — independent of corpus size — so
scoring broadcasts them and stays a single narrow pass over the corpus
(explode bigrams → broadcast joins → per-doc agg keyed by doc id).  No
global sort, no driver-side loop; V travels as a broadcast 1-row
DataFrame, never a collected scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "bigram_counts",
    "vocab_size",
    "score_documents",
    "bigram_lm_scores",
    "quality_buckets",
]


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair."""
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    ).where(F.size("__t") >= 2)
    return toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(id_col, "__bg.w1", "__bg.w2")


def bigram_counts(
    train: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2, c) over the training split — the LM's parameter table."""
    return (
        _doc_bigrams(train, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def vocab_size(train: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row (v) DataFrame: distinct token count of the training split
    (stays a DataFrame so scoring never collects a scalar)."""
    return (
        train.select(F.explode(F.split(F.col(text_col), " ")).alias("__w"))
        .agg(F.countDistinct("__w").cast("double").alias("v"))
    )


def score_documents(
    docs: DataFrame,
    counts: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id_col, n_bigrams, avg_logprob) — mean natural-log bigram
    probability per document under the add-one model; 0-bigram docs
    score 0.0.  ``counts``/``vocab`` come from :func:`bigram_counts` /
    :func:`vocab_size`.

    ``broadcast_model`` hints the model tables broadcast — correct for
    natural language, where Zipfian mass makes the OBSERVED bigram
    table vocabulary-bounded in practice.  Pass False when the token
    distribution is adversarially flat (e.g. hash-random ids): there
    the observed-bigram table grows with the corpus, the broadcast
    build serializes on the driver and scaling collapses (measured
    0.39 efficiency at 2→8 cores on the xorshift corpus, BENCH.md
    round 5 "Scorer scaling") — the shuffle-join plan keeps both sides
    distributed."""
    maybe_bc = F.broadcast if broadcast_model else (lambda df: df)
    hist = counts.groupBy("w1").agg(F.sum("c").alias("h"))
    scored = (
        _doc_bigrams(docs, id_col, text_col)
        .join(maybe_bc(counts), ["w1", "w2"], "left")
        .join(maybe_bc(hist), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce("c", F.lit(0)) + 1)
                / (F.coalesce("h", F.lit(0)) + F.col("v"))
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Train on ``train``, score ``docs`` — the one-call composition."""
    return score_documents(
        docs,
        bigram_counts(train, id_col, text_col),
        vocab_size(train, text_col),
        id_col,
        text_col,
        broadcast_model,
    )


def quality_buckets(
    scored: DataFrame,
    cuts: tuple[float, float],
    score_col: str = "avg_logprob",
) -> DataFrame:
    """Add a CCNet-style ``bucket`` column (head/middle/tail) from two
    explicit score cut points (head = highest probability).  Cuts are
    caller-supplied — at scale they come from a sampled quantile job, and
    keeping them explicit keeps this a pure narrow projection."""
    lo, hi = sorted(cuts)
    return scored.withColumn(
        "bucket",
        F.when(F.col(score_col) >= hi, "head")
        .when(F.col(score_col) >= lo, "middle")
        .otherwise("tail"),
    )
