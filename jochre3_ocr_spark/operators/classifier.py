"""Distributed Naive-Bayes text classification — the fasttext-shaped
supervised filter slot in web-corpus pipelines (CCNet/Dolma/FineWeb
train a linear classifier for language-ID and quality gating; no
fasttext runtime exists in this sandbox, so the classifier is a
multinomial Naive Bayes trained *inside the engine* as plain
aggregations — which also makes train AND predict exactly replayable
in SQL for the oracle).

Model (add-α multinomial NB):
  log P(label | doc) ∝ ln prior(label)
      + Σ_tokens ln (c(w, label) + α) / (tot(label) + α·V)
with c = token count inside the label's training docs, tot(label) =
Σ_w c, V = distinct training tokens.  Unseen (w, label) pairs — and
tokens never seen in training at all — score the same smoothed floor
α / (tot + α·V).  The prediction is the argmax label over scores
rounded to 6 decimals (ties → lexicographically smallest label), so
the verdict is deterministic across engines and partitionings.

The reference engine has no classifier analog (per-document OCR,
``Jochre.scala:186-211``); the in-scope cousin is the multi-alphabet
dispatch slot (``guesser.py:381``).

100 TB posture: training is two map-side-combinable aggregations over
the (bounded) training split; the model tables are (vocabulary ×
labels)-bounded — independent of corpus size — so prediction
broadcasts them: one explode over corpus tokens, a cross join with the
tiny label list, two broadcast joins, one per-(doc, label) agg, one
per-doc argmax window.  No collect anywhere; V and priors travel as
broadcast DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["nb_train", "nb_predict", "nb_classify"]


def _tokens(text_col: str):
    """NULL-safe token array: a NULL text tokenizes like an empty text
    (split(NULL) is NULL and would silently DROP the document from
    explode/size paths — the NULL-text bug class from the packing op)."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: x != "",
    )


def _doc_tokens(df: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    """(id, *extra, w) — one row per non-empty token, extra columns
    carried from the same row (no join needed to recover them)."""
    return df.select(
        F.col(id_col),
        *[F.col(e) for e in extra],
        F.explode(_tokens(text_col)).alias("w"),
    )


def nb_train(
    train: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(token_counts, label_totals, vocab): the three model tables.

    token_counts = (w, label, c); label_totals = (label, tot, ln_prior)
    with the prior over training DOCS; vocab = one-row (v).  All stay
    DataFrames so prediction never collects a scalar."""
    # label rides the explode from the same row — a join back onto
    # train to recover it would shuffle every token row (review r5)
    toks = _doc_tokens(
        train.withColumn("label", F.col(label_col)), id_col, text_col,
        "label",
    )
    token_counts = toks.groupBy("w", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    doc_counts = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = doc_counts.agg(F.sum("n").alias("nt"))
    label_totals = (
        token_counts.groupBy("label")
        .agg(F.sum("c").alias("tot"))
        .join(doc_counts, "label")
        .crossJoin(F.broadcast(total))
        .select(
            "label", "tot", F.log(F.col("n") / F.col("nt")).alias("ln_prior")
        )
    )
    vocab = toks.agg(F.countDistinct("w").cast("double").alias("v"))
    return token_counts, label_totals, vocab


def nb_predict(
    docs: DataFrame,
    token_counts: DataFrame,
    label_totals: DataFrame,
    vocab: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pred_label, score): argmax-label NB prediction for every
    document (docs with no tokens fall back to the highest-prior
    label).  ``score`` = the winning ln-posterior (unnormalised),
    rounded to 6 decimals — the same rounding the argmax uses."""
    from pyspark.sql.window import Window

    labels = label_totals.select("label", "tot", "ln_prior")
    per_token = (
        _doc_tokens(docs, id_col, text_col)
        .crossJoin(F.broadcast(labels))
        .join(F.broadcast(token_counts), ["w", "label"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "label",
            F.log(
                (F.coalesce("c", F.lit(0)) + F.lit(alpha))
                / (F.col("tot") + F.lit(alpha) * F.col("v"))
            ).alias("__lp"),
        )
    )
    doc_scores = per_token.groupBy(id_col, "label").agg(
        F.sum("__lp").alias("__s")
    )
    scored = doc_scores.join(F.broadcast(labels), "label").select(
        id_col, "label", F.round(F.col("__s") + F.col("ln_prior"), 6).alias("score")
    )
    # token-less docs (incl. NULL text): prior-only scores per label
    empties = (
        docs.select(id_col, _tokens(text_col).alias("__t"))
        .where(F.size("__t") == 0)
        .crossJoin(F.broadcast(labels))
        .select(id_col, "label", F.round("ln_prior", 6).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.unionByName(empties)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, F.col("label").alias("pred_label"), "score")
    )


def nb_classify(
    docs: DataFrame,
    train: DataFrame,
    label_col: str = "lang",
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train on ``train``, predict ``docs`` — the one-call composition."""
    token_counts, label_totals, vocab = nb_train(
        train, label_col, id_col, text_col
    )
    return nb_predict(
        docs, token_counts, label_totals, vocab, alpha, id_col, text_col
    )
