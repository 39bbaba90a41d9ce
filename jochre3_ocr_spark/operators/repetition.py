"""Within-document repetition features — the Gopher repetition filters
(Rae et al. 2021, *Scaling Language Models: Methods, Analysis & Insights
from Training Gopher*, table A1) adapted to the single-line token corpus:

* ``top_{n}gram_char_frac`` — fraction of the document's characters
  accounted for by its most frequent n-gram (count × n-gram char length
  / total chars), n ∈ {2, 3, 4} by default.
* ``top_word_frac`` — occurrence count of the most frequent token over
  the token count (the n=1 analog).
* ``dup_{n}gram_token_frac`` — fraction of token positions covered by
  any n-gram that repeats *within the same document* (overlapping
  occurrences merged before counting, so chars are never double-counted)
  — the within-doc twin of the corpus-wide construction in
  ``substring.duplicated_window_spans``.

The reference engine has no corpus-analysis analog (per-document OCR,
``Jochre.scala:186-211``); this exists for the training-data filter
stack next to ``text_metrics.quality_features``.

100 TB posture: n-gram counting is explode → groupBy (doc_id, n, gram)
— map-side partial aggregation collapses within-partition repeats, the
shuffle key contains doc_id so hot grams ("the the the …") never
concentrate on one reducer beyond their own document, and the per-doc
argmax is a second agg on doc_id alone.  Nothing is quadratic in
document length (the pure-array alternative, counting each gram with a
per-element filter, is O(len²) per row and was rejected for that
reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .substring import _merge_hit_spans

__all__ = ["repetition_features"]


def _gram_structs(n: int):
    """Array<struct<n,gram>> of every n-gram of ``__toks`` — empty when
    the document is too short (guard first: Spark's sequence DESCENDS
    when stop < start)."""
    return F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - n),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice("__toks", i + 1, F.lit(n))).alias(
                    "gram"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_n: int = 5,
) -> DataFrame:
    """One row per document with the Gopher repetition-filter features.

    Columns: (id_col, n_tokens, top_word_frac, top_{n}gram_char_frac for
    each n in ``top_ns``, dup_{dup_n}gram_token_frac), fractions rounded
    to 6 places; a document too short for a given n gets 0.0 for that
    feature.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.split(F.col(text_col), " ").alias("__toks"),
    )

    # ALL gram widths in ONE corpus pass: per row, flatten the per-n
    # gram arrays and explode once (the unioned-_grams form scanned and
    # re-split the corpus once per n — 4 scans; ADVICE-class perf fix)
    gram_union = toks.select(
        "doc_id",
        F.explode(
            F.flatten(F.array(*[_gram_structs(n) for n in (1, *top_ns)]))
        ).alias("__g"),
    ).select("doc_id", F.col("__g.n").alias("n"), F.col("__g.gram").alias("gram"))
    # count each distinct gram within its document, then take the per-doc
    # argmax of (count, char length) per n — equal (count, len) pairs give
    # equal fractions, so no text tie-break is needed
    counts = gram_union.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("__c")
    )
    best = counts.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    F.struct(
                        F.col("__c").alias("c"),
                        F.length("gram").alias("len"),
                    ),
                )
            ).alias(f"__b{n}")
            for n in (1, *top_ns)
        ]
    )

    # within-doc duplicated dup_n-gram coverage: repeated-window positions
    # merged into spans (substring.py machinery), covered tokens summed;
    # windows built from __toks directly (no re-split of the text)
    wins = toks.where(F.size("__toks") >= dup_n).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - dup_n),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("__toks", i + 1, F.lit(dup_n)))
                ),
            )
        ).alias("pos", "whash"),
    )
    rep = (
        wins.groupBy("doc_id", "whash")
        .agg(F.count(F.lit(1)).alias("__c"), F.collect_list("pos").alias("__p"))
        .where(F.col("__c") >= 2)
        .select("doc_id", F.explode("__p").alias("pos"))
    )
    covered = _merge_hit_spans(rep, "doc_id", dup_n).groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("__cov")
    )

    out = (
        toks.select(
            "doc_id",
            F.size("__toks").alias("n_tokens"),
            F.length("__text").alias("__chars"),
        )
        .join(best, "doc_id", "left")
        .join(covered, "doc_id", "left")
    )

    def _char_frac(n: int):
        b = F.col(f"__b{n}")
        return F.when(
            b.isNotNull(),
            F.round(b["c"] * b["len"] / F.col("__chars"), 6),
        ).otherwise(F.lit(0.0))

    return out.select(
        F.col("doc_id").alias(id_col),
        "n_tokens",
        F.when(
            F.col("__b1").isNotNull(),
            F.round(F.col("__b1")["c"] / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)).alias("top_word_frac"),
        *[_char_frac(n).alias(f"top_{n}gram_char_frac") for n in top_ns],
        F.round(
            F.coalesce(F.col("__cov"), F.lit(0)) / F.col("n_tokens"), 6
        ).alias(f"dup_{dup_n}gram_token_frac"),
    )
