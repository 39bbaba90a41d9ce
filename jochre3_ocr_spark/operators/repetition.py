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
  occurrences merged before counting, so positions are never
  double-counted) — the within-doc twin of the corpus-wide construction
  in ``substring.duplicated_window_spans``.

The reference engine has no corpus-analysis analog (per-document OCR,
``Jochre.scala:186-211``); this exists for the training-data filter
stack next to ``text_metrics.quality_features``.

100 TB posture: every feature here is a WITHIN-document statistic, so
shuffling grams across the cluster is pure waste — measured on this
box, the explode → groupBy (doc, n, gram) formulation was
shuffle-disk-bound (wall identical at local[2] and local[8]; ~50-byte
rows × 4 widths × corpus tokens through the exchange).  The production
shape is one ``mapInPandas`` pass: per document, Counter-based gram
counts and span merging in O(tokens) with ZERO Exchange — each task
reads its scan split and emits one feature row per doc, embarrassingly
parallel at any cluster size.  (A pure-codegen per-row alternative
needs an array group-count Spark lacks; emulating it with per-element
filters is O(len²) per row.  This is the documented criterion for
dropping to Python: built-ins genuinely can't express the semantics.)

Rounding matches the engine convention (HALF_UP at 6 places, what
Spark's ``round`` and DuckDB's ``round`` both do on doubles) via
``decimal`` — Python's builtin ``round`` is banker's and would flake
the oracle on exact .5 boundaries.
"""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame

__all__ = ["repetition_features"]

_Q6 = Decimal("0.000001")


def _rnd6(x: float) -> float:
    # Decimal(repr(x)) — the SHORTEST decimal repr, matching Spark's
    # BigDecimal.valueOf(double) and DuckDB's round(); Decimal(x) would
    # quantize the exact binary expansion and flip decimal-tie
    # fractions like 3/640 = 0.0046875 the other way (review-confirmed
    # 135 mismatches on a num/den sweep)
    return float(Decimal(repr(x)).quantize(_Q6, rounding=ROUND_HALF_UP))


def _doc_features(
    text: str | None, top_ns: tuple[int, ...], dup_n: int
) -> list:
    # NULL text is treated as empty (one zero-length token) — the
    # operator must emit a row, never crash the task
    text = text or ""
    toks = text.split(" ")
    m, chars = len(toks), len(text)
    row = [m]

    c1 = Counter(toks)
    best_c = max((c, len(t)) for t, c in c1.items())[0]
    row.append(_rnd6(best_c / m))

    for n in top_ns:
        if m < n:
            row.append(0.0)
            continue
        cn = Counter(
            " ".join(toks[i : i + n]) for i in range(m - n + 1)
        )
        bc, bl = max((c, len(g)) for g, c in cn.items())
        row.append(_rnd6(bc * bl / chars))

    covered = 0
    if m >= dup_n:
        ws = [" ".join(toks[i : i + dup_n]) for i in range(m - dup_n + 1)]
        cw = Counter(ws)
        hits = [i for i, w in enumerate(ws) if cw[w] >= 2]
        # merged spans of uniform width dup_n: a new island starts when
        # the gap to the previous hit exceeds dup_n (same lag test as
        # substring._merge_hit_spans)
        start = prev = None
        for p in hits:
            if prev is None or p > prev + dup_n:
                if prev is not None:
                    covered += prev + dup_n - start
                start = p
            prev = p
        if prev is not None:
            covered += prev + dup_n - start
    row.append(_rnd6(covered / m))
    return row


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
    feature.  Ties in the per-n argmax break on (count, char length),
    which is value-determining — equal pairs give equal fractions.
    """
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    cols = (
        [id_col, "n_tokens", "top_word_frac"]
        + [f"top_{n}gram_char_frac" for n in top_ns]
        + [f"dup_{dup_n}gram_token_frac"]
    )
    types = [id_type, "int"] + ["double"] * (len(cols) - 2)
    out_ddl = ", ".join(f"{c} {t}" for c, t in zip(cols, types))

    def feat(batches):
        for pdf in batches:
            rows = [
                [did] + _doc_features(text, top_ns, dup_n)
                for did, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(feat, schema=out_ddl)
