"""PII redaction — the C4/Dolma-style scrubbing pass: replace email
addresses, IPv4 literals, and phone-shaped digit runs with typed
placeholder tokens and count what was removed.

Patterns deliberately use only the regex subset where Java
(Spark-side) and RE2 (DuckDB oracle) agree: character classes,
bounded repetition, ``\\b`` word boundaries — no lookaround, no
backreferences.  The reference engine has no redaction analog
(per-document OCR, ``Jochre.scala:186-211``).

100 TB posture: pure ``regexp_replace`` / ``regexp_extract_all``
column expressions — whole-stage codegen, zero shuffle, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# applied in order; placeholders contain no pattern-matchable text
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)

__all__ = ["PII_PATTERNS", "redact_pii"]


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """(id_col, clean_text, n_email, n_ipv4, n_phone, n_redactions) —
    every document with PII spans replaced by typed placeholders.

    Patterns apply in order and each count is taken on the text AFTER
    the previous replacements, so counts equal actual replacements even
    when patterns nest (an email whose domain is IP-shaped counts once,
    as an email).  NULL text is treated as empty: clean_text '' and all
    counts 0 (never NULL — downstream sums must not silently skip
    rows).
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(F.col(id_col), cur.alias("clean_text"), *counts)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in patterns), F.lit(0)
    )
    return out.withColumn("n_redactions", total)
