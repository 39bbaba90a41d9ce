"""Mergeable fixed-size sketches for corpus-scale frequency and
membership queries: a count-min sketch (Cormode & Muthukrishnan 2005,
*An Improved Data Stream Summary: The Count-Min Sketch and its
Applications*) for token-frequency estimation, and a Bloom filter
(Bloom 1970, *Space/Time Trade-offs in Hash Coding with Allowable
Errors*) for benchmark-decontamination membership probes.

The reference engine has no sketch analog (per-document OCR,
``Jochre.scala:186-211``); these sit in the training-data stack next
to ``dedup.decontaminate`` and ``text_metrics``.

100 TB posture: both sketches are FIXED-SIZE state — ``depth × 16^w``
counters / ``k × 16^w`` bit slots — independent of corpus size.  Build
is one map-side-combinable aggregation (partial sketches merge by the
same sum/distinct that builds them, the defining sketch property), so
a 10^12-doc corpus produces the same few-KB table as a 10^3-doc one.
Probes BROADCAST the sketch: a narrow corpus scan + broadcast-hash
join, never a corpus-side shuffle.  Contrast with the exact paths this
complements: exact token counts shuffle a vocabulary-sized table,
exact decontamination (``dedup.decontaminate``) broadcasts the whole
exploded benchmark shingle set — the Bloom bits table is smaller than
the shingle set whenever the benchmark outgrows ``k × 16^w`` slots,
and its size is CAPPED no matter how big the eval suite grows.

Determinism: every hash is an md5 hex prefix of a seed-prefixed
string — identical bytes in Spark, DuckDB, and Python — so the DuckDB
oracle twin replays the SAME sketch bit-for-bit, false positives
included.  Buckets stay hex STRINGS end to end (no int conversion to
disagree on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "cms_sketch",
    "cms_estimate",
    "bloom_bits",
    "bloom_decontaminate",
    "bloom_bitmap",
    "bloom_decontaminate_packed",
]

# Bits per bitmap chunk during the distributed pack (a module constant
# so tests can shrink it and force multi-chunk assembly — the
# _overlap_map_sweep lesson: chunk-boundary code paths must be
# exercisable at test scale).
BITMAP_CHUNK_BITS = 1 << 19  # 64 KiB chunks


def _slot(seed_col, item_col, width_hex: int):
    """Hex-prefix hash slot for (seed, item) — the one hash everything
    here derives from: ``substr(md5(seed || ':' || item), 1, w)``."""
    return F.substring(
        F.md5(F.concat(seed_col.cast("string"), F.lit(":"), item_col)),
        1,
        width_hex,
    )


def _seeds(n: int):
    return F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("seed")


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width_hex: int = 2,
) -> DataFrame:
    """Count-min sketch of whitespace-token frequencies:
    (seed, bucket, counter), one row per non-empty cell, ``depth`` hash
    rows of ``16^width_hex`` buckets each.

    Build shape: exact token counts first (map-side-combinable,
    vocabulary-bounded — the corpus never fans out ``depth``×), then a
    vocabulary-sized fan-out re-aggregated into the sketch cells.
    """
    counts = (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.select("token", "c", _seeds(depth))
        .groupBy("seed", _slot(F.col("seed"), F.col("token"), width_hex).alias("bucket"))
        .agg(F.sum("c").alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width_hex: int = 2,
) -> DataFrame:
    """Point-query the sketch for every candidate token: adds
    ``est_cnt`` = min over the ``depth`` rows of the hashed cell's
    counter (the CMS estimator — an upper bound on the true count,
    exact when no collision hits all rows).  ``depth``/``width_hex``
    must match the build.  The sketch broadcasts; candidates stay
    distributed."""
    probes = candidates.select(
        token_col, _seeds(depth)
    ).withColumn("bucket", _slot(F.col("seed"), F.col(token_col), width_hex))
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("est_cnt"))
    )


def bloom_bits(
    benchmark: DataFrame,
    n: int = 4,
    k: int = 3,
    width_hex: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom filter of the benchmark's distinct word ``n``-grams:
    (seed, slot), one row per SET bit, ``k`` hash functions over
    ``16^width_hex`` slots each.  At most ``k × 16^w`` rows regardless
    of benchmark size — the capped-state property that lets the probe
    side broadcast it."""
    from jochre3_ocr_spark.operators.dedup import _shingles, _tokens

    sh = _shingles(_tokens(benchmark, id_col, text_col), n)
    return (
        sh.select("shingle", _seeds(k))
        .select("seed", _slot(F.col("seed"), F.col("shingle"), width_hex).alias("slot"))
        .distinct()
    )


def bloom_decontaminate(
    df: DataFrame,
    bits: DataFrame,
    n: int = 4,
    k: int = 3,
    width_hex: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents whose word ``n``-grams hit the benchmark
    Bloom filter: (doc_id, n_grams, n_hits, contaminated), one row per
    input document (``doc_id`` cast to string, matching
    ``dedup.decontaminate``).  A gram "hits" when ALL ``k`` of its
    hash slots are set — so hits ⊇ the exact shingle-join hits of
    ``dedup.decontaminate`` (Bloom filters have no false negatives),
    with a deterministic, oracle-replayable false-positive set whose
    rate is bounded by ``(bits_set / 16^w)^k``.

    Probe shape: one narrow scan of the corpus, shingle fan-out ×``k``,
    ONE broadcast-hash LEFT join against the fixed-size bits table
    (a marker column distinguishes set from unset slots), partial
    count back down to one row per doc — no corpus-side shuffle of
    text, no benchmark-side explosion at probe time. ``n_grams`` is
    counted in the SAME aggregation tree as the hits (a left join
    keeps every shingle row), so the shingle fan-out is evaluated
    once instead of twice and the per-doc gram-count join disappears
    (guide §2.3/§2.4)."""
    from jochre3_ocr_spark.operators.dedup import _shingles, _tokens

    toks = _tokens(df, id_col, text_col)
    sh = _shingles(toks, n)
    per_doc = (
        sh.select("doc_id", "shingle", _seeds(k))
        .withColumn("slot", _slot(F.col("seed"), F.col("shingle"), width_hex))
        .join(
            F.broadcast(bits.withColumn("__set", F.lit(1))),
            ["seed", "slot"],
            "left",
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count("__set").alias("n_set"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__n_grams"),
            F.count_if(F.col("n_set") == k).alias("n_hits"),
        )
    )
    return (
        toks.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__n_grams", F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bloom_bitmap(
    benchmark: DataFrame,
    n: int = 4,
    k: int = 3,
    width_hex: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bytes:
    """The Bloom filter as ONE packed bitmap of ``k × 16^width_hex``
    bits (seed ``s``'s slot ``j`` lives at global bit ``s·16^w + j``) —
    the production transport form: at ``width_hex=6`` the payload is a
    FIXED 6.3 MB no matter how many documents the eval suite holds,
    where the row-form bits table (and the exact shingle join of
    ``dedup.decontaminate``) grow with the benchmark.

    Build shape: the distributed (seed, slot) set is packed into
    chunk blobs by an ``applyInPandas`` per chunk, and only the
    bounded blob rows (≤ k·16^w / BITMAP_CHUNK_BITS, each one chunk)
    reach the driver — the same bounded-collect discipline as the
    k-means training sample (`similarity.py`).  Returns the assembled
    bytes; ship them with ``spark.sparkContext.broadcast`` to
    :func:`bloom_decontaminate_packed`.
    """
    import pandas as pd

    m = 16 ** width_hex
    total_bits = k * m
    chunk_bits = BITMAP_CHUNK_BITS
    bits = bloom_bits(benchmark, n, k, width_hex, id_col, text_col)
    idx = (
        F.col("seed").cast("long") * m
        + F.conv(F.col("slot"), 16, 10).cast("long")
    )
    indexed = bits.select(
        idx.alias("idx"), (idx / chunk_bits).cast("long").alias("chunk")
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        chunk = int(pdf["chunk"].iloc[0])
        base = chunk * chunk_bits
        nbits = min(chunk_bits, total_bits - base)
        blob = bytearray((nbits + 7) // 8)
        for i in pdf["idx"]:
            off = int(i) - base
            blob[off >> 3] |= 1 << (off & 7)
        return pd.DataFrame({"chunk": [chunk], "blob": [bytes(blob)]})

    rows = (
        indexed.groupBy("chunk")
        .applyInPandas(pack, "chunk long, blob binary")
        .collect()
    )
    out = bytearray((total_bits + 7) // 8)
    for r in rows:
        base = int(r.chunk) * (chunk_bits // 8)
        out[base : base + len(r.blob)] = r.blob
    return bytes(out)


def bloom_decontaminate_packed(
    df: DataFrame,
    bitmap,
    n: int = 4,
    k: int = 3,
    width_hex: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Row-identical to :func:`bloom_decontaminate`, probing the packed
    bitmap instead of joining the bits table: one ``mapInPandas`` pass,
    zero joins, zero shuffle — the corpus-side cost is a narrow scan at
    ANY benchmark size.  ``bitmap`` is the bytes from
    :func:`bloom_bitmap` or an already-made ``Broadcast`` of them
    (pass the broadcast when calling repeatedly — it ships once per
    executor, not once per job)."""
    import hashlib

    import pandas as pd
    from pyspark.broadcast import Broadcast

    from jochre3_ocr_spark.plans.pipeline import _spread_small_input

    spark = df.sparkSession
    bc = (
        bitmap
        if isinstance(bitmap, Broadcast)
        else spark.sparkContext.broadcast(bytes(bitmap))
    )
    m = 16 ** width_hex
    # the per-row Python probe (k md5s per gram) chains straight onto
    # the corpus scan — spread a compact input so it is not pinned to
    # the scan's 3-5 file splits (no-op at production split counts)
    df = _spread_small_input(df)

    def probe(batches):
        buf = bc.value
        for pdf in batches:
            ids, ngs, nhs = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").split(" ") if t]
                grams = (
                    {
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    }
                    if len(toks) >= n
                    else set()
                )
                hits = 0
                for g in grams:
                    ok = True
                    for s in range(k):
                        slot = int(
                            hashlib.md5(
                                f"{s}:{g}".encode()
                            ).hexdigest()[:width_hex],
                            16,
                        )
                        bit = s * m + slot
                        if not (buf[bit >> 3] >> (bit & 7)) & 1:
                            ok = False
                            break
                    hits += ok
                ids.append(str(doc_id))
                ngs.append(len(grams))
                nhs.append(hits)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="object"),
                    "n_grams": pd.Series(ngs, dtype="int32"),
                    "n_hits": pd.Series(nhs, dtype="int32"),
                    "contaminated": pd.Series(
                        [h > 0 for h in nhs], dtype="bool"
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        probe,
        "doc_id string, n_grams int, n_hits int, contaminated boolean",
    )
