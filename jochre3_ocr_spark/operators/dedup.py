"""Deduplication operators over a text-document DataFrame — first-class
library API (the SQL twins live in __spark_entry__ for the DuckDB
correctness gate; tests assert both produce identical results).

All operators are pure DataFrame compositions (JVM/codegen end to end —
no Python in the hot path):

* exact / prefix-hash dedup — hash-groupBy, min-keeper
* word-shingle n-gram Jaccard — explode → self-join on shingle →
  count ratio (candidate generation via equality on shingles keeps the
  join selective at scale; AQE handles skewed shingles)
* MinHash signatures — k seeded min-hashes over shingles, banded for
  LSH candidate pairs
* SimHash — per-bit majority over token hashes

Determinism: every hash is md5-based (stable across engines/versions);
no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from jochre3_ocr_spark.plans.pipeline import _spread_small_input

    # shingle/hash fan-out cost is per row, but a compact parquet input
    # yields 1-2 scan splits — spread before the explode (no-op when the
    # input already supplies >= slots partitions)
    return _spread_small_input(
        df.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("t"),
        )
    )


def _shingles(toks: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-grams per doc."""
    return toks.filter(F.size("t") >= n).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("t"), (i + k + 1)) for k in range(n)]
                    ),
                )
            )
        ).alias("shingle"),
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    prefix: int | None = None,
) -> DataFrame:
    """Groups of identical texts (or identical ``prefix`` chars): one
    keeper (min id) per group. Returns (text_hash, n_docs, keeper)."""
    key = F.col(text_col) if prefix is None else F.substring(text_col, 1, prefix)
    return (
        df.select(
            F.md5(key).alias("text_hash"),
            F.col(id_col).cast("string").alias("doc_id"),
        )
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter("n_docs >= 2")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share at
    least ``min_hits`` distinct word ``n``-grams with any document in the
    ``benchmark`` (eval-set) table. Returns one row per contaminated
    (doc_id, bench_id) pair: (doc_id, bench_id, n_hits) — the standard
    pre-training hygiene pass (the 13-gram-overlap family of filters;
    GPT-3/PaLM-style decontamination is this op with n=8..13).

    Scale shape: the benchmark side is SMALL (an eval suite, thousands
    of docs) — its exploded shingle set broadcasts, so the corpus side
    is one narrow scan + broadcast-hash semi-join + partial-aggregated
    count; no corpus-side self-join and no shuffle of corpus text.
    Shingles are distinct per doc on BOTH sides, so n_hits counts
    distinct shared n-grams exactly.
    """
    doc_sh = _shingles(_tokens(df, id_col, text_col), n)
    bench_sh = _shingles(
        _tokens(benchmark, bench_id_col, bench_text_col), n
    ).withColumnRenamed("doc_id", "bench_id")
    return (
        doc_sh.join(
            F.broadcast(bench_sh), "shingle"
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs by word-n-gram Jaccard.
    Returns (doc1, doc2, common, jaccard).

    ``max_df``: drop shingles appearing in more than this many documents
    BEFORE the self-join — at 100 TB a stop-phrase shingle is a quadratic
    hot key (df² join rows); capping bounds any key's join fan-out at
    max_df² while denominators |A|,|B| stay exact (standard candidate-
    generation cap; the jaccard of pairs sharing ONLY stop-phrases is
    underestimated, which is the point)."""
    sh = _shingles(_tokens(df, id_col, text_col), n)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        pairs.join(ca, F.col("doc1") == F.col("ca.doc_id"))
        .join(cb, F.col("doc2") == F.col("cb.doc_id"))
        .select(
            "doc1",
            "doc2",
            "common",
            F.round(
                F.col("common") / (F.col("ca.n") + F.col("cb.n") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature: for each seed s, the lexicographic min
    of md5(s:shingle); the signature is md5 of the ordered min-hashes.
    Returns (doc_id, signature)."""
    sh = _shingles(_tokens(df, id_col, text_col), n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("s")
    mh = (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "s",
            F.md5(F.concat(F.col("s").cast("string"), F.lit(":"), "shingle")).alias(
                "h"
            ),
        )
        .groupBy("doc_id", "s")
        .agg(F.min("h").alias("mh"))
    )
    return mh.groupBy("doc_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "mh"))),
                    lambda x: x["mh"],
                ),
                ",",
            )
        ).alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate pairs. Returns (doc1, doc2) distinct."""
    sh = _shingles(_tokens(df, id_col, text_col), n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("s")
    mh = (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "s",
            F.md5(F.concat(F.col("s").cast("string"), F.lit(":"), "shingle")).alias("h"),
        )
        .groupBy("doc_id", "s")
        .agg(F.min("h").alias("mh"))
        .withColumn("band", (F.col("s") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("s", "mh"))),
                        lambda x: x["mh"],
                    ),
                    ",",
                )
            ).alias("band_hash")
        )
    )
    a = mh.alias("a")
    b = mh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit b set when the majority
    of token-md5 hex digits at position b have their high bit set.
    Returns (doc_id, simhash)."""
    toks = _tokens(df, id_col, text_col).select(
        "doc_id", F.explode(F.array_distinct("t")).alias("token")
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    high = F.substring(F.md5("token"), F.col("b") + 1, 1).isin(
        *"89abcdef"
    )
    per_bit = (
        toks.select("doc_id", "token", b)
        .select(
            "doc_id",
            "b",
            F.when(high, F.lit(1)).otherwise(F.lit(-1)).alias("vote"),
        )
        .groupBy("doc_id", "b")
        .agg(
            F.when(F.sum("vote") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bit")
        )
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.col("bit") * F.pow(F.lit(2), F.col("b")).cast("bigint")).alias(
            "simhash"
        )
    )


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 2,
    bits: int = 16,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs: band the signature (pigeonhole —
    hamming ≤ max_hamming over n_bands > max_hamming bands guarantees at
    least one identical band), bucket-join on (band, band_value), verify
    with bit_count(s1 XOR s2). The banded join is the 100 TB shape: no
    all-pairs, candidates ∝ bucket sizes.
    Returns (doc1, doc2, hamming)."""
    assert n_bands > max_hamming, "pigeonhole needs n_bands > max_hamming"
    band_bits = bits // n_bands
    sig = simhash(df, id_col, text_col, bits)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(simhash, band * {band_bits}) & {(1 << band_bits) - 1}"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


class ConnectedComponentsDidNotConverge(RuntimeError):
    """Raised when component resolution hits ``max_iters`` with the edge
    set / labels still changing — returning partial labels would silently
    mis-cluster, so the operator fails loudly instead."""


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC'14 — public algorithm).

    ``edges`` is canonically oriented (u > v, no self-loops). Returns the
    new canonical edge set. Each sub-step is one groupBy(min) + one join
    keyed on the node — shuffle ∝ |edges|, no driver-side state.
    """
    # large-star: every strictly-larger neighbour of u re-points at the
    # minimum of u's closed neighbourhood
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    large = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # small-star: u and all its ≤-neighbours re-point at the minimum
    smins = large.groupBy("u").agg(F.min("v").alias("m"))
    small = (
        large.join(smins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(smins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return small


def connected_components(
    pairs: DataFrame,
    left: str = "doc1",
    right: str = "doc2",
    max_iters: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """Resolve candidate pairs into duplicate CLUSTERS: connected
    components. Returns (doc_id, cluster_id) for every node appearing in
    ``pairs``, where cluster_id = the smallest doc_id in the component.
    Singleton docs (no candidate pair) do not appear — see
    ``duplicate_clusters(include_singletons=True)`` for the full domain.

    The step after candidate generation in a dedup pipeline: LSH/simhash
    emit pairs, but keeping one doc per GROUP needs the transitive
    closure (a~b, b~c ⇒ keep one of {a,b,c}).

    ``algorithm="star"`` (default) is the alternating large-star /
    small-star algorithm (Kiveris et al., SOCC'14): O(log² n) rounds
    worst-case — in practice ≤ ~5 — INDEPENDENT of component diameter,
    so adversarial templated near-dup chains at 100× scale converge too.
    ``algorithm="propagation"`` is min-label propagation: O(diameter)
    rounds, one shuffle each — marginally cheaper on the near-clique
    graphs real near-dup corpora produce.

    Both paths probe convergence every round (one small agg piggybacked
    on the checkpointed result) and raise
    :class:`ConnectedComponentsDidNotConverge` if ``max_iters`` rounds
    pass while still changing — wrong labels are never silently
    returned. Lineage is truncated per round (localCheckpoint) so the
    plan does not grow with iterations.
    """
    # materialize the pair source ONCE before symmetrizing: the union
    # reads it twice, and an un-checkpointed candidate generator (LSH)
    # would re-run per branch
    pairs = pairs.select(
        F.col(left).alias("a"), F.col(right).alias("b")
    ).localCheckpoint(eager=True)
    if algorithm == "star":
        return _cc_star(pairs, max_iters)
    if algorithm == "propagation":
        return _cc_propagation(pairs, max_iters)
    raise ValueError(f"unknown algorithm: {algorithm!r}")


def _cc_star(pairs: DataFrame, max_iters: int) -> DataFrame:
    nodes = (
        pairs.select(F.col("a").alias("node"))
        .union(pairs.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # fixed point ⇔ identical edge sets; count + order-free xor-of-
    # xxhash64 checksum in ONE agg per round (collision ~2^-64 —
    # acceptable for a convergence probe; bit_xor cannot overflow,
    # unlike sum under Spark 4's default ANSI mode)
    def _probe(e: DataFrame):
        return tuple(
            e.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h"),
            ).collect()[0]
        )

    prev = _probe(edges)
    converged = False
    for _ in range(max_iters):
        new_edges = _star_round(edges).localCheckpoint(eager=True)
        cur = _probe(new_edges)
        edges = new_edges
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise ConnectedComponentsDidNotConverge(
            f"large-star/small-star did not reach a fixed point in "
            f"{max_iters} rounds — raise max_iters (O(log^2 n) bound)"
        )
    # at the fixed point every edge is (node → component minimum); nodes
    # absent from the edge list are their own component minimum
    return nodes.join(
        edges, nodes.node == edges.u, "left"
    ).select(
        F.col("node").alias("doc_id"),
        F.coalesce("v", "node").alias("cluster_id"),
    )


def _cc_propagation(pairs: DataFrame, max_iters: int) -> DataFrame:
    sym = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    edges = sym.distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr_min, labels.node == nbr_min.src, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_min", F.col("label"))
            ).alias("label"),
            (F.coalesce("nbr_min", F.col("label")) < F.col("label")).alias(
                "changed"
            ),
        )
        stepped = stepped.localCheckpoint(eager=True)
        labels = stepped
        if stepped.agg(F.max("changed")).collect()[0][0] is not True:
            converged = True
            break
    if not converged:
        raise ConnectedComponentsDidNotConverge(
            f"min-label propagation did not converge in {max_iters} "
            f"rounds (component diameter > max_iters) — use "
            f'algorithm="star" or raise max_iters'
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    include_singletons: bool = False,
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash LSH candidate pairs
    → connected components → (doc_id, cluster_id, cluster_size,
    is_canonical). ``is_canonical`` marks the doc to KEEP (smallest
    doc_id per cluster) — the pipeline's "drop duplicates, keep one
    representative" verdict table.

    DOMAIN: by default rows cover only docs that appear in at least one
    LSH candidate pair — unique docs get NO row, so a consumer filtering
    ``is_canonical`` directly would drop them. Either left-join this
    table back to the corpus and ``coalesce(is_canonical, true)`` (the
    ``corpus_filter_verdicts`` pattern), or pass
    ``include_singletons=True`` to union every unpaired doc as its own
    cluster (cluster_size=1, is_canonical=true)."""
    pairs = minhash_lsh_candidates(df, id_col, text_col, n, num_hashes, band_size)
    cc = connected_components(pairs)
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id")
    out = (
        cc.withColumn("cluster_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
    )
    if include_singletons:
        singles = (
            df.select(F.col(id_col).cast("string").alias("doc_id"))
            .join(cc.select("doc_id"), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.col("doc_id").alias("cluster_id"),
                F.lit(1).cast("long").alias("cluster_size"),
                F.lit(True).alias("is_canonical"),
            )
        )
        out = out.unionByName(singles)
    return out
