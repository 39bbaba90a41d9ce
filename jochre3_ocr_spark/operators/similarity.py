"""Similarity search over an embedding column (array<float>) —
first-class library API (SQL twins in __spark_entry__ for the DuckDB
oracle; tests assert equality).

* brute-force cosine top-k — the exact baseline: posexplode both sides,
  join on position, aggregate dot/norms (all JVM; at scale, the
  candidate side is the big table and the query side broadcasts)
* IVF top-k — the scale path: coarse-quantize every vector to its
  nearest centroid, probe only the query's cell (here centroids =
  the first K vectors; production swaps in k-means centroids)
* cosine near-duplicate pairs within a blocking key
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _exploded(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id), F.posexplode(vec_col).alias("pos", "val")
    ).select(out_id, "pos", F.col("val").cast("double").alias("v"))


def _cosines(q: DataFrame, c: DataFrame, qid: str, cid: str) -> DataFrame:
    return (
        q.join(c, "pos")
        .groupBy(qid, cid)
        .agg(
            (
                F.sum(q["v"] * c["v"])
                / (F.sqrt(F.sum(q["v"] * q["v"])) * F.sqrt(F.sum(c["v"] * c["v"])))
            ).alias("cos")
        )
    )


def cosine_topk(
    df: DataFrame,
    query_filter: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the rows matching ``query_filter``.
    Returns (qid, cid, rank)."""
    from pyspark.sql.window import Window

    q = _exploded(df.filter(query_filter), id_col, vec_col, "qid").alias("q")
    c = _exploded(df, id_col, vec_col, "cid").alias("c")
    cos = _cosines(q, c, "qid", "cid").filter("qid <> cid")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank")
    )


def ivf_topk(
    df: DataFrame,
    query_filter: str,
    k: int = 3,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: assign every vector to its nearest of the first
    ``n_cells`` vectors (deterministic centroids), search only within the
    query's cell. Returns (qid, cid, rank)."""
    from pyspark.sql.window import Window

    e = _exploded(df, id_col, vec_col, "vid").alias("e")
    cent = _exploded(df.filter(f"{id_col} < {n_cells}"), id_col, vec_col, "cell").alias("cent")
    cell_cos = _cosines(e, cent, "vid", "cell")
    w0 = Window.partitionBy("vid").orderBy(F.desc("cos"), F.asc("cell"))
    assign = (
        cell_cos.withColumn("rn", F.row_number().over(w0))
        .filter("rn = 1")
        .select("vid", "cell")
    )

    # Prune BEFORE scoring: attach the cell to each exploded side and make
    # the cosine join key (pos, cell), so only same-cell pairs are ever
    # aggregated — the probe cost is |cell| not |corpus| per query.
    aq = assign.alias("aq")
    ac = assign.alias("ac")
    q = (
        _exploded(df.filter(query_filter), id_col, vec_col, "qid")
        .join(aq, F.col("qid") == F.col("aq.vid"))
        .select("qid", "pos", "v", F.col("aq.cell").alias("cell"))
        .alias("q")
    )
    c = (
        _exploded(df, id_col, vec_col, "cid")
        .join(ac, F.col("cid") == F.col("ac.vid"))
        .select("cid", "pos", F.col("v").alias("cv"), F.col("ac.cell").alias("ccell"))
        .alias("c")
    )
    same_cell = (
        q.join(
            c,
            (F.col("q.pos") == F.col("c.pos"))
            & (F.col("q.cell") == F.col("c.ccell")),
        )
        .groupBy("qid", "cid")
        .agg(
            (
                F.sum(F.col("q.v") * F.col("c.cv"))
                / (
                    F.sqrt(F.sum(F.col("q.v") * F.col("q.v")))
                    * F.sqrt(F.sum(F.col("c.cv") * F.col("c.cv")))
                )
            ).alias("cos")
        )
        .filter("qid <> cid")
        .select("qid", "cid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        same_cell.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs within a blocking key. Returns
    (v1, v2, cosine rounded)."""
    e = df.select(
        F.col(id_col).alias("vid"),
        F.col(block_col).alias("blk"),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select("vid", "blk", "pos", F.col("val").cast("double").alias("v"))
    a = e.alias("a")
    b = e.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .groupBy(F.col("a.vid").alias("v1"), F.col("b.vid").alias("v2"))
        .agg(
            (
                F.sum(F.col("a.v") * F.col("b.v"))
                / (
                    F.sqrt(F.sum(F.col("a.v") * F.col("a.v")))
                    * F.sqrt(F.sum(F.col("b.v") * F.col("b.v")))
                )
            ).alias("cos")
        )
    )
    return pair.filter(F.col("cos") > threshold).select(
        "v1", "v2", F.round("cos", 4).alias("cosine")
    )
