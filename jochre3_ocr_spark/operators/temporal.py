"""Temporal relational operators Spark lacks as built-ins: as-of join and
bounded range join, expressed so the physical plan stays a single hash
shuffle per side (no theta/cartesian join, no per-row Python).

The reference engine processes one document at a time and has no temporal
join surface (``Jochre.scala:186-211`` is a sequential fold); these
operators exist for the corpus/events side of the engine, where a
100 TB event log needs "most recent prior event" and "events within a
window" joins that survive a 1000-executor shuffle plan.

Design notes (100 TB posture):

* ``asof_join`` is the union-tag + running ``last(ignorenulls)`` window
  formulation: both sides are unioned, partitioned by the equi-keys and
  ordered by (ts, side).  One Exchange per input on the equi-keys, no
  range predicate ever reaches the join planner, so Spark can never fall
  back to ``BroadcastNestedLoopJoin``.  Skewed keys behave exactly like
  any window over a hot partition (salt upstream if one user owns the
  log).
* ``range_join_binned`` is the bucketed interval join: the window width
  becomes the bucket size, the probe side explodes to the (at most two)
  buckets its interval overlaps, and the join is a plain equi-join on
  (keys..., bucket) with the exact range predicate applied as a
  post-filter.  Each build row lands in exactly one bucket, so a pair
  can match at most once and no dedup pass is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    prefix: str = "asof_",
    allow_exact: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``allow_exact=False``) sharing the
    ``on`` keys; left rows with no prior right row keep NULL payload.

    Output: all left columns plus ``{prefix}{c}`` for each payload column
    and ``{prefix}ts`` for the matched timestamp.

    ``tiebreak`` orders right rows that share an exact timestamp (pass a
    right-side column name); when several right rows tie on
    (keys, right_ts), the one greatest under ``tiebreak`` wins, making
    the result deterministic regardless of partitioning.
    """
    on = list(on)
    right_payload = list(right_payload)
    # Side ordering encodes the boundary rule: with allow_exact the right
    # row at t is visible to a left row at the same t (right sorts first).
    right_side, left_side = (0, 1) if allow_exact else (1, 0)

    matched_cols = [F.col(c).alias(f"__m_{c}") for c in right_payload]
    matched_cols.append(F.col(right_ts).alias("__m_ts"))
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tie"),
        *matched_cols,
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(0).alias("__tie"),
    )
    for c in right_payload:
        l = l.withColumn(f"__m_{c}", F.lit(None).cast(r.schema[f"__m_{c}"].dataType))
    l = l.withColumn("__m_ts", F.lit(None).cast(r.schema["__m_ts"].dataType))
    # Union by explicit column list so both sides line up; right-side rows
    # carry typed NULLs for the left-only columns.
    cols = on + ["__t", "__side", "__tie"] + [f"__m_{c}" for c in right_payload] + ["__m_ts"]
    missing = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left_cols
        if c not in set(cols)
    ]
    r_full = r.select(*cols, *missing)
    l_full = l.select(*cols, *[F.col(c) for c in left_cols if c not in set(cols)])
    both = r_full.unionByName(l_full)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__m_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in right_payload
    ]
    carried.append(F.last("__m_ts", ignorenulls=True).over(w).alias(f"{prefix}ts"))
    out = both.select(*[F.col(c) for c in cols if c not in {"__tie"}],
                      *[F.col(c) for c in left_cols if c not in set(cols)],
                      *carried)
    out = out.where(F.col("__side") == F.lit(left_side))
    return out.select(*left_cols, *[f"{prefix}{c}" for c in right_payload], f"{prefix}ts")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = -600.0,
    upper_s: float = 0.0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs (left row, right row) sharing ``on`` keys with
    ``left_ts + lower_s < right_ts <= left_ts + upper_s`` (seconds),
    produced via bucket equi-join instead of a range/theta join.

    Returns every column of both inputs, non-key columns prefixed.  Each
    right row hashes to exactly one bucket of width ``upper_s - lower_s``
    and each left interval overlaps at most two buckets, so the join is
    a plain shuffled equi-join on (keys..., bucket) — the plan Spark
    picks is SortMergeJoin/ShuffledHashJoin, never a nested-loop.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    on = list(on)
    width = float(upper_s - lower_s)

    # Parquet TIMESTAMP_NTZ needs a cast before unix_micros; any consistent
    # epoch works for bucketing (both sides cast identically).
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    width_us = int(round(width * 1_000_000))
    lower_us = int(round(lower_s * 1_000_000))
    upper_us = int(round(upper_s * 1_000_000))

    lo_bucket = F.floor((l_us + F.lit(lower_us) + F.lit(1)) / F.lit(width_us))
    hi_bucket = F.floor((l_us + F.lit(upper_us)) / F.lit(width_us))
    lrenamed = left.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c not in on],
        l_us.alias("__l_us"),
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))).alias("__bucket"),
    )
    rrenamed = right.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c not in on],
        r_us.alias("__r_us"),
        F.floor(r_us / F.lit(width_us)).alias("__bucket"),
    )
    joined = lrenamed.join(rrenamed, on=on + ["__bucket"], how="inner")
    exact = joined.where(
        (F.col("__r_us") > F.col("__l_us") + F.lit(lower_us))
        & (F.col("__r_us") <= F.col("__l_us") + F.lit(upper_us))
    )
    return exact.drop("__bucket", "__l_us", "__r_us")
