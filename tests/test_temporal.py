"""asof_join / range_join_binned semantics and plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 11:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "p4"),  # user with no right rows
        ],
        "user_id int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100, 1.0),
            (1, _ts("2024-01-01 10:00:00"), 101, 2.0),  # exactly at p1
            (1, _ts("2024-01-01 10:30:00"), 102, 3.0),
            (2, _ts("2024-01-01 12:00:00"), 103, 4.0),  # after p3
        ],
        "user_id int, ts timestamp, rid int, value double",
    )
    return left, right


def _rows(df):
    return {
        r["name"]: (r["m_rid"], r["m_ts"])
        for r in df.select("name", "m_rid", "m_ts").collect()
    }


def test_asof_exact_visible(frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, ["user_id"], right_payload=["rid"], prefix="m_")
    )
    assert out["p1"][0] == 101  # the equal-timestamp right row wins
    assert out["p2"][0] == 102
    assert out["p3"] == (None, None)  # right row exists but is later
    assert out["p4"] == (None, None)  # no right rows for the key


def test_asof_strict(frames):
    left, right = frames
    out = _rows(
        asof_join(
            left, right, ["user_id"], right_payload=["rid"], prefix="m_",
            allow_exact=False,
        )
    )
    assert out["p1"][0] == 100  # equal timestamp no longer visible
    assert out["p2"][0] == 102


def test_asof_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p")], "user_id int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), rid, 0.0) for rid in (7, 9, 8)],
        "user_id int, ts timestamp, rid int, value double",
    )
    out = _rows(
        asof_join(left, right, ["user_id"], right_payload=["rid"], prefix="m_",
                  tiebreak="rid")
    )
    assert out["p"][0] == 9  # greatest tiebreak among equal timestamps


def test_asof_single_exchange(frames):
    left, right = frames
    out = asof_join(left, right, ["user_id"], right_payload=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one per input union leg, same key
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_boundaries(spark):
    # window (t-600, t]: lower bound exclusive, upper inclusive
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:10:00"), "L")], "user_id int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "at_lower"),   # == t-600 -> excluded
            (1, _ts("2024-01-01 10:00:00.000001"), "in"),
            (1, _ts("2024-01-01 10:10:00"), "at_upper"),   # == t -> included
            (1, _ts("2024-01-01 10:10:00.000001"), "late"),
            (1, _ts("2024-01-01 10:04:59"), "in2"),
        ],
        "user_id int, ts timestamp, tag string",
    )
    out = range_join_binned(left, right, ["user_id"], lower_s=-600.0, upper_s=0.0)
    tags = sorted(r["r_tag"] for r in out.collect())
    assert tags == ["at_upper", "in", "in2"]


def test_range_join_no_duplicate_pairs(spark):
    # an interval that straddles a bucket boundary must match each right
    # row exactly once even though the left row explodes into two buckets
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:05:00"), "L")], "user_id int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:0%d:00" % i), f"r{i}") for i in range(0, 6)],
        "user_id int, ts timestamp, tag string",
    )
    out = range_join_binned(left, right, ["user_id"], lower_s=-600.0, upper_s=0.0)
    tags = [r["r_tag"] for r in out.collect()]
    assert sorted(tags) == sorted(set(tags))


def test_range_join_plan_no_nested_loop(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "L")], "user_id int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:59:00"), "r")], "user_id int, ts timestamp, tag string"
    )
    out = range_join_binned(left, right, ["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_empty_window():
    with pytest.raises(ValueError):
        range_join_binned(None, None, ["user_id"], lower_s=0.0, upper_s=0.0)


def test_asof_partitioning_invariant(spark, frames):
    left, right = frames
    a = asof_join(left, right, ["user_id"], right_payload=["rid"])
    b = asof_join(
        left.repartition(7), right.repartition(5), ["user_id"],
        right_payload=["rid"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
