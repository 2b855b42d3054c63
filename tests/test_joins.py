"""Temporal join operators: as-of join and bucketized range join.

Semantics pinned on tiny synthetic frames (tie handling, tolerance,
no-match nulls); plan shape pinned against the nested-loop failure mode
(range predicates must run as equi-joins after bucketization).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datafusion_tpch_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (2, 102, _ts(5)), (3, 103, _ts(9))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts(10), 1.0),   # same instant as left 100 -> matches (inclusive)
            (1, 901, _ts(10), 2.0),   # tie: higher order id wins
            (1, 902, _ts(15), 3.0),   # latest before left 101
            (2, 903, _ts(50), 4.0),   # after left 102 -> no match
        ],
        "user_id long, click_id long, click_ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(spark, tiny):
    left, right = tiny
    out = asof_join(
        left.withColumn("_oid", F.col("event_id")),
        right.withColumn("_oid", F.col("click_id")),
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id", "v"],
        order_col="_oid",
    )
    rows = {r.event_id: (r.click_id, r.v) for r in out.collect()}
    assert rows[100] == (901, 2.0)      # equal-ts rows match; max order id wins
    assert rows[101] == (902, 3.0)      # latest earlier row
    assert rows[102] == (None, None)    # only later right rows exist
    assert rows[103] == (None, None)    # user has no right rows


def test_asof_tolerance_nulls_stale_matches(spark, tiny):
    left, right = tiny
    out = asof_join(
        left.withColumn("_oid", F.col("event_id")),
        right.withColumn("_oid", F.col("click_id")),
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id"],
        order_col="_oid",
        tolerance_us=4_000_000,  # 4 s
    )
    rows = {r.event_id: r.click_id for r in out.collect()}
    assert rows[100] == 901   # 0 s old
    assert rows[101] is None  # 5 s old > 4 s tolerance


def test_asof_single_shuffle(spark, tiny):
    left, right = tiny
    plan = asof_join(
        left.withColumn("_oid", F.col("event_id")),
        right.withColumn("_oid", F.col("click_id")),
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id"],
        order_col="_oid",
    )._jdf.queryExecution().executedPlan().toString()
    # union + one window: exactly one exchange, and never a join operator
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_range_join_equals_naive(spark):
    probe = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", _ts(i % 50)) for i in range(200)],
        "id long, k string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            ("a", _ts(5), _ts(12)),
            ("a", _ts(40), _ts(55)),
            ("b", _ts(0), _ts(3)),
        ],
        "k string, lo timestamp, hi timestamp",
    )
    got = range_join(
        probe, iv, on=["k"], probe_ts="ts", start_col="lo", end_col="hi", bucket_s=7
    )
    naive = probe.join(iv, "k").filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
    cols = ["id", "k", "lo"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, naive.select(cols).collect())
    )
    assert got.count() == naive.count()


def test_range_join_no_nested_loop(spark):
    probe = spark.createDataFrame(
        [(i, "a", _ts(i % 50)) for i in range(100)], "id long, k string, ts timestamp"
    )
    iv = spark.createDataFrame(
        [("a", _ts(5), _ts(12))], "k string, lo timestamp, hi timestamp"
    )
    plan = range_join(
        probe, iv, on=["k"], probe_ts="ts", start_col="lo", end_col="hi", bucket_s=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_half_open_edges(spark):
    probe = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(12))], "id long, k string, ts timestamp"
    )
    iv = spark.createDataFrame(
        [("a", _ts(5), _ts(12))], "k string, lo timestamp, hi timestamp"
    )
    ids = [
        r.id
        for r in range_join(
            probe, iv, on=["k"], probe_ts="ts", start_col="lo", end_col="hi", bucket_s=3
        ).collect()
    ]
    assert ids == [1]  # start inclusive, end exclusive


def test_range_join_rejects_bad_bucket(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        range_join(df, df, on=[], probe_ts="x", start_col="y", end_col="z", bucket_s=0)
