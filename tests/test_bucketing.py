"""Bucketing eliminates the join shuffle — the SCALE.md claim, proven."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.operators.bucketing import bucketed_join, write_bucketed
from datafusion_tpch_spark.plans import exchange_count, plan_string

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    )
    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    )
    write_bucketed(li.select("okey", "l_quantity"), "b_lineitem", ["okey"], 8,
                   sort_cols=["okey"])
    write_bucketed(orders.select("okey", "o_totalprice"), "b_orders", ["okey"], 8,
                   sort_cols=["okey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_lineitem", "b_orders", ["okey"])
    joined.collect()
    assert exchange_count(joined) == 0, plan_string(joined)


def test_unbucketed_join_shuffles_for_comparison(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    ).hint("merge")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_totalprice"
    ).hint("merge")
    joined = li.join(orders, ["okey"])
    assert exchange_count(joined) >= 2  # both sides shuffle without buckets


def test_bucketed_results_equal_plain(spark, bucketed_tables):
    got = bucketed_join(spark, "b_lineitem", "b_orders", ["okey"])
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_totalprice"
    )
    want = li.join(orders, ["okey"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
