"""The window/partial forms of the exact aggregates must be bit-identical
to the groupBy forms they replace in q17/q20 — the single-pass rewrites
lean on decimal re-aggregation being exact at any grouping."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datafusion_tpch_spark.functions.exact import (
    davg, davg_over, dsum, dsum_q, unq,
)


def _frame(spark):
    # Values chosen to exercise the quantizer: dyadic, repeating-binary,
    # negative, and sub-quantum magnitudes across skewed group sizes.
    rows = [
        (k, s, v)
        for k in range(4)
        for s, v in enumerate(
            [0.1, 0.25, -7.3, 1e-9, 123456.789, -0.0, 3.0000000049][: 3 + k]
        )
    ]
    return spark.createDataFrame(rows, "k int, s int, v double")


def test_davg_over_matches_groupby_davg(spark):
    df = _frame(spark)
    via_group = {
        r["k"]: r["a"]
        for r in df.groupBy("k").agg(davg(F.col("v")).alias("a")).collect()
    }
    via_window = df.withColumn(
        "a", davg_over(F.col("v"), Window.partitionBy("k"))
    ).collect()
    assert via_window, "empty frame"
    for r in via_window:
        assert r["a"] == via_group[r["k"]]  # bitwise, not approx


def test_dsum_q_resum_matches_direct_dsum(spark):
    df = _frame(spark)
    direct = {
        r["k"]: r["t"]
        for r in df.groupBy("k").agg(dsum(F.col("v")).alias("t")).collect()
    }
    partial = df.groupBy("k", "s").agg(dsum_q(F.col("v")).alias("pq"))
    resummed = partial.select(
        "k", unq(F.sum("pq").over(Window.partitionBy("k"))).alias("t")
    ).collect()
    assert resummed, "empty frame"
    for r in resummed:
        assert r["t"] == direct[r["k"]]  # bitwise, not approx
