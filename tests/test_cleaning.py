"""Semantic invariants for the data-cleaning gates (queries/cleaning.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    return all_queries()[name].build(spark, SF_DIR)


def test_impute_counts_and_median_membership(spark):
    rows = _q(spark, "part_impute_median").collect()
    p = load_table(spark, SF_DIR, "part")
    assert sum(r["n_rows"] for r in rows) == p.count()
    n_dirty = p.filter(F.col("p_partkey") % 13 == 0).count()
    assert sum(r["n_imputed"] for r in rows) == n_dirty
    # the imputed median is an actual surviving price of that brand
    for r in rows:
        prices = {
            x["p_retailprice"]
            for x in p.filter(
                (F.col("p_brand") == r["p_brand"])
                & (F.col("p_partkey") % 13 != 0)
            ).collect()
        }
        assert r["brand_median"] in prices


def test_winsorize_bounds_and_totals(spark):
    rows = _q(spark, "lineitem_winsorize").collect()
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_rows"] for r in rows) == li.count()
    for r in rows:
        assert r["p01"] <= r["p99"]
        # ~1% capped at each tail (nearest-rank, so within 2% slack)
        assert r["n_capped_low"] <= r["n_rows"] * 0.02 + 1
        assert r["n_capped_high"] <= r["n_rows"] * 0.02 + 1
        # winsorized mean lies within the clip band
        mean_w = r["sum_winsorized"] / r["n_rows"]
        assert r["p01"] <= mean_w <= r["p99"]


def test_key_census_covers_every_event(spark):
    rows = _q(spark, "events_props_key_census").collect()
    assert rows
    for r in rows:
        assert 0 < r["n_with_key"] <= r["n_total"]
        assert 0 < r["coverage_ppm"] <= 1_000_000
