"""Smoke tests for the driver contract surface (__spark_entry__)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    missing = set(qs) - set(os_)
    assert not missing, f"queries without oracles: {missing}"
