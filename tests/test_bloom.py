"""Bloom-filter semi-join prefilter: exactness (identical to plain semi
join — no false negatives ever, false positives removed by the exact
join), real prefilter selectivity, and the bounded-driver-state rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)

M = 1 << 12  # small filter so the tests also exercise false-positive paths


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    words = bloom_build(keys, F.col("k"), m_bits=M)
    # every inserted key must test positive
    missed = keys.filter(~bloom_might_contain(words, F.col("k"), m_bits=M))
    assert missed.count() == 0


def test_filter_actually_filters(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    words = bloom_build(build, F.col("k"), m_bits=M)
    kept = probe.filter(bloom_might_contain(words, F.col("k"), m_bits=M)).count()
    # 100 true members + a small false-positive tail; far below the 20k input
    assert 100 <= kept < 2_000


def test_semi_join_row_identical(spark):
    probe = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    build = spark.range(0, 5_000, 3).select(F.col("id").alias("bk"))
    got = bloom_semi_join(probe, build, probe_key="k", build_key="bk", m_bits=M)
    want = probe.join(
        build.select(F.col("bk").alias("k")).distinct(), "k", "left_semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_driver_state_bounded(spark):
    words = bloom_build(
        spark.range(0, 10_000).select(F.col("id").alias("k")),
        F.col("k"),
        m_bits=M,
    )
    # the collected state is m_bits/64 words no matter the build cardinality
    assert len(words) == M // 64
    # packed int64 words (bit 63 may set the sign)
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
