"""The numpy xxhash64 replica must match Spark's F.xxhash64 bit-for-bit —
this equality is what makes the SQL UDTF surface value-identical to the
distributed Column-expression generators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datafusion_tpch_spark.functions import xxh64


def test_hash_patterns_match_spark(spark):
    """Every child-type pattern the generators use: (str,long), (long,),
    (str,long,int), and a >32-byte string exercising the stripe loop."""
    long_tag = "a_longer_tag_exceeding_thirty_two_bytes_for_stripe_path"
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.xxhash64(F.lit("s_nat"), F.col("id") + 1).alias("h1"),
        F.xxhash64(F.col("id")).alias("h2"),
        F.xxhash64(F.lit("l_qty"), F.col("id") + 1, F.lit(3)).alias("h3"),
        F.xxhash64(F.lit(long_tag), F.col("id")).alias("h4"),
        F.xxhash64(F.lit("x")).alias("h5"),
    ).toPandas()
    ids = df["id"].to_numpy()
    assert (xxh64.xxhash64(("str", "s_nat"), ("long", ids + 1)) == df["h1"].to_numpy()).all()
    assert (xxh64.xxhash64(("long", ids)) == df["h2"].to_numpy()).all()
    h3 = xxh64.xxhash64(("str", "l_qty"), ("long", ids + 1), ("int", np.full(len(ids), 3)))
    assert (h3 == df["h3"].to_numpy()).all()
    assert (xxh64.xxhash64(("str", long_tag), ("long", ids)) == df["h4"].to_numpy()).all()
    assert int(xxh64.xxhash64(("str", "x"))) == int(df["h5"].iloc[0])


def test_pmod_matches_spark(spark):
    df = spark.range(0, 500).select(
        F.pmod(F.xxhash64(F.lit("t"), F.col("id")), F.lit(25)).alias("p")
    ).toPandas()
    ids = np.arange(500, dtype=np.int64)
    p = xxh64.pmod(xxh64.xxhash64(("str", "t"), ("long", ids)), 25)
    assert (p == df["p"].to_numpy()).all()
