"""Source/sink round-trips: parquet (the reference's COPY surface), CSV,
JSON — write with the sink helpers, read back, values survive."""

from __future__ import annotations

import shutil
import tempfile

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.sources import parquet_io

SF_DIR = "/root/testdata/sf0.001"


def _roundtrip(spark, write_fn, read_fn, schema):
    nation = load_table(spark, SF_DIR, "nation")
    out = tempfile.mkdtemp(prefix="io_rt_")
    try:
        n = write_fn(nation, out)
        assert n == 25
        back = read_fn(spark, out, schema) if schema else read_fn(spark, out)
        assert back.count() == 25
        want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
        got = {
            (int(r.n_nationkey), r.n_name, int(r.n_regionkey)) for r in back.collect()
        }
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_parquet_roundtrip(spark):
    _roundtrip(spark, parquet_io.copy_to_parquet, parquet_io.read_parquet, None)


def test_csv_roundtrip(spark):
    _roundtrip(
        spark,
        parquet_io.copy_to_csv,
        parquet_io.read_csv,
        "n_nationkey int, n_name string, n_regionkey int",
    )


def test_json_roundtrip(spark):
    _roundtrip(
        spark,
        parquet_io.copy_to_json,
        parquet_io.read_json,
        "n_nationkey long, n_name string, n_regionkey long",
    )


def test_copy_query_result(spark):
    """COPY (SELECT ...) TO ... — the inline-subquery form
    (examples/parquet.rs:28)."""
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation")
    out = tempfile.mkdtemp(prefix="io_q_")
    try:
        df = spark.sql("SELECT n_name FROM nation WHERE n_regionkey = 1")
        n = parquet_io.copy_to_parquet(df, out)
        assert n == df.count() > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_orc_roundtrip(spark):
    _roundtrip(spark, parquet_io.copy_to_orc, parquet_io.read_orc, None)
