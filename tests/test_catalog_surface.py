"""Tier-B engine-surface parity (SURVEY §2.1 S5/S7/S8): catalog listing,
SHOW TABLES / information schema, in-memory tables, display/collection."""

from __future__ import annotations

from datafusion_tpch_spark.catalog import listing, register_tables
from datafusion_tpch_spark.sources.parquet_io import show_tables

SF_DIR = "/root/testdata/sf0.001"


def test_show_tables_lists_registered_views(spark):
    register_tables(spark, SF_DIR)
    names = {r.tableName for r in show_tables(spark).collect()}
    for t in ("lineitem", "orders", "nation", "documents"):
        assert t in names
    # catalog API agrees with SQL surface (examples/parquet.rs:8-14 shape)
    api_names = {t.name for t in spark.catalog.listTables()}
    assert names <= api_names


def test_listing_shape_matches_reference(spark):
    """tpch() returns a 1-column table_name listing (src/lib.rs:294-306)."""
    df = listing(spark)
    assert df.columns == ["table_name"]
    assert df.count() == 10


def test_cached_table_scan(spark):
    """S5: the reference's MemTable == a cached temp view; queries resolve
    against the in-memory relation after .cache()."""
    dfs = register_tables(spark, SF_DIR, tables=("nation",))
    nation = dfs["nation"].cache()
    try:
        assert nation.count() == 25  # materialize
        got = spark.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n
        assert got == 25
        assert len(nation.limit(5).collect()) == 5  # S8 collect/show path
    finally:
        nation.unpersist()
