"""Bucketed-table helpers: the shuffle-elimination path for repeated
big-big joins.

At 100 TB the orders↔lineitem edge outgrows broadcast and becomes a
shuffled join on orderkey *every time it's used*.  Writing both tables
bucketed by the join key moves that shuffle to write time, once: Spark's
scan reports the bucketing as the output partitioning, and every
subsequent equi-join / aggregation on the key plans with **zero
exchanges** (proven in tests/test_bucketing.py via plans.audit).

This is the code-free contract referenced in SCALE.md: the query layer
writes joins as ``join(on=key)``; pointing the catalog at bucketed tables
lights this up with no query changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket) table.

    Sorting by the key within buckets additionally removes the sort from
    future sort-merge joins and enables skip-scanning.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
