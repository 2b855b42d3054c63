"""Partition pruning, proven: a table written with a partition column is
scanned with PartitionFilters when filtered on it — the scan skips whole
directories, the property SCALE.md relies on for bucketed/partitioned
layouts at 100 TB."""

from __future__ import annotations

import re
import shutil
import tempfile

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.plans import plan_string

SF_DIR = "/root/testdata/sf0.001"


def test_partition_filter_reaches_scan(spark):
    out = tempfile.mkdtemp(prefix="part_events_")
    try:
        ev = load_table(spark, SF_DIR, "events")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

        one = spark.read.parquet(out).filter(F.col("event_type") == "click")
        plan = plan_string(one)
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "event_type" in m.group(1), plan
        # pruned scan returns exactly the partition's rows
        want = ev.filter(F.col("event_type") == "click").count()
        assert one.count() == want
    finally:
        shutil.rmtree(out, ignore_errors=True)
