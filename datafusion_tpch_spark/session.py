"""SparkSession construction tuned for the analytics workload.

The reference engine is a single-process DataFusion context
(``/root/reference/src/lib.rs:189-200``); ours is a SparkSession.  The
defaults below are chosen for correctness-critical parity with the DuckDB
oracle (UTC session timezone, ANSI off) and for scale (AQE with skew-join
handling enabled, partition counts sized from the environment so the same
code runs on local[32] and on a 1000-executor cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "datafusion-tpch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    At 100 TB the same settings hold: AQE coalesces the statically-sized
    shuffle into right-sized partitions at runtime and splits skewed
    partitions of the big fact-table joins; broadcast threshold covers the
    dimension tables (nation/region/supplier are tiny at every SF).
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime partition coalescing + skew-join
        # splitting; this is the 100TB story for lineitem-sized shuffles.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size post-shuffle partitions by BYTES (advisoryPartitionSizeInBytes,
        # default 64m) instead of stopping the coalesce at defaultParallelism:
        # with parallelismFirst=true (Spark's default) every sub-GB shuffle on
        # a 32-core session keeps ~32 near-empty reducers, which round 14's
        # scaling block measured as the dominant local cost (the 8-core bench
        # beat the 32-core one; events_kmv_setops ratio 0.24).  Bytes-derived
        # sizing is workload-proportional at every scale — a 100 TB shuffle
        # still gets full width because its bytes demand it.  (A/B at sf0.1
        # on the worst inverted gates: kmv_setops 1.08->0.81s,
        # stream_stream_join 0.33->0.21s; mid-size parallel gates flat within
        # the +/-20% window noise — tables in OPTIMIZATION_r15.md.)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        # Arrow for any pandas interchange (mapInPandas operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables are broadcast well past the default 10MB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deterministic float formatting / no ANSI interval surprises when
        # results are compared against the DuckDB oracle.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master or not _active_session():
        builder = builder.master(master or f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _active_session() -> SparkSession | None:
    return SparkSession.getActiveSession()
