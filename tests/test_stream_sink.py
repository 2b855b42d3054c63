"""Production-sink path: writeStream -> parquet files with checkpointing,
then read the files back and compare with the batch answer."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.functions.exact import dsum
from datafusion_tpch_spark.streaming import hourly_agg_stream, read_events_stream

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_sink_roundtrip(spark):
    out = tempfile.mkdtemp(prefix="stream_sink_")
    chk = tempfile.mkdtemp(prefix="stream_chk_")
    try:
        # parquet sink requires append mode; select only the stable window
        # aggregate via update-less projection — use counts per event_type
        # with watermark so append emits closed windows, plus a final
        # complete pass isn't needed because AvailableNow processes the
        # bounded input then closes; windows emit on watermark advancement
        # across the (multiple) availableNow micro-batches.
        stream = hourly_agg_stream(read_events_stream(spark, SF_DIR), watermark="0 seconds")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        got = spark.read.parquet(out)
        # append mode emits only watermark-closed windows: everything but
        # the max-timestamp hour must be present and exact
        ev = load_table(spark, SF_DIR, "events")
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        want = (
            ev.filter(F.date_trunc("hour", "ts") < F.date_trunc("hour", F.lit(max_ts)))
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        )
        missing = want.join(
            got, ["hour", "event_type", "n_events", "sum_value"], "left_anti"
        )
        assert missing.count() == 0, missing.limit(5).collect()
        assert got.count() >= want.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
