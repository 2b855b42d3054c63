"""Watermark semantics: events arriving later than the watermark horizon
are dropped from append-mode windowed aggregation.

Two-file file-stream processed one file per micro-batch: batch 1
establishes the watermark from its max event time; batch 2 delivers an
event far older than (watermark - delay), which must NOT resurrect its
(already finalized) window.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def _write_one_file(spark, rows, path):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_late_rows_beyond_watermark_dropped(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tempfile.mkdtemp(prefix="late_src_")
    chk = tempfile.mkdtemp(prefix="late_chk_")
    out_name = "t_late_windows"
    try:
        t0 = "2024-01-01 00:00:00"
        # batch 1: events at hours 0 and 10 -> watermark advances to ~09:50
        _write_one_file(
            spark,
            [
                (1, "2024-01-01 00:10:00", 1.0),
                (2, "2024-01-01 00:20:00", 1.0),
                (3, "2024-01-01 10:00:00", 1.0),
            ],
            os.path.join(src, "f1.parquet"),
        )
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*.parquet"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("hour"), "n")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(out_name)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                got = {r.hour.isoformat(): r.n for r in spark.table(out_name).collect()}
                if "2024-01-01T00:00:00" in got:
                    break
                time.sleep(1)
            assert got.get("2024-01-01T00:00:00") == 2, got

            # batch 2: an event in the (closed) hour-0 window — 9+ hours
            # late, far beyond the 10-minute delay -> must be dropped
            _write_one_file(
                spark,
                [(4, "2024-01-01 00:30:00", 1.0), (5, "2024-01-01 11:30:00", 1.0)],
                os.path.join(src, "f2.parquet"),
            )
            deadline = time.time() + 120
            while time.time() < deadline:
                got = {r.hour.isoformat(): r.n for r in spark.table(out_name).collect()}
                if "2024-01-01T10:00:00" in got:
                    break
                time.sleep(1)
            # hour-10 window closed by the 11:30 event (watermark 11:20); hour-0 stays 2:
            # the late event_id=4 was discarded, not re-emitted
            assert got.get("2024-01-01T10:00:00") == 1, got
            assert got.get("2024-01-01T00:00:00") == 2, got
            assert "2024-01-01T11:00:00" not in got  # still open
        finally:
            q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
