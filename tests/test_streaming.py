"""Streaming == batch equivalence, executed through the real
Structured Streaming engine (AvailableNow trigger over the bounded fixture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.functions.exact import dsum
from datafusion_tpch_spark.streaming import (
    hourly_agg_stream,
    read_events_stream,
    run_stream_to_df,
    session_window_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hourly_stream_equals_batch(spark):
    stream = hourly_agg_stream(read_events_stream(spark, SF_DIR))
    got = run_stream_to_df(spark, stream, "t_hourly").orderBy("hour", "event_type")

    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .orderBy("hour", "event_type")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_session_stream_total_events_conserved(spark):
    stream = session_window_stream(read_events_stream(spark, SF_DIR))
    got = run_stream_to_df(spark, stream, "t_sessions")
    total = got.agg(F.sum("n_events")).collect()[0][0]
    n_rows = load_table(spark, SF_DIR, "events").count()
    assert total == n_rows
    # sessions are per-user and non-empty
    assert got.filter(F.col("n_events") <= 0).count() == 0


def test_foreach_batch_custom_sink(spark):
    """foreachBatch: arbitrary batch-DataFrame logic per micro-batch — the
    escape hatch for sinks Spark lacks (upserts, multi-table writes)."""
    seen: dict[int, int] = {}

    def sink(batch_df, epoch_id: int) -> None:
        seen[epoch_id] = batch_df.count()

    q = (
        read_events_stream(spark, SF_DIR)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(seen.values()) == total
    assert len(seen) >= 1


def test_session_stream_gap_property(spark):
    """Within a reconstructed session no gap >= 30min; session starts align
    with the first event of each session."""
    stream = session_window_stream(read_events_stream(spark, SF_DIR))
    got = run_stream_to_df(spark, stream, "t_sessions2")
    starts = {(r.user_id, r.session_start) for r in got.collect()}
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r.ts)
    gap = 30 * 60
    expected_starts = set()
    for uid, tss in by_user.items():
        tss.sort()
        prev = None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() >= gap:
                expected_starts.add((uid, ts))
            prev = ts
    assert starts == expected_starts


def test_dedup_stream_collapses_redelivery(spark, tmp_path):
    """At-least-once simulation: the same events file delivered twice (two
    files in the stream source dir) — dropDuplicates still emits exactly
    the batch DISTINCT key set, once."""
    import shutil

    from pyspark.sql import functions as F  # noqa: F811

    from datafusion_tpch_spark.catalog import (
        EVENTS_MICROS_SCHEMA,
        EVENTS_RAW_SCHEMA,
        events_ts_is_nanos,
    )
    from datafusion_tpch_spark.streaming import dedup_keys_stream

    src = tmp_path / "redelivered"
    src.mkdir()
    fixture = f"{SF_DIR}/events.parquet"
    shutil.copy(fixture, src / "delivery1.parquet")
    shutil.copy(fixture, src / "delivery2.parquet")

    if events_ts_is_nanos(fixture):
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(str(src))
        events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        events = spark.readStream.schema(EVENTS_MICROS_SCHEMA).parquet(str(src))
    got = run_stream_to_df(
        spark, dedup_keys_stream(events), "t_dedup_redeliver", output_mode="append"
    )
    want = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream interval join emits exactly the batch
    interval-join pair set over bounded input."""
    from datafusion_tpch_spark.streaming import click_purchase_join_stream

    stream = click_purchase_join_stream(read_events_stream(spark, SF_DIR))
    got = run_stream_to_df(
        spark, stream, "t_ssjoin", output_mode="append"
    ).orderBy("purchase_id", "click_id")

    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    want = (
        p.join(
            c,
            (p.user_id == c.cu)
            & (c.cts <= p.pts)
            & (c.cts >= p.pts - F.expr("INTERVAL 2 HOURS")),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            (F.unix_micros("pts") - F.unix_micros("cts")).alias("lag_us"),
        )
        .orderBy("purchase_id", "click_id")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_multibatch_stream_equals_batch_hourly(spark):
    """The forced 4-micro-batch run must agree with the batch aggregation
    row-for-row — incremental state maintenance across batch boundaries
    changes nothing about the final answer."""
    import os

    from datafusion_tpch_spark.queries import all_queries

    specs = all_queries()
    got = specs["events_multibatch_stream"].build(spark, SF_DIR).collect()
    tag = SF_DIR.strip("/").replace("/", "_")
    path = f"/tmp/spark_graft_events_split4_{os.getpid()}_{tag}"
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4  # the stream really had 4 single-file triggers
    batch = specs["events_hourly"].build(spark, SF_DIR).collect()
    key = lambda r: (r[0], r[1])
    assert sorted(map(tuple, got), key=key) == sorted(map(tuple, batch), key=key)


def test_sink_reuse_returns_identical_results_without_rerun(spark):
    """Always-on sink reuse (round 6): the first reuse_key call runs the
    stream and registers completion; the second returns the SAME rows from
    the completed sink — no new streaming query starts."""
    from datafusion_tpch_spark.streaming import pipeline as pl

    stream = hourly_agg_stream(read_events_stream(spark, SF_DIR))
    first = run_stream_to_df(
        spark, stream, "t_reuse_hourly", reuse_key=SF_DIR
    ).orderBy("hour", "event_type").collect()
    sink = [s for s in pl._SINK_COMPLETE.get(spark, set())
            if s.startswith("t_reuse_hourly__")]
    assert sink, "first call must register sink completion"

    # second build: would raise/rerun if reuse failed; assert no active
    # streaming query is ever started for this sink again
    stream2 = hourly_agg_stream(read_events_stream(spark, SF_DIR))
    second = run_stream_to_df(
        spark, stream2, "t_reuse_hourly", reuse_key=SF_DIR
    ).orderBy("hour", "event_type").collect()
    assert second == first
    assert all(q.name != sink[0] for q in spark.streams.active)


def test_sink_reuse_is_session_scoped_not_app_scoped(spark):
    """ADVICE r06: memory-sink tables are session-scoped temp views, but
    applicationId is shared by spark.newSession() — an app-keyed completion
    cache would 'hit' on the new session and fail with
    TABLE_OR_VIEW_NOT_FOUND.  The session-keyed cache must instead re-run
    the stream in the new session and return identical rows."""
    stream = hourly_agg_stream(read_events_stream(spark, SF_DIR))
    first = run_stream_to_df(
        spark, stream, "t_reuse_scope", reuse_key=SF_DIR
    ).orderBy("hour", "event_type").collect()

    fresh = spark.newSession()
    stream2 = hourly_agg_stream(read_events_stream(fresh, SF_DIR))
    second = run_stream_to_df(
        fresh, stream2, "t_reuse_scope", reuse_key=SF_DIR
    ).orderBy("hour", "event_type").collect()
    assert second == first


def test_cdc_stream_recovers_from_checkpoint_after_crash(spark, tmp_path):
    """Kill-and-restart recovery proof for the foreachBatch CDC
    maintenance: the state table is persisted durably per COMMITTED
    micro-batch, the stream is crashed mid-flight (apply_batch raises on
    its second non-empty batch), and a fresh query over the SAME
    checkpoint — with its in-memory holder rebuilt only from the durable
    snapshot, as a restarted process would — must (a) not replay any
    committed batch, (b) resume at exactly the failed batch id, and
    (c) finish with state equal to the uninterrupted batch CDC merge."""
    import glob

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datafusion_tpch_spark.queries.extensions import (
        _CDC_CUTOFF,
        _CDC_QUIET_MOD,
        _CDC_QUIET_REM,
        _CDC_TOMBSTONE,
        _CDC_UNSNAPPED_MOD,
    )
    from datafusion_tpch_spark.queries.stream import _split4_layout
    from datafusion_tpch_spark.streaming.maintenance import (
        cdc_compact,
        cdc_finalize,
        cdc_merge_batch,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cut = F.lit(_CDC_CUTOFF).cast("timestamp")
    ev = load_table(spark, SF_DIR, "events")
    snap = ev.filter(
        (F.col("ts") < cut) & (F.col("user_id") % _CDC_UNSNAPPED_MOD != 0)
    )
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def snapshot_path(batch_id: int) -> str:
        return f"{state_dir}/b{batch_id:05d}"

    def latest_snapshot():
        snaps = sorted(glob.glob(f"{state_dir}/b*"))
        return snaps[-1] if snaps else None

    def make_feed():
        path = _split4_layout(spark, SF_DIR)
        schema = spark.read.parquet(path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
            .filter(
                (F.col("ts") >= cut)
                & (F.col("user_id") % _CDC_QUIET_MOD != _CDC_QUIET_REM)
            )
        )

    def run_phase(holder, crash_on_nth_nonempty=None):
        seen = []
        crashed = {}

        def apply_batch(batch_df, batch_id):
            if batch_df.isEmpty():
                seen.append((batch_id, False))
                return
            if (
                crash_on_nth_nonempty is not None
                and sum(1 for _, ne in seen if ne) + 1 >= crash_on_nth_nonempty
            ):
                crashed["bid"] = batch_id
                raise RuntimeError("injected crash before applying batch")
            comp = cdc_compact(batch_df, is_feed=True)
            holder["state"] = cdc_merge_batch(
                holder["state"], comp
            ).localCheckpoint()
            # durable per-batch snapshot: what a lakehouse MERGE target
            # gives you for free; written BEFORE the batch commits, so a
            # crash between write and commit replays the batch — safe,
            # because the argmax merge is idempotent
            holder["state"].write.mode("overwrite").parquet(
                snapshot_path(batch_id)
            )
            seen.append((batch_id, True))

        q = (
            make_feed()
            .writeStream.foreachBatch(apply_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        err = None
        try:
            q.awaitTermination(300)
        except StreamingQueryException as e:
            err = e
        finally:
            q.stop()
        return seen, crashed.get("bid"), err

    # phase 1: crash on the second non-empty batch
    holder = {"state": cdc_compact(snap, is_feed=False).localCheckpoint()}
    seen1, crashed_bid, err1 = run_phase(holder, crash_on_nth_nonempty=2)
    assert err1 is not None, "injected crash did not surface"
    assert crashed_bid is not None
    committed1 = {bid for bid, _ in seen1}  # every applied batch committed

    # phase 2: a "restarted process" — holder rebuilt ONLY from the
    # durable snapshot, same checkpoint; committed batches must not replay
    last = latest_snapshot()
    assert last is not None, "no durable snapshot before the crash"
    holder2 = {"state": spark.read.parquet(last).localCheckpoint()}
    seen2, _, err2 = run_phase(holder2)
    assert err2 is None
    assert seen2, "restart processed nothing"
    replayed = committed1 & {bid for bid, _ in seen2}
    assert not replayed, f"committed batches replayed: {replayed}"
    assert min(bid for bid, _ in seen2) == crashed_bid

    # recovered state == uninterrupted batch CDC merge (the oracle shape)
    got = cdc_finalize(holder2["state"], _CDC_TOMBSTONE).collect()
    feed_batch = ev.filter(
        (F.col("ts") >= cut)
        & (F.col("user_id") % _CDC_QUIET_MOD != _CDC_QUIET_REM)
    )
    want_state = cdc_merge_batch(
        cdc_compact(snap, is_feed=False),
        cdc_compact(feed_batch, is_feed=True),
    )
    want = cdc_finalize(want_state, _CDC_TOMBSTONE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_scd2_stream_recovers_from_checkpoint_after_crash(spark, tmp_path):
    """SCD2 twin of the CDC recovery proof — with a twist that matters:
    the SCD2 fold is NOT replay-idempotent (re-applying a batch would
    double-count versions and dwell), so recovery correctness rests on
    the durable snapshot being written for COMMITTED batches only and
    the restart resuming at exactly the first uncommitted batch, which
    is precisely what the file source's checkpointed offsets guarantee.
    The restarted run must not replay any committed batch and must
    finish with state equal to the uninterrupted batch SCD2 history."""
    import glob
    import json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datafusion_tpch_spark.queries.stream import _timeordered_week_layout
    from datafusion_tpch_spark.streaming.maintenance import (
        scd2_apply_batch,
        scd2_empty_state,
        scd2_finalize,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def snapshot(batch_id, holder):
        base = f"{state_dir}/b{batch_id:05d}"
        holder["agg"].write.mode("overwrite").parquet(f"{base}/agg")
        holder["open"].write.mode("overwrite").parquet(f"{base}/open")
        with open(f"{base}/meta.json", "w") as fh:
            json.dump({"max_us": holder["max_us"]}, fh)

    def latest_snapshot():
        snaps = sorted(glob.glob(f"{state_dir}/b*"))
        return snaps[-1] if snaps else None

    def make_feed():
        layout = _timeordered_week_layout(spark, SF_DIR)
        schema = spark.read.parquet(layout).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(layout)
        )

    def run_phase(holder, crash_on_nth_nonempty=None):
        seen, crashed = [], {}

        def apply_batch(batch_df, batch_id):
            us = F.unix_micros(F.col("ts"))
            b = batch_df.select(
                "user_id", "event_id",
                F.col("event_type").alias("state_type"), us.alias("us"),
            ).localCheckpoint()
            bounds = b.agg(F.min("us").alias("lo"), F.max("us").alias("hi")).collect()[0]
            if bounds["lo"] is None:
                seen.append((batch_id, False))
                return
            if (
                crash_on_nth_nonempty is not None
                and sum(1 for _, ne in seen if ne) + 1 >= crash_on_nth_nonempty
            ):
                crashed["bid"] = batch_id
                raise RuntimeError("injected crash before applying batch")
            if holder["max_us"] is not None and bounds["lo"] < holder["max_us"]:
                raise AssertionError("feed out of order")
            holder["max_us"] = bounds["hi"]
            new_agg, new_open = scd2_apply_batch(holder["agg"], holder["open"], b)
            holder["agg"] = new_agg.localCheckpoint()
            holder["open"] = new_open.localCheckpoint()
            snapshot(batch_id, holder)
            seen.append((batch_id, True))

        q = (
            make_feed()
            .writeStream.foreachBatch(apply_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        err = None
        try:
            q.awaitTermination(300)
        except StreamingQueryException as e:
            err = e
        finally:
            q.stop()
        return seen, crashed.get("bid"), err

    empty_agg, empty_open = scd2_empty_state(spark)
    holder = {
        "agg": empty_agg.localCheckpoint(),
        "open": empty_open.localCheckpoint(),
        "max_us": None,
    }
    seen1, crashed_bid, err1 = run_phase(holder, crash_on_nth_nonempty=2)
    assert err1 is not None and crashed_bid is not None
    committed1 = {bid for bid, _ in seen1}

    last = latest_snapshot()
    assert last is not None, "no durable snapshot before the crash"
    import json as _json

    meta = _json.load(open(f"{last}/meta.json"))
    holder2 = {
        "agg": spark.read.parquet(f"{last}/agg").localCheckpoint(),
        "open": spark.read.parquet(f"{last}/open").localCheckpoint(),
        "max_us": meta["max_us"],
    }
    seen2, _, err2 = run_phase(holder2)
    assert err2 is None and seen2
    replayed = committed1 & {bid for bid, _ in seen2}
    assert not replayed, f"committed batches replayed: {replayed}"
    assert min(bid for bid, _ in seen2) == crashed_bid

    got = scd2_finalize(holder2["agg"], holder2["open"]).collect()
    want = _build_q(spark, "events_scd2_history").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _build_q(spark, name):
    from datafusion_tpch_spark.queries import all_queries

    return all_queries()[name].build(spark, SF_DIR)


def test_ingest_stream_is_multibatch_and_equals_batch_admission(spark):
    """docs_dedup_ingest_stream must (a) really run ≥4 micro-batches
    (4-file incoming layout, maxFilesPerTrigger=1), and (b) maintain
    exactly the batch admission table (dedup_incremental_lsh)."""
    import os

    from datafusion_tpch_spark.queries import all_queries
    from datafusion_tpch_spark.queries.advanced import _scratch_path
    from datafusion_tpch_spark.queries.stream import _INGEST_STREAM_STATE

    specs = all_queries()
    got = specs["docs_dedup_ingest_stream"].build(spark, SF_DIR).collect()
    path = _scratch_path("docs_incoming4", SF_DIR)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4  # the stream really had 4 single-file triggers
    assert _INGEST_STREAM_STATE[spark][SF_DIR][1] >= 4  # ≥4 non-empty batches
    batch = specs["dedup_incremental_lsh"].build(spark, SF_DIR).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # admission did both things at least once on this fixture
    kept = {r["kept"] for r in got}
    assert kept == {True, False}, f"degenerate fixture verdicts: {kept}"


def test_token_meter_stream_is_multibatch_and_equals_batch_rollup(spark):
    """docs_token_meter_stream must run >=4 real micro-batches and its
    maintained per-source totals must equal the batch BPE rollup summed
    over the incoming slice."""
    from pyspark.sql import functions as F

    from datafusion_tpch_spark.queries import all_queries
    from datafusion_tpch_spark.queries.curation import _bpe_doc_tokens
    from datafusion_tpch_spark.queries.extensions import _INCR_SPLIT
    from datafusion_tpch_spark.queries.stream import _METER_STREAM_STATE
    from datafusion_tpch_spark.catalog import load_table

    specs = all_queries()
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in specs["docs_token_meter_stream"].build(spark, SF_DIR).collect()
    }
    assert _METER_STREAM_STATE[spark][SF_DIR][1] >= 4
    per, _ = _bpe_doc_tokens(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    want = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in (
            docs.filter(F.col("doc_id") >= _INCR_SPLIT)
            .join(per, "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.coalesce("n_tokens", F.lit(0))).alias("n_tokens"),
            )
            .collect()
        )
    }
    assert got == want


def test_embeddings_ingest_stream_is_multibatch_and_equals_batch(spark):
    """embeddings_ingest_stream must run >=4 real micro-batches and its
    maintained rollup must equal the one-shot batch computation over the
    whole incoming slice against the same centroids."""
    from pyspark.sql import functions as F

    from datafusion_tpch_spark.catalog import load_table
    from datafusion_tpch_spark.queries import all_queries
    from datafusion_tpch_spark.queries.stream import (
        _EMB_INGEST_STREAM_STATE,
        _EMB_SPLIT,
        _emb_corpus_centroids,
    )
    from datafusion_tpch_spark.streaming.maintenance import ivf_ingest_batch

    specs = all_queries()
    got = specs["embeddings_ingest_stream"].build(spark, SF_DIR).collect()
    assert _EMB_INGEST_STREAM_STATE[spark][SF_DIR][1] >= 4
    # maintained (cell, dim) state == batch state over the full slice
    state = _EMB_INGEST_STREAM_STATE[spark][SF_DIR][0]
    incoming = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") >= _EMB_SPLIT
    )
    want = ivf_ingest_batch(incoming, _emb_corpus_centroids(spark, SF_DIR))
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the verdict rollup is non-degenerate on this fixture
    flags = {r["drifted"] for r in got}
    assert flags == {True, False}, flags
    assert all(r["n_vecs"] >= 1 for r in got)


def test_substring_ingest_stream_is_multibatch_and_equals_batch(spark):
    """docs_substring_ingest_stream must run >=4 real micro-batches and
    maintain exactly the batch span-admission table (span_admit_batch
    over the whole incoming slice against the same corpus index)."""
    from pyspark.sql import functions as F

    from datafusion_tpch_spark.catalog import load_table
    from datafusion_tpch_spark.queries import all_queries
    from datafusion_tpch_spark.queries.extensions import _INCR_SPLIT
    from datafusion_tpch_spark.queries.stream import (
        _XSUB_STREAM_STATE,
        _span_index,
    )
    from datafusion_tpch_spark.streaming.maintenance import span_admit_batch

    specs = all_queries()
    got = specs["docs_substring_ingest_stream"].build(spark, SF_DIR).collect()
    assert _XSUB_STREAM_STATE[spark][SF_DIR][1] >= 4  # >=4 non-empty batches
    incoming = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") >= _INCR_SPLIT)
        .select("doc_id", "text")
    )
    want = span_admit_batch(incoming, _span_index(spark, SF_DIR)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    kept = {r["kept"] for r in got}
    assert kept == {True, False}, f"degenerate fixture verdicts: {kept}"


def test_ann_ingest_topk_is_multibatch_and_serves_streamed_rows(spark):
    """ann_ingest_topk must run >=4 real micro-batches, its maintained
    index must equal the one-shot assignment of corpus + incoming
    against the same frozen centroids, and the served top-k must contain
    at least one neighbor that arrived via the stream (the integration
    the gate exists to prove)."""
    from pyspark.sql import functions as F

    from datafusion_tpch_spark.catalog import load_table
    from datafusion_tpch_spark.operators.similarity import ivf_assign
    from datafusion_tpch_spark.queries import all_queries
    from datafusion_tpch_spark.queries.stream import (
        _ANN_INGEST_STATE,
        _EMB_SPLIT,
        _ingest_trained_centroids,
    )

    specs = all_queries()
    got = specs["ann_ingest_topk"].build(spark, SF_DIR).collect()
    idx, n_batches, centroids = _ANN_INGEST_STATE[spark][SF_DIR]
    assert n_batches >= 4
    emb = load_table(spark, SF_DIR, "embeddings")
    want = ivf_assign(emb, _ingest_trained_centroids(spark, SF_DIR))
    assert sorted((r.vec_id, r.cell) for r in idx.collect()) == sorted(
        (r.vec_id, r.cell) for r in want.collect()
    )
    assert len(got) == 40  # 8 queries x dense top-5
    assert any(r["from_stream"] for r in got)
    assert all(
        r["from_stream"] == (r["cand_id"] >= _EMB_SPLIT) for r in got
    )
