"""Query registry.

Every implemented operator/query is a :class:`QuerySpec`: a DataFrame
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
ANSI-SQL oracle string the driver runs through DuckDB.  Column names are
aliased identically on both sides — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


# The driver's per-round oracle gate checks the FIRST 50 registry keys only.
# Rotate this window across rounds so every query accumulates a driver-side
# correctness record.  Round 10 (per the round-9 verdict): the 15 round-10
# additions first (driver record on first exposure), then the 12 queries
# whose latest record is still r05, then the oldest of the 50-strong r06
# cohort.  The window takes the first 50 keys; r06 entries pushed past it
# by later round-10 additions (q15_spec onward) front the round-11
# backfill after its additions.  Everything not listed
# keeps registration order after these.
_CHECK_FIRST = [
    # -- round-10 additions; new queries are inserted HERE as they land --
    "multimodal_phash_dedup", "multimodal_video_frames",
    "multimodal_jpeg_dri_roundtrip", "embeddings_ingest_stream",
    "ann_filtered_topk", "multimodal_gif_anim_frames",
    "multimodal_jpeg_prog_roundtrip", "multimodal_wav_stereo_roundtrip",
    "multimodal_cross_codec_dedup", "multimodal_audio_fp_dedup",
    "docs_exact_substring_dedup", "docs_substring_ingest_stream",
    "multimodal_video_frame_dedup", "multimodal_scale_invariant_dedup",
    "multimodal_phash_recall_audit",
    # -- the 12 rotation-debt queries (latest record r05) --
    "events_kmv_setops", "events_late_audit", "events_rolling_kmv",
    "events_trending_stream", "events_value_quantiles", "lineitem_winsorize",
    "multimodal_audio_energy", "orders_csv_roundtrip", "orders_json_roundtrip",
    "part_impute_median", "part_skyline", "text_stats",
    # -- backfill: 33 oldest of the r06 cohort --
    "dedup_cluster_quality_elect", "dedup_incremental_lsh",
    "dedup_semantic_clusters", "docs_bm25_topk", "docs_cross_source_dups",
    "docs_pipeline_yield", "docs_token_budget", "events_cdc_merge",
    "events_cdc_stream", "events_communities", "events_distribution_drift",
    "events_enriched_stream", "events_hourly", "events_hourly_stream",
    "events_json_extract", "events_multibatch_stream", "events_pagerank",
    "events_rollup_cascade", "events_scd2_history", "events_scd2_stream",
    "events_session_stream", "events_sessionize", "events_stateful_sessions",
    "events_stream_stream_join", "multimodal_decode_roundtrip",
    "multimodal_pixel_stats", "multimodal_wav_roundtrip",
    "q10_spec", "q11_spec", "q12_spec", "q13_spec", "q14_spec", "q15_spec",
]


def all_queries() -> dict[str, QuerySpec]:
    """Merged registry across the TPC-H core and the extension operators."""
    from . import advanced, cleaning, curation, extensions, stream, tpch, tpch_spec

    merged: dict[str, QuerySpec] = {}
    for mod in (tpch, tpch_spec, extensions, stream, curation, advanced, cleaning):
        for spec in mod.SPECS:
            assert spec.name not in merged, f"duplicate query name {spec.name}"
            merged[spec.name] = spec
    out: dict[str, QuerySpec] = {}
    for name in _CHECK_FIRST:
        # a typo here would silently drop the query out of the driver's
        # first-50 gate window — the exact gap the rotation exists to close
        assert name in merged, f"_CHECK_FIRST entry {name!r} not in registry"
        out[name] = merged.pop(name)
    out.update(merged)
    return out
