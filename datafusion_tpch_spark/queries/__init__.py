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
# correctness record.  Round 8 (per the round-7 verdict): new round-8 gates
# first (driver record on first exposure), then the last 11 r03-cohort
# queries, then backfill from the 40-query r04 cohort.  Any r04 queries
# displaced by round-8 additions (the window is exactly 50) rotate in
# round 9.  Everything not listed keeps registration order after these.
_CHECK_FIRST = [
    # -- round-8 additions; new queries are inserted HERE as they land --
    "embeddings_sq8_recall", "multimodal_png_palette_roundtrip",
    "multimodal_png16_roundtrip", "events_ewma_daily",
    "multimodal_png_adam7_roundtrip", "multimodal_gif_roundtrip",
    # -- last of the r03 cohort --
    "lineitem_bloom_semi", "lineitem_delta_agg", "lineitem_pit_supplier",
    "lineitem_running_total", "lineitem_zorder", "multimodal_frame_sample",
    "orders_changelog", "orders_cube", "orders_merge_upsert",
    "supplier_scd2", "token_cms_topk",
    # -- backfill from the r04 cohort.  The driver checks the FIRST 50
    # registry keys only, and the 6 round-8 additions above push the
    # LAST SIX entries below (orders_lineitem_hash_join,
    # orders_lineitem_merge_join, orders_partitioned_prune,
    # orders_schema_evolution, orders_seasonality, pq_distortion_audit)
    # past the window: they and supplier_hhi still carry r04 records and
    # MUST front-load round 9 --
    "ann_recall_audit", "dedup_lsh_recall_audit", "dedup_simhash_hamming1",
    "dedup_threshold_sweep", "docs_bpe_pairs", "docs_containment",
    "docs_dsir_score", "embeddings_kmeans", "embeddings_knn_graph",
    "embeddings_top_eigvec", "events_ab_lift", "events_cooccurrence_lift",
    "events_corrupt_json_audit", "events_feature_hash",
    "events_interval_union", "events_longest_streak", "events_path_ngrams",
    "events_props_key_census", "events_stickiness", "events_time_rollup",
    "events_trailing_window", "events_train_test_split",
    "events_type_dow_chisq", "events_user_bitmap", "lang_id_metrics",
    "lineitem_band_join", "lineitem_grouping_sets",
    "lineitem_hist_quantile_sketch", "lineitem_late_dim",
    "lineitem_price_model", "lineitem_profile_moments",
    "orders_changelog_apply", "orders_constraints",
    "orders_lineitem_hash_join", "orders_lineitem_merge_join",
    "orders_partitioned_prune", "orders_schema_evolution",
    "orders_seasonality", "pq_distortion_audit",
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
