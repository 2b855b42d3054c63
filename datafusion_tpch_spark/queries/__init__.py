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
# correctness record.  Round 13 (per the round-12 verdict): the two
# round-13 additions first, then the ENTIRE 43-gate cohort whose latest
# record is still r08 (the verdict's item 2), then the alphabetically
# first of the r09 cohort (48 gates) up to the 50-key window; the r09
# remainder fronts round 14.  Everything not listed keeps registration
# order after these.
_CHECK_FIRST = [
    # -- round-13 additions; new queries land HERE --
    "dedup_persisted_lsh", "docs_pipeline_resumable",
    "multimodal_exif_thumb_scrub", "dedup_persisted_ingest_stream",
    "docs_bpe_persisted_encode", "dedup_persisted_compact",
    "ann_persisted_compact",
    # -- the 43 rotation-debt queries (latest record r08) --
    "docs_bpe_pairs", "docs_containment", "docs_dsir_score",
    "embeddings_kmeans", "embeddings_top_eigvec", "events_ab_lift",
    "events_cooccurrence_lift", "events_corrupt_json_audit",
    "events_ewma_daily", "events_feature_hash", "events_interval_union",
    "events_longest_streak", "events_path_ngrams",
    "events_props_key_census", "events_stickiness", "events_time_rollup",
    "events_trailing_window", "events_train_test_split",
    "events_type_dow_chisq", "events_user_bitmap", "lineitem_band_join",
    "lineitem_bloom_semi", "lineitem_delta_agg", "lineitem_grouping_sets",
    "lineitem_hist_quantile_sketch", "lineitem_late_dim",
    "lineitem_pit_supplier", "lineitem_price_model",
    "lineitem_profile_moments", "lineitem_running_total",
    "lineitem_zorder", "multimodal_frame_sample",
    "multimodal_gif_roundtrip", "multimodal_png16_roundtrip",
    "multimodal_png_adam7_roundtrip", "multimodal_png_palette_roundtrip",
    "orders_changelog", "orders_changelog_apply", "orders_constraints",
    "orders_cube", "orders_merge_upsert", "supplier_scd2",
    "token_cms_topk",
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
