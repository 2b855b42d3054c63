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
# correctness record.  Round 12 (per the round-11 verdict): the four
# round-12 additions first, then multimodal_phash_band_dedup (its output
# schema gained n_bands_live/saturated this round, so its r11 record is for
# the old shape), then the ENTIRE 37-gate cohort whose latest record is
# still r07 (the verdict's item 2), then the oldest of the r08 cohort up
# to the 50-key window.  Everything not listed keeps registration order
# after these.
_CHECK_FIRST = [
    # -- round-12 additions / schema-changed gates; new queries land HERE --
    "ann_persisted_index_topk", "ann_persisted_ingest_topk",
    "multimodal_exif_census", "multimodal_exif_gps_scrub",
    "multimodal_orientation_dedup",
    "docs_pipeline_yield_full", "multimodal_phash_band_dedup",
    # -- the 37 rotation-debt queries (latest record r07) --
    "docs_boilerplate_strip", "docs_chunk_dedup", "docs_decontaminate",
    "docs_length_quartiles", "docs_lm_score", "docs_mixture_sample",
    "docs_mixture_weights", "docs_pmi_bigrams", "docs_quality_filter",
    "docs_repetition", "embedding_centroids", "embeddings_gram",
    "events_anomaly", "events_asof_join", "events_dedup_stream",
    "events_funnel", "events_gapfill", "events_histogram",
    "events_hll_distinct", "events_moving_avg", "events_pii_scrub",
    "events_pivot", "events_range_join", "events_salted_enrich",
    "events_sliding_stream", "events_triangle_count",
    "events_user_retention", "info_schema_columns", "lang_id",
    "limit_scan", "multimodal_png_roundtrip", "orders_rollup",
    "tables_listing", "text_quality", "tfidf_top_terms", "token_topk",
    "top_docs_per_lang",
    # -- backfill: 6 oldest of the r08 cohort --
    "embeddings_knn_graph", "dedup_lsh_recall_audit",
    "embeddings_sq8_recall", "dedup_threshold_sweep", "lang_id_metrics",
    "dedup_simhash_hamming1",
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
