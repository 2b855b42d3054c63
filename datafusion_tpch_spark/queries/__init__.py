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
# correctness record.  Round 7 (per the round-6 verdict): new round-7 gates
# first (driver record on first exposure), then the 20 queries whose latest
# record dated to r02, then 29 of the 40-query r03 cohort.  The remaining
# 11 r03 queries (lineitem_bloom_semi, lineitem_delta_agg,
# lineitem_pit_supplier, lineitem_running_total, lineitem_zorder,
# multimodal_frame_sample, orders_changelog, orders_cube,
# orders_merge_upsert, supplier_scd2, token_cms_topk) rotate in round 8.
# Everything not listed keeps registration order after these.
_CHECK_FIRST = [
    # -- round-7 additions; new queries are inserted HERE as they land --
    "multimodal_png_roundtrip",
    # -- stalest driver records (latest = r02) --
    "ann_bruteforce_topk", "ann_ivf_topk", "customer_set_ops",
    "dedup_embedding_cosine", "dedup_incremental", "dedup_ngram_jaccard",
    "dedup_simhash", "doc_winnow", "docs_length_quartiles",
    "docs_quality_filter", "embedding_centroids", "info_schema_columns",
    "lang_id", "limit_scan", "orders_rollup", "tables_listing",
    "text_quality", "tfidf_top_terms", "token_topk", "top_docs_per_lang",
    # -- backfill from the r03 cohort (29 of 40) --
    "ann_pq_topk", "customer_orders_bucketed", "customer_orders_full_outer",
    "customer_window_suite", "dedup_canonical", "docs_boilerplate_strip",
    "docs_chunk_dedup", "docs_decontaminate", "docs_lm_score",
    "docs_mixture_sample", "docs_mixture_weights", "docs_pmi_bigrams",
    "docs_repetition", "embeddings_gram", "events_anomaly",
    "events_asof_join", "events_dedup_stream", "events_funnel",
    "events_gapfill", "events_histogram", "events_hll_distinct",
    "events_moving_avg", "events_pii_scrub", "events_pivot",
    "events_range_join", "events_salted_enrich", "events_sliding_stream",
    "events_triangle_count", "events_user_retention",
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
