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
# correctness record: CORRECTNESS_r01+r02 together cover 59 of the current
# registry, so round 3 front-loads exactly the queries with no driver-side
# record yet (the round-2/3 additions — events/streaming/multimodal, OLAP
# surface, curation, graph/zorder/SCD2 gates).  Remaining slots go to the
# heaviest previously-green queries so regressions there stay visible.
# Everything not listed keeps registration order after these.
_CHECK_FIRST = [
    # -- new this round (no driver-side record yet) --
    "orders_changelog", "events_triangle_count", "part_skyline",
    "docs_chunk_dedup", "customer_record_linkage", "events_hll_distinct",
    "embeddings_gram", "customer_orders_bucketed",
    "events_stateful_sessions", "token_cms_topk", "events_rolling_kmv",
    "customer_window_suite", "lineitem_running_total",
    # -- never driver-checked (rounds 1-2 windows predate them) --
    "multimodal_frame_sample",
    "events_pivot", "events_moving_avg", "events_asof_join",
    "events_range_join", "events_salted_enrich", "events_user_retention",
    "events_kmv_setops",
    "events_funnel", "events_gapfill", "events_histogram",
    "events_anomaly", "events_concurrency", "events_pagerank",
    "events_pii_scrub",
    "customer_orders_full_outer", "orders_cube", "orders_merge_upsert",
    "lineitem_bloom_semi", "lineitem_delta_agg", "lineitem_pit_supplier",
    "lineitem_zorder", "supplier_scd2",
    "dedup_canonical", "ann_pq_topk",
    "docs_pmi_bigrams", "docs_lm_score", "docs_decontaminate",
    "docs_token_pack", "docs_boilerplate_strip", "docs_repetition",
    "docs_mixture_weights", "docs_mixture_sample",
    "events_sliding_stream",
    "events_dedup_stream", "events_stream_stream_join",
    # -- round-3 addition in the last slot (every other window entry is
    # also unchecked; the rest of the round-3 additions — including the
    # 21 continuation gates (DSIR, recall/distortion audits, OLS/moments/
    # chi-square, constraint suite, schema evolution, streaks, stickiness,
    # ...) — queue for the round-4 rotation) --
    "ann_ivf_pq_topk",
]


def all_queries() -> dict[str, QuerySpec]:
    """Merged registry across the TPC-H core and the extension operators."""
    from . import advanced, cleaning, curation, extensions, stream, tpch

    merged: dict[str, QuerySpec] = {}
    for mod in (tpch, extensions, stream, curation, advanced, cleaning):
        for spec in mod.SPECS:
            assert spec.name not in merged, f"duplicate query name {spec.name}"
            merged[spec.name] = spec
    out: dict[str, QuerySpec] = {}
    for name in _CHECK_FIRST:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    return out
