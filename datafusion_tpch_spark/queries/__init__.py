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
# correctness record: round 3 front-loads the events/streaming/multimodal
# family (never inside the window in rounds 1-2) plus the TPC-H core.
# Everything not listed keeps registration order after these.
_CHECK_FIRST = [
    "multimodal_pixel_stats", "events_hourly", "events_sessionize",
    "events_json_extract", "events_pivot", "events_moving_avg",
    "customer_orders_full_outer", "events_asof_join", "events_range_join",
    "events_salted_enrich", "events_user_retention", "events_kmv_distinct",
    "events_value_quantiles", "events_funnel", "orders_cube",
    "events_gapfill", "events_histogram", "lineitem_bloom_semi",
    "orders_merge_upsert", "dedup_canonical", "docs_pmi_bigrams",
    "events_kmv_setops", "multimodal_frame_sample", "events_hourly_stream",
    "events_session_stream", "events_enriched_stream",
    "events_sliding_stream", "events_dedup_stream",
] + [f"q{i}" for i in range(1, 23)]


def all_queries() -> dict[str, QuerySpec]:
    """Merged registry across the TPC-H core and the extension operators."""
    from . import curation, extensions, stream, tpch

    merged: dict[str, QuerySpec] = {}
    for mod in (tpch, extensions, stream, curation):
        for spec in mod.SPECS:
            assert spec.name not in merged, f"duplicate query name {spec.name}"
            merged[spec.name] = spec
    out: dict[str, QuerySpec] = {}
    for name in _CHECK_FIRST:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    return out
