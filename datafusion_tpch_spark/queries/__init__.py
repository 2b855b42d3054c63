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
# correctness record: CORRECTNESS_r01..r04 together cover 159 of the 164
# pre-round-5 queries.  Round 5 front-loads the remaining 5, then the
# round-5 additions (driver record on first exposure), then re-confirms the
# plans rounds 4-5 rewrote plus the TPC-H core.  Everything not listed
# keeps registration order after these.
_CHECK_FIRST = [
    # -- round 5: the last 5 queries with no driver-side record yet
    # (after these, every registry entry has at least one green
    # CORRECTNESS_r0N record) --
    "orders_csv_roundtrip", "orders_json_roundtrip",
    "multimodal_audio_energy", "events_hll_stream",
    "events_trending_stream",
    # -- round-5 additions get driver records on first exposure;
    # new queries are inserted HERE as they land --
    # -- refill: re-confirm the plans round 4/5 rewrote (selection-module
    # gates, KMV k-min, skyline, ring index) plus the TPC-H core --
    "events_kmv_distinct", "events_kmv_setops", "events_rolling_kmv",
    "docs_negative_pairs", "part_skyline", "lineitem_winsorize",
    "part_impute_median", "events_value_quantiles", "docs_token_pack",
    "events_late_audit", "docs_reservoir_sample", "docs_stratified_sample",
    "customer_record_linkage", "events_concurrency", "dedup_semantic",
    "dedup_semantic_clusters", "ann_lsh_topk", "ann_ivf_pq_topk",
    "events_communities", "events_pagerank",
    "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10", "q11",
    "q12", "q13", "q14", "q15", "q16", "q17", "q18", "q19", "q20", "q21",
    "q22", "dedup_minhash_lsh", "dedup_exact", "text_stats",
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
