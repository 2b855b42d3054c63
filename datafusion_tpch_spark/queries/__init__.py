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
# correctness record: by round 5's record every pre-existing query has at
# least one green CORRECTNESS_r0N row.  Round 6 front-loads its additions
# (driver record on first exposure), then re-records every query whose
# plan round 6 rewrote (bm25/q15_window limit-then-rank, CC-loop and
# pagerank checkpoint changes, the streaming sink-reuse path), then the
# 7 queries whose latest record dated back to r01, then the TPC-H core.
# Everything not listed keeps registration order after these.
_CHECK_FIRST = [
    # -- round-6 additions: spec-typed canonical TPC-H gates + real decode;
    # new queries are inserted HERE as they land --
    "events_cdc_stream", "events_scd2_stream", "multimodal_wav_roundtrip",
    "dedup_incremental_lsh", "events_distribution_drift",
    "events_cdc_merge", "events_scd2_history", "events_rollup_cascade",
    "q3_spec", "q12_spec",
    "q5_spec", "q7_spec", "q10_spec", "q14_spec", "q19_spec", "q21_spec",
    "q2_spec", "q8_spec", "q9_spec", "q11_spec", "q13_spec", "q15_spec",
    "q16_spec", "q17_spec", "q20_spec", "q22_spec",
    "q1_spec", "q4_spec", "q6_spec", "q18_spec", "multimodal_decode_roundtrip",
    "docs_token_budget", "dedup_cluster_quality_elect",
    # -- plans rewritten in round 6 --
    "docs_bm25_topk", "q15_window", "docs_pipeline_yield",
    "dedup_semantic_clusters", "events_pagerank", "events_communities",
    "docs_cross_source_dups",
    "events_stream_stream_join", "events_stateful_sessions",
    "events_multibatch_stream",
    # events_sliding_stream / events_dedup_stream / events_hll_stream /
    # events_trending_stream share the sink-reuse path re-recorded by the
    # three gates above plus the three stale streaming gates below, and
    # hold green r04/r05 records — they yield their window slots so every
    # round-6 addition AND all 7 stale-since-r01 queries fit in the first 50
    # -- stalest driver records (latest = r01) --
    "multimodal_pixel_stats", "events_hourly", "events_sessionize",
    "events_json_extract", "events_hourly_stream", "events_session_stream",
    "events_enriched_stream",
    # -- refill: the TPC-H core + long-standing representatives --
    "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10", "q11",
    "q12", "q13", "q14", "q15", "q16", "q17", "q18", "q19", "q20", "q21",
    "q22",
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
