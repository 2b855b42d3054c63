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
# correctness record.  Round 9 (per the round-8 verdict): new round-9 gates
# first (driver record on first exposure), then the 7 queries whose latest
# record is still r04 (supplier_hhi + the six the round-8 additions
# displaced), then re-confirms of the queries this round's code changes
# touched, then backfill by staleness (r05-cohort next).  Everything not
# listed keeps registration order after these.
_CHECK_FIRST = [
    # -- round-9 additions; new queries are inserted HERE as they land --
    "docs_bpe_encode", "docs_dedup_ingest_stream", "multimodal_jpeg_roundtrip",
    "multimodal_gif89a_roundtrip", "multimodal_jpeg420_roundtrip",
    "embeddings_drift", "docs_token_budget_bpe", "docs_token_meter_stream",
    # -- the 7 rotation-debt queries (latest record r04) --
    "supplier_hhi", "orders_lineitem_hash_join", "orders_lineitem_merge_join",
    "orders_partitioned_prune", "orders_schema_evolution",
    "orders_seasonality", "pq_distortion_audit",
    # -- backfill: the full r05 cohort (47 queries), oldest records next
    # in line.  Only the first 50 keys total are driver-checked; entries
    # pushed past the window by later round-9 additions above simply wait
    # for round 10 --
    "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10",
    "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18", "q19", "q20",
    "q21", "q22",
    "ann_ivf_pq_topk", "ann_lsh_topk", "customer_record_linkage",
    "dedup_exact", "dedup_minhash_lsh", "dedup_semantic",
    "docs_negative_pairs", "docs_reservoir_sample", "docs_stratified_sample",
    "docs_token_pack", "events_concurrency", "events_hll_stream",
    "events_kmv_distinct", "events_kmv_setops", "events_late_audit",
    "events_rolling_kmv", "events_trending_stream", "events_value_quantiles",
    "lineitem_winsorize", "multimodal_audio_energy", "orders_csv_roundtrip",
    "orders_json_roundtrip", "part_impute_median", "part_skyline",
    "text_stats",
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
