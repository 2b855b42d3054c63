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
# correctness record: CORRECTNESS_r01+r02+r03 together cover 109 of the 164
# registered queries, so round 4 front-loads 50 of the 55 queries with no
# driver-side record yet.  The 5 deferred to round 5 are the ones with the
# closest already-green siblings (the CSV/JSON roundtrips mirror the parquet
# roundtrip, `multimodal_audio_energy` mirrors `multimodal_frame_sample`,
# `events_hll_stream`/`events_trending_stream` mirror `events_hll_distinct`/
# `events_sliding_stream`).  Everything not listed keeps registration order
# after these.
_CHECK_FIRST = [
    # -- round-3 continuation gates (recall/distortion audits, DSIR,
    # OLS/moments/chi-square, constraints, schema evolution, streaks,
    # stickiness, seasonality, HHI) --
    "dedup_lsh_recall_audit", "ann_recall_audit", "pq_distortion_audit",
    "dedup_threshold_sweep", "docs_dsir_score", "docs_pipeline_yield",
    "lineitem_price_model", "lineitem_profile_moments",
    "events_type_dow_chisq", "orders_constraints", "orders_schema_evolution",
    "events_longest_streak", "events_stickiness", "orders_seasonality",
    "supplier_hhi",
    # -- remaining never-driver-checked queries --
    "embeddings_knn_graph", "lang_id_metrics", "docs_bm25_topk",
    "dedup_simhash_hamming1", "events_multibatch_stream",
    "docs_containment", "docs_bpe_pairs", "docs_reservoir_sample",
    "events_ab_lift", "docs_negative_pairs", "events_feature_hash",
    "lineitem_grouping_sets", "events_path_ngrams", "events_interval_union",
    "orders_partitioned_prune", "lineitem_hist_quantile_sketch",
    "embeddings_top_eigvec", "lineitem_band_join", "events_late_audit",
    "embeddings_kmeans", "events_time_rollup", "events_user_bitmap",
    "events_communities", "orders_changelog_apply",
    "orders_lineitem_merge_join", "orders_lineitem_hash_join",
    "events_trailing_window", "events_train_test_split",
    "events_cooccurrence_lift", "events_corrupt_json_audit",
    "docs_cross_source_dups", "lineitem_late_dim", "part_impute_median",
    "lineitem_winsorize", "events_props_key_census",
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
        # a typo here would silently drop the query out of the driver's
        # first-50 gate window — the exact gap the rotation exists to close
        assert name in merged, f"_CHECK_FIRST entry {name!r} not in registry"
        out[name] = merged.pop(name)
    out.update(merged)
    return out
