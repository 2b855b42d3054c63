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
# correctness record.  Round 11 (per the round-10 verdict): the round-11
# additions and the gates materially rebuilt this round (the trained-IVF
# ANN family) first, then ALL 27 queries whose latest record is still r06
# (the 22 q*_spec + q15_window + events_stream_stream_join + 3 multimodal
# round-trips — the backfill the round-10 comment promised), then the
# oldest of the r07 cohort up to the 50-key window.  Everything not listed
# keeps registration order after these.
_CHECK_FIRST = [
    # -- round-11 additions / rebuilt gates; new queries land HERE --
    "multimodal_video_clip_dedup", "multimodal_video_clip_recall_audit",
    "ann_ingest_topk", "ann_ivf_pq_refine_topk",
    "multimodal_phash_band_dedup", "multimodal_audio_clip_dedup",
    "ann_ivf_topk", "ann_ivf_pq_topk", "ann_recall_audit",
    "ann_lsh_topk", "ann_filtered_topk",
    # -- the 27 rotation-debt queries (latest record r06) --
    "q1_spec", "q2_spec", "q3_spec", "q4_spec", "q5_spec", "q6_spec",
    "q7_spec", "q8_spec", "q9_spec", "q10_spec", "q11_spec", "q12_spec",
    "q13_spec", "q14_spec", "q15_spec", "q16_spec", "q17_spec", "q18_spec",
    "q19_spec", "q20_spec", "q21_spec", "q22_spec",
    "q15_window", "events_stream_stream_join", "multimodal_decode_roundtrip",
    "multimodal_pixel_stats", "multimodal_wav_roundtrip",
    # -- backfill: 12 oldest of the r07 cohort --
    "ann_bruteforce_topk", "ann_pq_topk", "customer_orders_bucketed",
    "customer_orders_full_outer", "customer_set_ops", "customer_window_suite",
    "dedup_canonical", "dedup_embedding_cosine", "dedup_incremental",
    "dedup_ngram_jaccard", "dedup_simhash", "doc_winnow",
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
