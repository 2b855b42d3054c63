"""End-to-end training-data pipeline demo over the driver fixtures:
exact dedup → near-dup (MinHash-LSH, recall-audited vs the exact
baseline) → quality filter → decontamination → DSIR importance scoring
→ mixture resampling → sequence packing → yield funnel, each stage a
registered, oracle-checked operator from the query registry.

This is the composition story the individual gates verify piecewise:
every stage is a DataFrame → DataFrame plan (no driver materialization),
so the chain is itself one lazy pipeline a 100 TB run would execute
shard-parallel.

Run: python examples/pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session


STAGES = [
    ("dedup_exact", "exact duplicates collapsed to survivors"),
    ("dedup_minhash_lsh", "near-duplicate pairs via banded MinHash-LSH"),
    ("dedup_lsh_recall_audit", "LSH recall measured vs the exact baseline"),
    ("docs_quality_filter", "adaptive per-language quality threshold"),
    ("docs_decontaminate", "eval-set n-gram contamination flags"),
    ("docs_dsir_score", "DSIR importance weights toward the target domain"),
    ("docs_mixture_sample", "deterministic resample toward uniform mixture"),
    ("docs_token_pack", "concat-and-chunk training sequences"),
    ("docs_pipeline_yield", "funnel report: docs/tokens surviving each stage"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("pipeline-demo")
    specs = all_queries()
    for name, blurb in STAGES:
        df = specs[name].build(spark, sf_dir)
        n = df.count()
        print(f"{name:24s} {n:8d} rows   # {blurb}")
        df.show(3, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
