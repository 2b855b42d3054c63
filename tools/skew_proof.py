"""Adversarial-skew measurement for the fact-fact joins (SCALE_PROOF.md).

SCALE.md claims AQE's skew-split keeps orders ⋈ lineitem healthy when one
orderkey goes hot — the one join shape that can't broadcast.  This tool
MEASURES it instead of arguing it:

1. Generate orders + lineitem at sf1 with the repo's own generators
   (1.5M / ~6M rows), then redirect 10% of ALL lineitem rows onto a single
   hot orderkey — the adversarial shape (one reducer owns 600k join rows
   while the average partition holds ~190k).
2. Run the two fact-fact join gates' exact plans over the skewed tables,
   warm best-of-3, with AQE skew-join handling OFF vs ON.
3. Print wall times plus the plan evidence (`skew=true` markers and the
   post-split partition count).

Skew thresholds are scaled to the fixture: the hot partition here is tens
of MB, far under the 256 MB default that targets real clusters, so the
run lowers `skewedPartitionThresholdInBytes`/`advisoryPartitionSizeInBytes`
proportionally (at 100 TB the defaults trip on their own; the OPTIMIZATION
is identical, only the trigger constant is scale-relative).

Usage: python tools/skew_proof.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session

SF = 1.0
HOT_FRACTION = 10  # 1-in-N lineitem rows land on the hot key
DIR = "/tmp/spark_graft_skew_sf1"


def build_skewed_tables(spark) -> None:
    from datafusion_tpch_spark.sources.tpch_gen import GENERATORS

    if os.path.exists(os.path.join(DIR, "_DONE")):
        return
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR, exist_ok=True)
    GENERATORS["orders"](spark, SF).write.mode("overwrite").parquet(
        os.path.join(DIR, "orders.parquet")
    )
    li = GENERATORS["lineitem"](spark, SF)
    skewed = li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                   F.lit(HOT_FRACTION)) == 0,
            F.lit(1),
        ).otherwise(F.col("l_orderkey")),
    )
    skewed.write.mode("overwrite").parquet(os.path.join(DIR, "lineitem.parquet"))
    open(os.path.join(DIR, "_DONE"), "w").close()


def run_gate(spark, name: str, runs: int = 3) -> tuple[float, str]:
    spec = all_queries()[name]
    best = float("inf")
    df = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df = spec.build(spark, DIR)
        df.collect()
        best = min(best, time.perf_counter() - t0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return best, plan


def main() -> None:
    spark = build_session(
        "skew-proof",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # scale-relative skew triggers: the defaults target 256MB
            # cluster partitions, while the hot partition's lz4-compressed
            # map output here is only ~6MB (600k × 26B raw)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        },
    )
    build_skewed_tables(spark)
    # warm page cache so cold reads don't pollute the A/B
    for t in ("orders", "lineitem"):
        spark.read.parquet(os.path.join(DIR, f"{t}.parquet")).count()

    for gate in ("orders_lineitem_merge_join", "orders_lineitem_hash_join"):
        results = {}
        for skew_on in (False, True):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            wall, plan = run_gate(spark, gate)
            n_skew_marks = plan.count("skew=true")
            results[skew_on] = (wall, n_skew_marks)
            print(
                f"{gate} skewJoin={'on' if skew_on else 'off'}: "
                f"{wall:.2f}s  skew-split markers in final plan: {n_skew_marks}"
            )
        off, on = results[False][0], results[True][0]
        print(f"{gate}: off {off:.2f}s -> on {on:.2f}s "
              f"({off / on:.2f}x, splits={results[True][1]})\n")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    if "--keep" not in sys.argv:
        shutil.rmtree(DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
