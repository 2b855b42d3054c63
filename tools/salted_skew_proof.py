"""Salted-join skew measurement for SCALE_PROOF.md (round 11).

`events_salted_enrich` wires operators/skew.salted_join into a live gate,
and tools/skew_proof.py measures AQE's skew-split on the fact-fact joins —
but the SALTING path itself had no measured row.  This tool measures it on
the adversarial shape salting exists for: one hot key owning ~20% of the
fact table in a join whose small side is NOT broadcastable (simulated by
disabling broadcast — at 100 TB the per-key profile dimension is itself
fact-scale) and where AQE's skew splitting is unavailable (disabled here;
AQE cannot split a skewed partition when the join sits below an
aggregation that reuses the same hash partitioning, and pre-AQE engines
lack it entirely).

1. Replicate the sf0.1 events fixture 500x (50M rows) and redirect ~20%
   of ALL rows onto user_id=1; write a per-user profile dimension.
2. Run the enrich join (join on user_id -> per-user aggregate) three
   ways, warm best-of-3: UNSALTED (AQE skew off), SALTED 8-way
   (operators/skew.salted_join, AQE skew off), and UNSALTED with AQE
   skew splitting ON (context row: the first line of defense, when it
   applies).
3. Assert all three variants return identical aggregates, print wall
   times + the straggler evidence (max/mean post-shuffle partition rows).

Usage: python tools/salted_skew_proof.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_tpch_spark.operators.skew import salted_join
from datafusion_tpch_spark.session import build_session

SRC = "/root/testdata/sf0.1"
DIR = "/tmp/spark_graft_skew_events"
REP = 500          # 100k fixture rows -> 50M
HOT_FRACTION = 5   # 1-in-5 rows land on the hot user (~20%)
SALT_N = 8


def build_fixture(spark) -> None:
    if os.path.exists(os.path.join(DIR, "_DONE")):
        return
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR, exist_ok=True)
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    mx = ev.agg(F.max("event_id")).collect()[0][0] + 1
    big = (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(mx))
        .drop("rep")
        .withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(HOT_FRACTION)) == 0,
                F.lit(1),
            ).otherwise(F.col("user_id")),
        )
        .select("event_id", "user_id", "value")
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DIR, "events_big.parquet")
    )
    (
        spark.read.parquet(os.path.join(DIR, "events_big.parquet"))
        .groupBy("user_id")
        .agg(F.avg("value").alias("user_avg"))
        .write.mode("overwrite")
        .parquet(os.path.join(DIR, "user_dim.parquet"))
    )
    open(os.path.join(DIR, "_DONE"), "w").close()


def enrich(big, dim, salted: bool):
    joined = (
        salted_join(big, dim, on=["user_id"], salt_n=SALT_N,
                    big_salt_col="event_id")
        if salted
        else big.join(dim, "user_id")
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") > F.col("user_avg"), 1)
                  .otherwise(0)).alias("n_above"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(5)
    )


def run(spark, big, dim, salted: bool, aqe_skew: bool, runs: int = 3):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    if aqe_skew:  # fixture-scaled trigger constants (see tools/skew_proof.py)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    best, rows = float("inf"), None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = enrich(big, dim, salted).collect()
        best = min(best, time.perf_counter() - t0)
    return best, rows


def main() -> None:
    print("loadavg:", open("/proc/loadavg").read().strip())
    spark = build_session(
        "salted-skew",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the small side must NOT broadcast: the scenario salting
            # exists for is a non-broadcastable dimension
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    build_fixture(spark)
    big = spark.read.parquet(os.path.join(DIR, "events_big.parquet"))
    dim = spark.read.parquet(os.path.join(DIR, "user_dim.parquet"))
    big.count()  # warm file cache
    n_hot = big.filter(F.col("user_id") == 1).count()
    n_all = big.count()
    print(f"fixture: {n_all} rows, hot user owns {n_hot} ({n_hot / n_all:.1%})")

    t_plain, r_plain = run(spark, big, dim, salted=False, aqe_skew=False)
    t_salt, r_salt = run(spark, big, dim, salted=True, aqe_skew=False)
    t_aqe, r_aqe = run(spark, big, dim, salted=False, aqe_skew=True)
    assert r_plain == r_salt == r_aqe, "variants disagree"
    # the straggler evidence below must measure the UNMITIGATED shapes:
    # undo the AQE-variant's runtime confs before probing partition sizes
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    print(f"unsalted (AQE skew off): {t_plain:.2f}s")
    print(f"salted {SALT_N}-way      : {t_salt:.2f}s  "
          f"({t_plain / t_salt:.2f}x)")
    print(f"unsalted (AQE skew on) : {t_aqe:.2f}s  "
          f"({t_plain / t_aqe:.2f}x)")

    # straggler evidence: rows per post-shuffle join partition
    for tag, salted in (("unsalted", False), ("salted", True)):
        joined = (
            salted_join(big, dim, on=["user_id"], salt_n=SALT_N,
                        big_salt_col="event_id")
            if salted else big.join(dim, "user_id")
        )
        sizes = (
            joined.withColumn("p", F.spark_partition_id())
            .groupBy("p").count().agg(
                F.max("count").alias("mx"), F.avg("count").alias("mean"))
            .collect()[0]
        )
        print(f"{tag}: max partition {sizes['mx']} rows, "
              f"mean {sizes['mean']:.0f} (ratio {sizes['mx'] / sizes['mean']:.1f}x)")

    if "--keep" not in sys.argv:
        shutil.rmtree(DIR, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
