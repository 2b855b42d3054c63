"""Round-14 sweep: saturation-fallback recall for the funnel's near-dup
stage, plus decades (1x/10x/100x) for the round-14 gates.  Same id-shift
protocol as tools/r10..r13_scale_sweep.py (warm best-of-2 per gate); run
AFTER pytest/bench are idle; check /proc/loadavg first.

The headline measurement: at 100x under the id-shift EVERY doc has 100
near-identical copies, so every LSH bucket exceeds _LSH_MAX_BUCKET=50.
Round 13's stoplist dropped ALL those buckets — near-dedup silently
became a no-op with only a saturation flag.  Round 14 degrades over-cap
buckets to deterministic representative sampling (hash-rank top-cap per
bucket, ``queries/curation._capped_lsh_membership``), so the stage still
filters with bounded recall.  This sweep MEASURES that recall against
the uncapped ground truth (tractable at this scale: ~100-member buckets
-> <=1e4 pairs each) across a cap ladder, and proves the pipeline's
near-dup stage now removes documents at saturation.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from datafusion_tpch_spark.catalog import load_table  # noqa: E402
from datafusion_tpch_spark.functions import text  # noqa: E402
from datafusion_tpch_spark.queries import all_queries  # noqa: E402
from datafusion_tpch_spark.session import build_session  # noqa: E402
from tools.r10_scale_sweep import SRC, DST as DST10, build_fixture  # noqa: E402
from tools.r13_scale_sweep import DST100, build_fixture_100x  # noqa: E402


def _stage2_ids(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fpw = Window.partitionBy("fp")
    return (
        docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))
        .withColumn("m", F.min("doc_id").over(fpw))
        .filter(F.col("doc_id") == F.col("m"))
        .select("doc_id")
    )


def _drops(bk):
    return (
        bk.alias("a")
        .join(
            bk.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )


def measure_fallback_recall(spark, sf_dir) -> None:
    """Sampled-representative near-dedup drops vs the uncapped ground
    truth, across a cap ladder.  Sampled drops are a SUBSET of uncapped
    drops (representative pairs are a subset of all pairs), so recall =
    |sampled| / |uncapped|."""
    from datafusion_tpch_spark.queries import curation as cu
    from datafusion_tpch_spark.queries import extensions as ext
    from datafusion_tpch_spark.queries.extensions import _lsh_buckets_raw

    s2 = _stage2_ids(spark, sf_dir).cache()
    bk_all = _lsh_buckets_raw(spark, sf_dir).join(s2, "doc_id").cache()
    n_s2 = s2.count()
    t0 = time.perf_counter()
    n_ideal = _drops(bk_all).count()
    t_ideal = time.perf_counter() - t0
    print(f"uncapped ground truth: {n_ideal} drops of {n_s2} stage-2 "
          f"survivors ({t_ideal:.2f}s)", flush=True)
    cap0 = ext._LSH_MAX_BUCKET
    try:
        for cap in (10, 25, cap0, 100):
            t0 = time.perf_counter()
            ext._LSH_MAX_BUCKET = cap
            n_cap = _drops(cu._capped_lsh_membership(bk_all)).count()
            recall = n_cap / n_ideal if n_ideal else float("nan")
            print(f"neardup fallback @100x cap={cap}: recall={recall:.3f} "
                  f"({n_cap}/{n_ideal} drops, "
                  f"{time.perf_counter() - t0:.2f}s)", flush=True)
    finally:
        ext._LSH_MAX_BUCKET = cap0
    bk_all.unpersist()
    s2.unpersist()


def main() -> None:
    print("loadavg:", open("/proc/loadavg").read().strip())
    spark = build_session(
        "r14-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    build_fixture(spark)       # 10x
    build_fixture_100x(spark)  # 100x
    qs = all_queries()
    for d in (DST10, DST100):
        for t in ("documents", "embeddings"):
            spark.read.parquet(f"{d}/{t}.parquet").count()  # warm file cache

    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/scale14_idx"
    shutil.rmtree("/tmp/scale14_idx", ignore_errors=True)

    # 1. saturation-fallback recall at 100x (the round's headline proof)
    measure_fallback_recall(spark, DST100)

    # 2. the funnel at 100x: near-dedup must now FILTER at saturation
    t0 = time.perf_counter()
    rows = qs["docs_pipeline_yield_full"].build(spark, DST100).collect()
    dt = time.perf_counter() - t0
    by = {r.stage: r.n_docs for r in rows}
    print(f"docs_pipeline_yield_full @100x: {dt:.2f}s, stages={by}",
          flush=True)
    assert by["near_dedup"] < by["exact_dedup"], (
        "near-dedup stage must remove documents at saturation"
    )
    print(f"near_dedup removed {by['exact_dedup'] - by['near_dedup']} docs "
          f"at saturation (was 0 under the r13 drop-all stoplist)",
          flush=True)

    # 3. decades for the round-14 gates
    scales = ((SRC, "1x"), (DST10, "10x"), (DST100, "100x"))
    for name in ("ann_pq_persisted_topk", "embeddings_drift_retrain",
                 "multimodal_exif_full_scrub"):
        for sf_dir, tag in scales:
            best, n = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = len(qs[name].build(spark, sf_dir).collect())
                best = min(best, time.perf_counter() - t0)
            print(f"{name} @ {tag}: {best:.2f}s ({n} rows)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
