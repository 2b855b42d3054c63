"""Round-13 sweep: the NEXT decade (100x) for the funnel and the
persisted-index serves, plus 10x for the round-13 gates.  Same id-shift
protocol as tools/r10..r12_scale_sweep.py (warm best-of-2 per gate);
run AFTER pytest/bench are idle; check /proc/loadavg first.

Expectation notes:
- ann_persisted_index_topk serve measured ~FLAT at 10x (r12 sweep);
  the 100x run tests whether the static partition filter keeps the
  probed-cell read bounded for another decade (unprobed directories are
  never listed, so serve cost should track nprobe/k of the corpus).
- docs_pipeline_yield_full at 100x under the id-shift is a pathological
  corpus: EVERY doc has 100 near-identical copies, so every LSH bucket
  exceeds _LSH_MAX_BUCKET=50 and the near-dup stage's hot-cell stoplist
  drops ALL cells (the same honest refusal the audio dedup showed at 10x
  in the r11 sweep) — the ExactSubstr and decontamination stages still do
  real 100x work and are what the timing measures.
- dedup_persisted_lsh's corpus split is doc_id-based, so the id-shifted
  fixture scales the INCOMING batch 100x against the same stored index —
  exactly the crawl-ingest serve path (batch hashing linear, index
  semi-join constant).
- multimodal_exif_thumb_scrub is a per-blob kernel — expected ~linear.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from datafusion_tpch_spark.catalog import load_table  # noqa: E402
from datafusion_tpch_spark.queries import all_queries  # noqa: E402
from datafusion_tpch_spark.session import build_session  # noqa: E402
from tools.r10_scale_sweep import SRC, DST as DST10, build_fixture  # noqa: E402

DST100 = "/tmp/scale13_100x"


def build_fixture_100x(spark) -> None:
    if os.path.exists(DST100 + "/_DONE"):
        return
    shutil.rmtree(DST100, ignore_errors=True)
    os.makedirs(DST100, exist_ok=True)
    docs = load_table(spark, SRC, "documents")
    mx = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = spark.range(100).select(F.col("id").alias("copy"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(mx)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" copytok"), F.col("copy").cast("string")
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(32)
        .write.mode("overwrite").parquet(DST100 + "/documents.parquet")
    )
    emb = load_table(spark, SRC, "embeddings")
    emx = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(emx)).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        .repartition(32)
        .write.mode("overwrite").parquet(DST100 + "/embeddings.parquet")
    )
    open(DST100 + "/_DONE", "w").close()


def main() -> None:
    print("loadavg:", open("/proc/loadavg").read().strip())
    spark = build_session(
        "r13-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    build_fixture(spark)       # 10x (shared with r10-r12 sweeps)
    build_fixture_100x(spark)  # 100x
    qs = all_queries()
    for d in (DST10, DST100):
        for t in ("documents", "embeddings"):
            spark.read.parquet(f"{d}/{t}.parquet").count()  # warm file cache

    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/scale13_idx"
    shutil.rmtree("/tmp/scale13_idx", ignore_errors=True)

    scales = ((SRC, "1x"), (DST10, "10x"), (DST100, "100x"))

    # one-time index builds, timed separately (the amortized job)
    for name in ("ann_persisted_index_topk", "dedup_persisted_lsh",
                 "docs_pipeline_resumable"):
        for sf_dir, tag in scales:
            t0 = time.perf_counter()
            n = len(qs[name].build(spark, sf_dir).collect())
            print(f"{name} BUILD+first-serve @ {tag}: "
                  f"{time.perf_counter() - t0:.2f}s ({n} rows)", flush=True)

    batch = [
        "ann_persisted_index_topk",   # warm = serve-only (index on disk)
        "ann_persisted_ingest_topk",  # first run ingests, warm = serve
        "dedup_persisted_lsh",        # warm = admission from artifacts
        "docs_pipeline_resumable",    # warm = report from checkpoints
        "docs_pipeline_yield_full",   # the one-shot funnel, full recompute
        "multimodal_exif_thumb_scrub",
    ]
    for name in batch:
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
