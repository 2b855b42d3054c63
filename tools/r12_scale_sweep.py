"""Round-12 gates at 10x: same id-shifted /tmp fixture and measurement
protocol as tools/r10_scale_sweep.py / r11_scale_sweep.py (warm best-of-2
per gate).  Run AFTER pytest/bench are idle; check /proc/loadavg first.

Expectation notes:
- ann_persisted_index_topk's FIRST build at each scale writes the parquet
  index (train + assign + write); the warm best-of-2 then measures the
  SERVE path — probed-cell partition-pruned scans, which should scale with
  nprobe/k of the corpus like the in-session IVF gate.  The build time is
  printed separately (it is the one-time index job a production pipeline
  amortizes).
- multimodal_exif_census / _gps_scrub are per-blob kernels with tiny
  shuffle payloads — expected ~linear in doc count (pure scan-side work).
- docs_pipeline_yield_full chains six stages whose shuffles key on
  content-derived values (fingerprints, band buckets, span hashes) —
  watch the near-dup and ExactSubstr stages at 10x duplication density:
  the bucket cap and span-hash aggregation are what keep them bounded.
- multimodal_phash_band_dedup re-measured: its schema gained
  n_bands_live/saturated this round (one extra small aggregate over the
  band table that already existed — expected ~noise).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from datafusion_tpch_spark.queries import all_queries  # noqa: E402
from datafusion_tpch_spark.session import build_session  # noqa: E402
from tools.r10_scale_sweep import SRC, DST, build_fixture  # noqa: E402


def main() -> None:
    print("loadavg:", open("/proc/loadavg").read().strip())
    spark = build_session(
        "r12-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    build_fixture(spark)
    qs = all_queries()
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{DST}/{t}.parquet").count()  # warm file cache

    # persisted index: time the one-time BUILD per scale separately, then
    # let the warm best-of-2 below measure pure serve
    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/scale12_ann_index"
    import shutil

    shutil.rmtree("/tmp/scale12_ann_index", ignore_errors=True)
    for sf_dir, tag in ((SRC, "1x"), (DST, "10x")):
        t0 = time.perf_counter()
        n = len(qs["ann_persisted_index_topk"].build(spark, sf_dir).collect())
        print(
            f"ann_persisted_index BUILD+serve @ {tag}: "
            f"{time.perf_counter() - t0:.2f}s ({n} rows)",
            flush=True,
        )

    batch = [
        "ann_persisted_index_topk",      # warm = serve-only (index on disk)
        "ann_persisted_ingest_topk",     # first run ingests, warm = serve
        "multimodal_exif_census",
        "multimodal_exif_gps_scrub",
        "multimodal_orientation_dedup",
        "docs_pipeline_yield_full",
        "multimodal_phash_band_dedup",   # schema-extended this round
    ]
    for name in batch:
        for sf_dir, tag in ((SRC, "1x"), (DST, "10x")):
            best, n = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = len(qs[name].build(spark, sf_dir).collect())
                best = min(best, time.perf_counter() - t0)
            print(f"{name} @ {tag}: {best:.2f}s ({n} rows)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
