"""Round-13 addendum sweep: the three gates added after the main r13
sweep ran — the durable admission stream, its compaction job, and the
persisted BPE tokenizer — at 1x/10x/100x on the same cached fixtures.

Expectation notes:
- dedup_persisted_ingest_stream's first run builds + streams (timed
  separately); warm serve reads the verdict parquet — expected ~flat.
- dedup_persisted_compact re-runs the bin-pack + admission serve each
  time (the OPTIMIZE job itself is what's being measured).
- docs_bpe_persisted_encode warm = explode + join vs stored vocab —
  the corpus-linear term with the Zipf-bounded join side.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from datafusion_tpch_spark.queries import all_queries  # noqa: E402
from datafusion_tpch_spark.session import build_session  # noqa: E402
from tools.r10_scale_sweep import SRC, DST as DST10, build_fixture  # noqa: E402
from tools.r13_scale_sweep import DST100, build_fixture_100x  # noqa: E402


def main() -> None:
    print("loadavg:", open("/proc/loadavg").read().strip())
    spark = build_session(
        "r13b-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    build_fixture(spark)
    build_fixture_100x(spark)
    qs = all_queries()
    for d in (DST10, DST100):
        spark.read.parquet(f"{d}/documents.parquet").count()

    os.environ["SPARK_GRAFT_INDEX_DIR"] = "/tmp/scale13b_idx"
    shutil.rmtree("/tmp/scale13b_idx", ignore_errors=True)

    scales = ((SRC, "1x"), (DST10, "10x"), (DST100, "100x"))

    for name in ("dedup_persisted_ingest_stream", "docs_bpe_persisted_encode"):
        for sf_dir, tag in scales:
            t0 = time.perf_counter()
            n = len(qs[name].build(spark, sf_dir).collect())
            print(f"{name} BUILD+first-serve @ {tag}: "
                  f"{time.perf_counter() - t0:.2f}s ({n} rows)", flush=True)

    for name in ("dedup_persisted_ingest_stream", "dedup_persisted_compact",
                 "docs_bpe_persisted_encode"):
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
