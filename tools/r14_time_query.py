"""Time individual gates exactly the way bench.py does (build + collect,
best of N in one session, warm fixture cache), without paying for the other
249.  The `--noop` flag times the same plan through the noop sink instead
(guide §1.4) to separate computation from collect/driver transfer.

Usage: python tools/r14_time_query.py [--noop] [--runs N] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        "r14-time", extra_conf={"spark.ui.showConsoleProgress": "false"})
    specs = all_queries()

    from datafusion_tpch_spark.catalog import load_table

    spark.range(1).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    for name in names:
        spec = specs[name]
        best, vals = float("inf"), []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"r14-time: {name}")
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = len(df.collect())
            dt = time.perf_counter() - t0
            vals.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: best={best:.3f}s runs={vals} rows={n}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
