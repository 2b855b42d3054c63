"""Benchmark runner (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # no console progress bars: the driver parses the tail of combined
    # stdout+stderr, and \r-progress junk can push the JSON line out of it
    spark = build_session(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    specs = all_queries()

    # Warm-up: JVM + codegen on a trivial action, then one pass over every
    # fixture table so no query is charged for file listing, parquet footer
    # reads, or vectorized-reader init. Query timings below measure queries.
    from datafusion_tpch_spark.catalog import load_table

    spark.range(1).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    # best of 3 runs per query: one JVM, 32 threads and GC make single-shot
    # timings jitter 2-4x (a major GC can double any one run); the min is
    # the reproducible cost of the plan
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        best, n = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            n = len(df.collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # ONE compact JSON line: the driver records only the last ~4096 chars of
    # COMBINED stdout+stderr, so (a) stop Spark BEFORE printing so no JVM
    # shutdown chatter lands after the line, and (b) keep the line itself
    # well under the window — compact separators, and degrade timing
    # precision if the registry has grown enough to threaten the budget.
    spark.stop()

    def encode(ndigits: int) -> str:
        # values >= 10s degrade to whole seconds ("12" beats "12.3") and
        # clamp at 999 (3 chars — a query that truly takes 1000s+ at this
        # scale is a hang, and its exact magnitude matters less than
        # keeping the whole line inside the driver's recorded window);
        # the short metric label buys ~24 chars over the long form
        def fmt(v: float):
            if ndigits <= 1 and v >= 10:
                return min(round(v), 999)  # "12" beats "12.3"; cap 3 chars
            r = round(v, ndigits)
            return 0 if ndigits <= 1 and r == 0 else r  # "0" beats "0.0"

        return json.dumps(
            {
                "metric": "total query wall time",
                "value": round(total, 2) if ndigits <= 1 else total,
                "unit": "sec",
                "queries": {k: fmt(v) for k, v in timings.items()},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )

    line = encode(3)
    if len(line) > 3400:
        line = encode(2)
    if len(line) > 3400:
        line = encode(1)
    sys.stdout.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
