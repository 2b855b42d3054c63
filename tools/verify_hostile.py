"""Driver-conditions robustness check: run the full oracle gate from a
VANILLA SparkSession (not build_session) pinned to a hostile session
timezone.  The driver builds its own session, so nothing in the query
layer may depend on build_session's defaults (UTC pinning, shuffle
width, AQE flags) — every gate must pin what it needs.

Usage: python tools/verify_hostile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_tpch_spark import FIXTURE_TABLES
    from datafusion_tpch_spark.queries import all_queries
    from tools.verify_oracle import compare

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            sdf = spec.build(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        status = compare(sdf, odf)
        if status:
            print(f"FAIL {name}: {status}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
