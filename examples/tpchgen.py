"""Generate the TPC-H dataset and query it — the Spark re-expression of
/root/reference/examples/tpchgen.rs.

The reference calls the bulk `tpch(1.0)` UDTF (which registers all 8
tables as a planning side effect) and then `SELECT * FROM <t> LIMIT 5`
per table.  Same surface here, explicit and lazy.

Run: python examples/tpchgen.py [sf]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.session import build_session
from datafusion_tpch_spark.sources.tpch_gen import register_tpch


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    spark = build_session("tpchgen-example")

    # SELECT * FROM tpch(sf): registers the 8 tables, returns the listing
    listing = register_tpch(spark, sf)
    listing.show()

    for (table,) in listing.collect():
        print(f"-- {table} --")
        spark.sql(f"SELECT * FROM {table} LIMIT 5").show(truncate=12)


if __name__ == "__main__":
    main()
