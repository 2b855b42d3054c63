"""Capture `.explain("formatted")` snapshots for the round-14 optimization
evidence trail (`plans/r14/<query>_<tag>.txt`).

Usage: python tools/r14_plan_capture.py <tag> <query> [query ...]

Writes one file per query with the formatted physical plan of the built
DataFrame (post-AQE initial plan; the audit in PLANS.md covers the
finalized shapes).  Streaming gates are captured too — their build()
returns the batch DataFrame read back from the sink, whose plan is the
serve-side shape the optimization round cares about.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r14")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("r14-plan-capture")
    specs = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spec = specs[name]
        df = spec.build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(f"# {name} — explain(formatted) @ {sf_dir} [{tag}]\n\n")
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
