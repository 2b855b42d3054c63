"""Capture plan snapshots for the round-15 optimization evidence trail
(`plans/r15/<query>_<tag>.txt`).

Usage: python tools/r15_plan_capture.py [--executed] <tag> <query> [query ...]

Default: the `.explain("formatted")` physical plan of the built DataFrame
(pre-execution initial plan, same as the r14 tool).  With ``--executed``
the query is first run through the noop sink (guide §1.4) and the
POST-EXECUTION final adaptive plan is appended — this is where AQE-applied
`ReusedExchange` / reused shuffle stages become visible, which the initial
plan cannot show; claims about runtime subtree reuse must cite this form.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r15")


def main() -> None:
    args = sys.argv[1:]
    executed = "--executed" in args
    if executed:
        args.remove("--executed")
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("r15-plan-capture")
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
            if executed:
                # collect() (not a noop write) so the DataFrame's OWN
                # queryExecution is the one that runs — a write executes a
                # cloned plan and leaves this one isFinalPlan=false
                df.collect()
                fh.write(
                    "\n\n# --- post-execution final adaptive plan "
                    "(ReusedExchange visible here) ---\n\n"
                )
                fh.write(str(df._jdf.queryExecution().executedPlan()))
        print(f"wrote {out} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
