"""Write PLANS.md: a physical-plan scale audit of every registered query.

Usage: python tools/plan_audit.py [sf_dir]

For each query: shuffle-exchange count, broadcast vs sort-merge joins,
whole-stage-codegen span count, per-scan ReadSchema (column pruning) and
PushedFilters (predicate pushdown).  This is the evidence trail for the
100 TB design review: a scan reading all columns, an un-broadcast dimension
join, or a surprise exchange shows up here before it shows up in a bill.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpch_spark.plans import audit
from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.session import build_session


def main() -> None:
    # default to sf0.01: at sf0.001 several selective queries return empty
    # and AQE collapses their final plans to EmptyRelation, hiding the shape
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("plan-audit")
    lines = [
        "# PLANS — physical-plan scale audit",
        "",
        f"Source: `tools/plan_audit.py` on `{sf_dir}` (plan shape is "
        "SF-independent; AQE may re-plan joins at runtime on real stats).",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | codegen spans | unbounded global windows | scans (pruned cols) | pushed filters |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, spec in sorted(all_queries().items()):
        if name.endswith("_stream"):
            # streaming plans are per-micro-batch; audited in tests instead
            continue
        df = spec.build(spark, sf_dir)
        df.collect()  # finalize the AQE plan so codegen spans / chosen joins show
        a = audit(name, df)
        scans = "<br>".join(",".join(c) for c in a.read_schemas) or "—"
        pushed = "<br>".join(p.replace("|", "\\|") for p in a.pushed) or "—"
        lines.append(
            f"| {name} | {a.exchanges} | {a.broadcast_joins} | "
            f"{a.sort_merge_joins} | {a.wholestage_spans} | "
            f"{a.unbounded_global_windows} | {scans} | {pushed} |"
        )
        print(a.summary(), file=sys.stderr)
    lines += [
        "",
        "The `unbounded global windows` column counts partition-less Window "
        "nodes with no limit operator in their subtree (the single-reducer "
        "shape).  The only nonzero rows are construction-bounded and "
        "exempted with named bounds in `tests/test_plans.py`: `q15_window` "
        "(max-revenue tie set), `events_rolling_kmv` (per-day grain), "
        "`orders_seasonality` (per-month grain).",
        "",
        "Queries that materialize a shared intermediate with localCheckpoint "
        "(`dedup_semantic`'s pair table, `dedup_ngram_jaccard`'s shingle set) "
        "audit here as scans of the persisted stage; their full "
        "pre-materialization plans are asserted in `tests/test_plans.py`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
