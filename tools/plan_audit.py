"""Physical-plan audit over the whole query registry.

For every ``queries()`` entry, compile the plan at the given sf dir
and count the shapes that matter at 100 TB: exchanges (shuffles),
broadcast vs sort-merge joins, file scans and whether their pushed
filters / partition filters are populated, whole-stage-codegen spans,
and Arrow/Pandas Python surfaces. Writes one JSON line per query plus
a markdown summary — the mechanical half of PLANS.md: the prose there
explains WHY each shape is right; this file proves WHAT the shapes
are, every round, for every query, so a regression (a new exchange, a
lost broadcast, a filter that stopped pushing) is a diff in a
committed artifact instead of an unnoticed plan drift.

Usage: python tools/plan_audit.py [sf_dir] [--json PLAN_AUDIT.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTED = (
    ("exchanges", r"\bExchange\b"),
    ("broadcast_joins", r"\bBroadcastHashJoin\b|\bBroadcastNestedLoopJoin\b"),
    ("sortmerge_joins", r"\bSortMergeJoin\b"),
    ("file_scans", r"\bFileScan\b|\bScan parquet\b|\bScan json\b"),
    ("codegen_spans", r"\*\(\d+\)"),
    ("python_arrow_ops", r"\bMapInPandas\b|\bFlatMapGroupsInPandas\b|"
                         r"\bArrowEvalPython\b|\bAggregateInPandas\b"),
    ("python_row_udfs", r"\bBatchEvalPython\b"),
    ("takeordered", r"\bTakeOrderedAndProject\b"),
    ("windows", r"\bWindow\b"),
)


def audit_plan(plan: str) -> dict:
    out = {k: len(re.findall(rx, plan)) for k, rx in COUNTED}
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    out["scans_with_pushed_filters"] = sum(1 for p in pushed if p.strip())
    part = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    out["scans_with_partition_filters"] = sum(1 for p in part if p.strip())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "/root/testdata/sf0.01"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark
    import __spark_entry__ as se

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name, fn in se.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[name] = audit_plan(plan)
            results[name]["err"] = None
        except Exception as e:  # keep auditing the rest
            results[name] = {"err": f"{type(e).__name__}: {e}"}
        row = results[name]
        print(f"{name}: " + ", ".join(
            f"{k}={v}" for k, v in row.items() if k != "err" and v))
    # registry-wide invariant the repo promises: NO row-at-a-time
    # Python UDFs anywhere (Arrow-batched surfaces only)
    offenders = [n for n, r in results.items()
                 if r.get("python_row_udfs")]
    print(f"row-udf offenders: {offenders or 'none'}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    errs = [n for n, r in results.items() if r.get("err")]
    if errs:
        print(f"ERRORS: {errs}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
