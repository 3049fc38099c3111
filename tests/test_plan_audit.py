"""Registry-wide physical-plan invariants (tools/plan_audit.py is the
per-round artifact; this is the gate): every query plans without
error and NO query carries a row-at-a-time Python UDF — the Python
surface is Arrow-batched only."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_registry_plans_carry_no_row_udfs(spark):
    import __spark_entry__ as se
    from tools.plan_audit import audit_plan

    offenders, errors = [], []
    for name, fn in se.queries().items():
        try:
            plan = fn(spark, "/root/testdata/sf0.001")._jdf\
                .queryExecution().executedPlan().toString()
        except Exception as e:
            errors.append((name, f"{type(e).__name__}: {e}"))
            continue
        if audit_plan(plan)["python_row_udfs"]:
            offenders.append(name)
    assert not errors, errors
    assert not offenders, offenders
