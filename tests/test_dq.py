"""DQ runner: relationship (T5) and expression checks, violation
counting, and where-gating."""

from __future__ import annotations

import pytest

from snowflake_medtech_vigilance_lakehouse_spark.quality import Check, assert_checks, run_checks


def test_relationship_check(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ok = run_checks(cust, [Check("relationship", "c_nationkey",
                                 ref=nation, ref_column="n_nationkey")])
    assert ok[0]["passed"]

    # poison one key -> exactly the poisoned rows are violations
    from pyspark.sql import functions as F
    poisoned = cust.withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") % 50 == 0, F.lit(9999)).otherwise(F.col("c_nationkey")),
    )
    bad = run_checks(poisoned, [Check("relationship", "c_nationkey",
                                      ref=nation, ref_column="n_nationkey")])
    assert not bad[0]["passed"]
    assert bad[0]["n_violations"] == poisoned.filter(F.col("c_nationkey") == 9999).count()


def test_governance_policies(spark, sf_dir):
    from pyspark.sql import functions as F

    from snowflake_medtech_vigilance_lakehouse_spark.quality import (
        MaskingRule, apply_policies, partial_mask, sha2_pseudonymize,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    governed = apply_policies(
        cust,
        row_policy="c_acctbal >= 0",
        masking=[
            MaskingRule("c_name", masker=sha2_pseudonymize("cust:")),
            MaskingRule("c_mktsegment", condition=F.col("c_custkey") % 2 == 0,
                        masker=partial_mask(keep_last=2)),
        ],
    )
    rows = governed.collect()
    # row policy enforced
    assert all(r["c_acctbal"] >= 0 for r in rows)
    # unconditional pseudonymization: 64-hex, stable across calls
    assert all(len(r["c_name"]) == 64 for r in rows)
    again = {r["c_custkey"]: r["c_name"] for r in governed.collect()}
    assert all(again[r["c_custkey"]] == r["c_name"] for r in rows)
    # conditional partial mask: odd keys masked, even keys clear
    for r in rows:
        if r["c_custkey"] % 2 == 0:
            assert not r["c_mktsegment"].startswith("*")
        else:
            assert r["c_mktsegment"].startswith("*") and len(r["c_mktsegment"]) >= 2
    # schema unchanged — a consumer view sees the same columns
    assert governed.columns == cust.columns
    # a rule naming a missing column fails loudly, never silently no-ops
    with pytest.raises(ValueError, match="unknown columns"):
        apply_policies(cust, masking=[MaskingRule("no_such_col")])


def test_expression_check_and_assert(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert run_checks(li, [Check("expression", "l_discount",
                                 expression="l_discount BETWEEN 0 AND 1")])[0]["passed"]
    with pytest.raises(AssertionError, match="expression_l_quantity"):
        assert_checks(li, [Check("expression", "l_quantity",
                                 expression="l_quantity < 0")])


def test_cost_report_attributes_tagged_workloads(spark):
    """G4: two tagged workloads must be attributed separately with
    metrics consistent with what each one did (the heavy one shuffles,
    the light one does not)."""
    from snowflake_medtech_vigilance_lakehouse_spark.quality import cost_report
    from snowflake_medtech_vigilance_lakehouse_spark.session import query_tag

    with query_tag(spark, "finops_heavy"):
        (spark.range(500_000).selectExpr("id % 97 AS k", "id AS v")
         .groupBy("k").sum("v").collect())
    with query_tag(spark, "finops_light"):
        spark.range(10).collect()

    rows = {r["query_tag"]: r for r in cost_report(spark).collect()}
    assert "finops_heavy" in rows and "finops_light" in rows
    heavy, light = rows["finops_heavy"], rows["finops_light"]
    assert heavy["n_jobs"] >= 1 and light["n_jobs"] >= 1
    assert heavy["n_tasks"] > light["n_tasks"]
    assert heavy["shuffle_write_bytes"] > 0
    assert light["shuffle_write_bytes"] == 0
    # tags never bleed into each other: untagged work exists too but
    # is reported under its own bucket
    assert all(r["query_tag"] != "" for r in rows.values())
