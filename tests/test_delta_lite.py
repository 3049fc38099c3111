"""Delta publication round-trip (S7): the jar-free writer must emit a
protocol-correct _delta_log that our reader (and, by construction, any
standard Delta reader) replays — including overwrite-as-metadata-swap,
time travel, append, and partition pruning through the log."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl
from snowflake_medtech_vigilance_lakehouse_spark.sources.writers import write_table


def _orders(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("yyyy", F.year("o_orderdate"))
        .withColumn("q", F.quarter("o_orderdate"))
    )


def test_delta_roundtrip_and_log_shape(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_orders")
    o = _orders(spark, sf_dir)
    v = dl.write_delta(o, path, partition_by=["yyyy", "q"])
    assert v == 0

    # protocol shape: first commit carries protocol + metaData + adds
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json")) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    meta = actions[1]["metaData"]
    assert meta["partitionColumns"] == ["yyyy", "q"]
    assert meta["format"]["provider"] == "parquet"
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(a["partitionValues"].keys() == {"yyyy", "q"} for a in adds)
    assert all(a["size"] > 0 for a in adds)

    back = dl.read_delta(spark, path)
    assert back.count() == o.count()
    # value-level spot check over a full column
    a = {r["o_orderkey"]: r["o_totalprice"] for r in o.select("o_orderkey", "o_totalprice").collect()}
    b = {r["o_orderkey"]: r["o_totalprice"] for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b


def test_delta_overwrite_append_and_time_travel(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_tt")
    o = _orders(spark, sf_dir)
    first = o.filter(F.col("yyyy") == 1995)
    dl.write_delta(first, path, partition_by=["yyyy", "q"])
    n0 = first.count()

    second = o.filter(F.col("yyyy") == 1996)
    v1 = dl.write_delta(second, path, mode="overwrite", partition_by=["yyyy", "q"])
    assert v1 == 1
    assert dl.read_delta(spark, path).count() == second.count()
    # overwrite is a log swap: version 0 still reads in full
    assert dl.read_delta(spark, path, version=0).count() == n0

    v2 = dl.write_delta(first, path, mode="append", partition_by=["yyyy", "q"])
    assert v2 == 2
    assert dl.read_delta(spark, path).count() == n0 + second.count()


def test_delta_append_rejects_schema_drift(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_schema")
    o = _orders(spark, sf_dir)
    dl.write_delta(o, path)
    with pytest.raises(ValueError, match="schema mismatch"):
        dl.write_delta(o.drop("o_orderpriority"), path, mode="append")


def test_delta_partition_pruning_through_log(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_prune")
    o = _orders(spark, sf_dir)
    dl.write_delta(o, path, partition_by=["yyyy", "q"])
    back = dl.read_delta(spark, path)
    pruned = back.filter((F.col("yyyy") == 1997) & (F.col("q") == 2))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].split("]")[0]
    assert "1997" in pf and "= 2" in pf
    want = o.filter((F.col("yyyy") == 1997) & (F.col("q") == 2)).count()
    assert pruned.count() == want


def test_write_table_routes_delta_to_lite_writer(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_via_write_table")
    o = _orders(spark, sf_dir)
    write_table(o, path, fmt="delta", partition_by=["yyyy", "q"])
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    assert dl.read_delta(spark, path).count() == o.count()
