"""End-to-end medallion build: the dbt-build analog (E2 lifecycle,
SURVEY.md §3) as one callable — raw NDJSON -> stg -> fact (seed join)
-> quarterly counts -> early signals, with the marts materialized the
way the reference materializes them (stg/signals stay views; fact and
counts become partitioned tables; dbt_project.yml:9-15) and the DQ
suites run after each materialization, exactly where dbt runs its
schema tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..quality.dq import MAUDE_FACT_CHECKS, MAUDE_STG_CHECKS, run_checks
from ..sources.readers import read_maude_raw_ndjson, read_seed_csv
from ..sources.writers import write_table
from .medallion import ae_counts_q, fact_adverse_events, stg_maude, v_ae_early_signals


@dataclass
class BuildResult:
    stg: DataFrame
    fact: DataFrame
    counts: DataFrame
    signals: DataFrame
    dq_results: dict[str, list[dict]] = field(default_factory=dict)

    @property
    def dq_passed(self) -> bool:
        return all(r["passed"] for rs in self.dq_results.values() for r in rs)


def build_medallion(spark: SparkSession, *, raw: DataFrame | None = None,
                    ndjson_path: str | None = None,
                    seed: DataFrame | None = None,
                    seed_csv_path: str | None = None,
                    out_dir: str | None = None,
                    fmt: str = "parquet") -> BuildResult:
    """Run the full model DAG. Provide either in-memory frames or
    paths; when ``out_dir`` is set, fact and counts are published as
    partitioned tables (fact by year/quarter via the label columns the
    cube already carries)."""
    if raw is None:
        assert ndjson_path is not None, "need raw frame or ndjson_path"
        raw = read_maude_raw_ndjson(spark, ndjson_path)
    if seed is None:
        assert seed_csv_path is not None, "need seed frame or seed_csv_path"
        seed = read_seed_csv(spark, seed_csv_path)

    ingest_dq: list[dict] = []
    if "corrupt_record" in raw.columns:
        # Spark refuses any JSON-scan query whose pruned schema is only
        # the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and
        # column pruning reduces a count to exactly that. cache() is
        # the documented workaround; at production scale the bronze
        # layer is materialized first and the count runs on the table.
        raw = raw.cache()
        n_corrupt = raw.filter(raw["corrupt_record"].isNotNull()).count()
        ingest_dq.append({
            "name": "no_corrupt_records", "kind": "ingest",
            "column": "corrupt_record",
            "passed": n_corrupt == 0, "n_violations": n_corrupt,
        })
        # quarantine: unparseable lines stay in raw for replay but do
        # not flow into the model DAG
        raw = raw.filter(raw["corrupt_record"].isNull())

    stg = stg_maude(raw)
    fact = fact_adverse_events(stg, seed)
    counts = ae_counts_q(fact)
    signals = v_ae_early_signals(counts)

    dq = {
        "ingest": ingest_dq,
        "stg": run_checks(stg, MAUDE_STG_CHECKS),
        "fact": run_checks(fact, MAUDE_FACT_CHECKS),
    }

    if out_dir is not None:
        write_table(fact, f"{out_dir}/fact_adverse_events", fmt=fmt,
                    partition_by=["year_quarter"])
        write_table(counts, f"{out_dir}/ae_counts_q", fmt=fmt,
                    partition_by=["yyyy", "q"])

    return BuildResult(stg=stg, fact=fact, counts=counts, signals=signals,
                       dq_results=dq)


def incremental_publish(spark: SparkSession, df: DataFrame, path: str, *,
                        unique_key: list[str],
                        partition_by: list[str] | None = None) -> int:
    """dbt ``materialized='incremental'`` (merge strategy) analog: the
    first run creates the Delta table, every later run upserts the
    batch by ``unique_key`` — existing keys are replaced with the
    batch's row, new keys are appended. Idempotent: re-delivering the
    same batch converges to the same table state, which is what makes
    scheduled re-runs safe.

    Built on :func:`delta_lite.merge_delta`, so the rewrite touches
    only data files that contain a matched key; with the table
    partitioned (and the batch keyed to recent partitions) an
    incremental run's write amplification is bounded by the affected
    partitions, not the table — the property that makes a daily 100 TB
    mart refresh an O(day) job, not an O(history) one.

    Returns the committed Delta version."""
    from ..sources import delta_lite as dl
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        return dl.write_delta(df, path, partition_by=partition_by or [])
    return dl.merge_delta(spark, path, df, on=list(unique_key))
