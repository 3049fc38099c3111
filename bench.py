"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query executes to completion through the `noop` sink (full
execution, no driver-side collect cost). Session startup and one
warmup scan are excluded from per-query timings.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "pricing_summary",
    "quarterly_event_counts",
    "early_signals",
    "daily_signals",
    "stg_event_normalize",
    "ordered_narrative",
    "orders_enriched",
    "revenue_3way",
    "cust_orders_fanout",
    "topk_orders_per_cust",
    "asof_join",
    "sessionize",
    "event_type_pivot",
    "masked_events",
    "dedup_exact",
    "ngram_jaccard_neardup",
    "minhash_neardup",
    "knn_bruteforce",
    "hybrid_search",
    "bm25_rank",
    "token_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark
    import __spark_entry__ as se

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = se.queries()

    # warmup: touch the fixture files + JIT the parquet reader
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        if t == "events":
            from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_events
            read_events(spark, sf_dir).count()
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # production dedup profile: the capped-shingle-frequency path (the
    # 100 TB lever) timed next to the exact oracle run above
    from snowflake_medtech_vigilance_lakehouse_spark.operators import dedup as dd
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = dd.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=64)
    t0 = time.perf_counter()
    capped.write.format("noop").mode("overwrite").save()
    timings["ngram_jaccard_capped64"] = round(time.perf_counter() - t0, 3)

    # retrieval-quality SLO (README.md:86,138 analog): Recall@20 of
    # BOTH scale paths (LSH bucketed, IVF n_probe-pruned) against the
    # brute-force ground truth
    from pyspark.sql import functions as F
    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = emb.filter(F.col("vec_id") < 8)
    exact = sim.knn_bruteforce(emb, probe, k=20)
    recall = round(sim.recall_at_k(sim.knn_lsh(emb, probe, k=20), exact, k=20), 4)
    recall_ivf = round(
        sim.recall_at_k(sim.knn_ivf(emb, probe, k=20), exact, k=20), 4
    )

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall_at_20_lsh": recall,
        "recall_at_20_ivf": recall_ivf,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
