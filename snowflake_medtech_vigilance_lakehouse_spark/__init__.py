"""PySpark-native analytics engine with the query & data-processing
capabilities of the `snowflake-medtech-vigilance-lakehouse` reference
(a dbt-on-Snowflake medical-device vigilance lakehouse), re-expressed
Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for the lakehouse workload.
- ``functions``  : scalar / aggregate / vector expression helpers
                   (Snowflake-dialect semantics on Spark built-ins).
- ``sources``    : readers (NDJSON raw ingest, parquet, seed CSV) and
                   table-format writers (parquet, Delta/Iceberg when available).
- ``plans``      : the medallion model DAG (stg -> fact -> counts -> signals)
                   plus the analytics query library used by the driver.
- ``operators``  : LLM-data-pipeline operators — dedup (exact/MinHash/SimHash/
                   n-gram Jaccard/embedding), similarity search (brute-force +
                   LSH kNN), text analysis (lang-id, quality, tokens, BM25),
                   multimodal column plumbing.
- ``quality``    : declarative data-quality runner (dbt-schema-test analog).
- ``streaming``  : Structured Streaming incremental ingest/refresh.

Everything is expressed with the public DataFrame API so Catalyst can
push filters, prune columns and pick join strategies; no RDDs, no
driver-side loops in the hot path.
"""

__version__ = "0.1.0"
