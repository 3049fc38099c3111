"""Hybrid retrieval (AI6): filters, fusion, and vector-recall sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import hybrid_search


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    df = docs.join(emb, "doc_id")
    df.cache().count()
    return df


def test_metadata_filter_is_honored(corpus):
    out = hybrid_search(
        corpus, query_terms=("spark", "merge"),
        metadata_filter=F.col("source") == "src0", k=10,
    )
    allowed = {r["doc_id"] for r in corpus.filter(F.col("source") == "src0").select("doc_id").collect()}
    got = [r["doc_id"] for r in out.collect()]
    assert got and set(got) <= allowed


def test_pure_vector_mode_matches_bruteforce_knn(corpus, spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 3).first()
    qvec = list(qrow["embedding"])
    hybrid = hybrid_search(
        corpus, query_terms=("spark",), query_vec=qvec, w_lexical=0.0, k=10,
    )
    ground = sim.knn_bruteforce(emb, emb.filter(F.col("vec_id") == 3), k=10)
    # hybrid with w_lexical=0 ranks purely by cosine; the query doc
    # itself (cosine 1.0) leads, then the kNN order follows
    h_ids = [r["doc_id"] for r in hybrid.orderBy("rank").collect()]
    g_ids = [r["neighbor_id"] for r in ground.orderBy("rank").collect()]
    assert h_ids[0] == 3
    assert h_ids[1:6] == g_ids[:5]


def test_rrf_and_weighted_fusion_return_k(corpus):
    for fusion in ("weighted", "rrf"):
        out = hybrid_search(
            corpus, query_terms=("spark", "window"), k=7, fusion=fusion,
        ).collect()
        assert len(out) == 7
        assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 8))


def test_deterministic_across_runs(corpus):
    a = hybrid_search(corpus, query_terms=("spark", "batch"), k=15).collect()
    b = hybrid_search(corpus, query_terms=("spark", "batch"), k=15).collect()
    assert a == b
