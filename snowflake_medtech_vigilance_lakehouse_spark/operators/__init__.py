"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing.

These extend the reference's declared AI/IR surface (README.md:59-61,
70-73,114-117 — AISQL enrichment, embeddings + kNN, hybrid search) with
the operations a 100 TB training-data pipeline needs (SURVEY.md §2.9).
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    connected_components,
    simhash,
    simhash_pairs,
    duplicated_span_stats,
)
from .graph import pagerank  # noqa: F401
from .similarity import (  # noqa: F401
    knn_bruteforce,
    knn_lsh,
    knn_ivf,
    embedding_neardup_pairs,
    embedding_neardup_pairs_blocked,
    build_ivf_index,
    knn_ivf_indexed,
    recall_at_k,
)
from .text import (  # noqa: F401
    tokens,
    token_stats,
    language_id,
    quality_score,
    doc_fingerprint,
    bm25_scores,
    vocab_topk,
    char_lm_score,
)
