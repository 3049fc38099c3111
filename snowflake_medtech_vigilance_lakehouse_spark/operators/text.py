"""Text-analysis operators over a document table.

All operators are pure built-in compositions (split / higher-order
array functions / hashes) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with input splits. They back
the reference's declared text enrichment surface (README.md:59-61,
114-117) in a deterministic, oracle-checkable form; the rule-based
classifier stands in for AISQL exactly as the reference's own keyword
CASE does (models/marts/fact_adverse_events.sql:76-86).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a")


def tokens(text: Column, sep: str = " ") -> Column:
    """Whitespace tokenizer (Column of array<string>)."""
    return F.split(text, sep)


def token_len_sum(tok: Column) -> Column:
    """Sum of token lengths (long) — the shared mean-word-length
    numerator fold. The accumulator is a LONG literal: an int32
    accumulator would overflow on a single document with > 2^31
    characters (real at 100 TB where one bad record can be a dumped
    blob)."""
    return F.aggregate(tok, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def stopword_count(tok: Column, stopwords: Sequence[str]) -> Column:
    """Number of tokens that are stopwords — the shared numerator of
    language_id's and gopher_filter's stopword-density signals."""
    return F.size(F.filter(tok, lambda x: x.isin(*stopwords)))


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Token counting + duplication stats per document.

    Columns: n_tokens, n_distinct, dup_ratio (1 - distinct/total),
    mean_token_len. Everything derives from the token array, computed
    once per row.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    total_len = token_len_sum(t)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        F.round(F.lit(1.0) - nd.cast("double") / n.cast("double"), 6).alias("dup_ratio"),
        F.round(total_len.cast("double") / n.cast("double"), 6).alias("mean_token_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                stopwords: Sequence[str] = DEFAULT_STOPWORDS,
                threshold: float = 0.05) -> DataFrame:
    """Heuristic language ID: stopword-density rule.

    A deterministic n-gram/stopword heuristic (the scalable stand-in
    for a model-based lang-id UDF): documents whose stopword token
    ratio >= threshold are labeled 'en', others 'other'. Returns
    (id, stopword_ratio, lang_pred).
    """
    t = tokens(F.col(text_col))
    sw = stopword_count(t, stopwords)
    ratio = F.round(sw.cast("double") / F.size(t).cast("double"), 6)
    return docs.select(
        F.col(id_col),
        ratio.alias("stopword_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Document quality scoring: length / duplication / stopword
    signals fused into one [0,1] score.

    score = min(n_tokens/64, 1) * (1 - dup_ratio)  — favors longer,
    less-repetitive documents; deterministic and cheap (one pass).
    """
    t = tokens(F.col(text_col))
    n = F.size(t).cast("double")
    nd = F.size(F.array_distinct(t)).cast("double")
    dup_ratio = F.lit(1.0) - nd / n
    score = F.least(n / F.lit(64.0), F.lit(1.0)) * (F.lit(1.0) - dup_ratio)
    return docs.select(
        F.col(id_col),
        F.round(score, 6).alias("quality"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text. Grouping by fingerprint is
    the exact-dedup key at 100 TB (hash shuffles evenly)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
    )


def bm25_scores(docs: DataFrame, terms: Sequence[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms (AI5,
    README.md:61,73,117).

    Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)). Corpus stats
    (N, avgdl, per-term df) are a 1-row aggregate broadcast back over
    the scan — two passes over the tokens column, no shuffle of the
    corpus itself. Returns (id, bm25) for docs matching >= 1 term.
    """
    t = tokens(F.col(text_col))

    def _eq(term: str):
        # closure factory: a default-arg lambda would change the HOF arity
        return lambda x: x == term

    per_doc = docs.select(
        F.col(id_col),
        F.size(t).cast("double").alias("dl"),
        *[
            F.size(F.filter(t, _eq(term))).cast("double").alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    parts = []
    for i in range(len(terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        parts.append(idf * tf * F.lit(k1 + 1.0) / norm)
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return (
        scored.select(F.col(id_col), F.round(total, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )


# PII patterns shared by the Spark operator and the DuckDB oracle:
# RE2-safe (no lookarounds/backrefs) so the exact same pattern strings
# run under Java regex and RE2. Order matters — each specific pattern
# runs before a broader one that could consume its characters: SSN and
# IPv4 both precede PHONE, and because every pattern sees the text
# with all preceding patterns already redacted (both in the chain and
# in pii_counts), the phone separator class can safely include '.' —
# dot-separated phones (555.010.4242) redact, while IPv4s are already
# [IP] by the time the phone pattern runs. The phone tail group still
# requires >= 7 digits total, so short digit runs never match. The
# cost of the dotted class is over-redaction of long dotted numerics
# (e.g. 8+-digit decimals) — the safe direction for a privacy scrub.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9]([0-9() .-]*[0-9]){6,}", "[PHONE]"),
)


def pii_redact(text: Column) -> Column:
    """Redact emails / SSN-shaped ids / IPv4 addresses / phone numbers
    with typed placeholders — the pre-training privacy scrub every
    corpus pipeline needs before text leaves the curation boundary
    (companion to the column-level policies in quality/policies.py).
    Pure regexp_replace chain: codegen, no UDF, linear scan."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (BIGINT columns named n_<kind>), for
    audit reporting alongside the redaction itself.

    Each pattern is counted on the text with all PRECEDING patterns
    already redacted — the same text the redaction chain hands that
    pattern — so every span is attributed to exactly one kind (an SSN
    is never double-counted by the broader phone pattern)."""
    cols = []
    cur = text
    for kind, pat, rep in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    return cols


# BPE-ish pretokenizer: letter runs, digit runs, punctuation runs —
# each optionally glued to one leading space (the GPT-2 pretokenizer
# shape, restricted to constructs Java regex and RE2 evaluate
# identically: no lookarounds, ASCII classes only)
SUBWORD_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def subword_stats(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Token counting under a BPE-ish pretokenizer regex next to the
    whitespace count — the budget-estimation stat a training pipeline
    sizes batches with (subword budgets, not word budgets). Pure
    ``regexp_extract_all``: codegen, linear scan, and the pattern is
    Java/RE2-identical so the DuckDB oracle runs the same expression.

    Returns (id, n_subwords, n_ws_tokens, subwords_per_token)."""
    n_sub = F.size(F.regexp_extract_all(F.col(text_col),
                                        F.lit(SUBWORD_PATTERN), 0))
    n_ws = F.size(tokens(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        n_sub.cast("long").alias("n_subwords"),
        n_ws.cast("long").alias("n_ws_tokens"),
        F.round(n_sub.cast("double") / n_ws.cast("double"), 6)
        .alias("subwords_per_token"),
    )


def _sorted_run_stats(sorted_arr: Column) -> Column:
    """Fold a SORTED array into struct(maxrun, singles): the longest
    run of equal adjacent elements (= the count of the most frequent
    element) and the number of elements occurring exactly once. One
    O(n) pass per row after the O(n log n) sort — the codegen-safe way
    to get per-document frequency extremes WITHOUT an explode +
    groupBy shuffle and without the O(n * distinct) quadratic a
    distinct-then-count-each composition would pay on long documents."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("maxrun"),
        F.lit(0).alias("singles"),
    )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        closed_single = F.when(~same & (acc["run"] == 1),
                               F.lit(1)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["maxrun"], new_run).alias("maxrun"),
            (acc["singles"] + closed_single).alias("singles"),
        )

    def finish(acc):
        return F.struct(
            acc["maxrun"].alias("maxrun"),
            (acc["singles"] + F.when(acc["run"] == 1, F.lit(1))
             .otherwise(F.lit(0))).alias("singles"),
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style repetition quality signals per document — the
    classic pretraining-corpus filters "fraction of the doc that is
    the top token / top 2-gram" and "fraction of 2-gram occurrences
    that are duplicated" (Rae et al. 2021 §A1.1's repetition family),
    as pure codegen over the token array: build the 2-gram array with
    one transform over an index sequence, sort both arrays, and fold
    each into run-length stats (:func:`_sorted_run_stats`) — zero
    shuffles, zero Python, linear in corpus size at any scale.

    Returns (id, n_tokens, top_token_frac, top_bigram_frac,
    dup_bigram_frac), fractions rounded to 6; the bigram fractions
    are NULL for documents with fewer than 2 tokens."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    # guard the <2-token case: sequence(0, -1) is DESCENDING in Spark
    # (step defaults to -1 when start > stop), which would index the
    # token array at 0/-1 instead of producing an empty bigram list
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(t, i + 1),
                              F.element_at(t, i + 2)),
    )).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    tok_stats = _sorted_run_stats(F.array_sort(t))
    bg_stats = _sorted_run_stats(F.array_sort(bigrams))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(tok_stats["maxrun"].cast("double") / n.cast("double"),
                6).alias("top_token_frac"),
        F.when(nb > 0, F.round(
            bg_stats["maxrun"].cast("double") / nb.cast("double"), 6)
        ).alias("top_bigram_frac"),
        F.when(nb > 0, F.round(
            (nb - bg_stats["singles"]).cast("double") / nb.cast("double"), 6)
        ).alias("dup_bigram_frac"),
    )


def vocab_topk(docs: DataFrame, k: int = 1000, text_col: str = "text") -> DataFrame:
    """Tokenizer-vocabulary coverage: the corpus's ``k`` most frequent
    whitespace tokens with rank, frequency, and CUMULATIVE corpus
    coverage — the table a tokenizer-training run reads to pick a
    vocab size ("the top 32k tokens cover 99.2% of occurrences").

    Returns (rank, token, freq, cum_coverage), ties broken
    deterministically by token text so the output is
    engine-reproducible.

    100 TB shape: the ranked side is one partial-agg exchange
    (groupBy token) into a TakeOrderedAndProject of the top ``k`` —
    the only ordered state is the k-row result, so the
    single-partition ranking window at the end is bounded by ``k``,
    never by the corpus. The coverage denominator (total token
    occurrences == sum of all frequencies) is computed WITHOUT
    re-deriving the frequency table: a second pass over the pruned
    text column sums ``size(split(...))`` per document straight into
    a 1-row broadcast — scan + fold in codegen, no explode, no
    exchange (re-using ``freq`` would either recompute its explode +
    groupBy subtree or force a cache pin; summing a full-vocabulary
    window is single-partition state proportional to the vocabulary —
    both worse than the cheap extra scan)."""
    from pyspark.sql.window import Window

    tok = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # NULL text must contribute 0 to the denominator, matching the
    # explode side (explode of a NULL split emits no rows): under the
    # lenient session size(NULL) is -1, which would SUBTRACT from the
    # total — filter NULLs before the fold
    total = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.size(F.split(F.col(text_col), " ")).cast("long").alias("_n"))
        .agg(F.sum("_n").cast("double").alias("_total"))
    )
    topk = freq.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    cum = Window.orderBy(F.desc("freq"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "token",
            F.col("freq").cast("long").alias("freq"),
            F.round(
                F.sum("freq").over(cum).cast("double") / F.col("_total"), 6
            ).alias("cum_coverage"),
        )
    )


def char_lm_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Character-bigram language-model score per document — the
    deterministic stand-in for the CCNet/Wikipedia-KenLM perplexity
    filter (Wenzek et al. 2020): documents whose character
    transitions are unusual FOR THIS CORPUS score low and are
    filter candidates. The "model" is the corpus's own char-bigram
    frequency table; a doc's score is the mean log-probability
    ``avg(ln(count(bigram) / total_bigrams))`` over its (overlapping)
    character bigrams.

    Returns (doc_id, n_bigrams, avg_logprob) — avg_logprob NULL for
    documents shorter than 2 characters, rounded to 6.

    100 TB shape (round 9 cut the corpus passes from three to two —
    the r8 plan re-parsed and re-exploded the corpus text once per
    consumer of the model aggregate: broadcast build, total fold,
    plus the scoring pass itself): the charset^2-bounded model frame
    is lineage-truncated via a LAZY localCheckpoint, so the broadcast
    build and the 1-row total fold read the same computed RDD (tiny
    blocks, released by the ContextCleaner when the frame is garbage
    collected) instead of each re-deriving the aggregate from a
    fresh corpus parse — plan-asserted in pytest: exactly two scans
    of the text column, one model build + one scoring pass. (The
    one-parse variants were measured and REJECTED at sf0.1: routing
    per-doc (id, bigram) counts through a checkpoint adds a
    corpus-sized exchange, and row-local sorted-run encoding pays an
    array_sort per doc — both cost more than the parse they save;
    ReusedExchange cannot fuse the subtrees either, because column
    pruning projects each consumer differently and they never
    canonicalize equal.) The model stays charset^2-bounded whatever
    the corpus size, so the scoring join is a BROADCAST; the
    corpus-wide passes are the model partial agg and the per-doc
    re-aggregation after the broadcast join; no sort, no skew surface
    (the per-doc groupBy key is the doc id). Char bigrams come from
    one ``transform`` over an index sequence with ``substring`` —
    pure codegen, no Python. The checkpoint is LAZY, so no Spark jobs
    run at plan-construction time — but bench with a FRESH frame per
    rep (``timed_build``): re-executing one constructed frame would
    serve later reps from the first rep's checkpoint blocks."""
    # widen before the parse (the dedup family's _shingled pattern):
    # the bigram substring transform is the CPU-heavy step and runs
    # MAP-SIDE, before any aggregation redistributes work — a
    # single-file scan would pin it to one task (measured 1.5 s
    # single-task at sf0.1, per pass). A many-file 100 TB input
    # already scans wide and skips the extra (tiny, raw-text) shuffle
    src = docs.select(F.col(id_col).alias("_id"),
                      F.col(text_col).alias("_txt"))
    p = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < p:
        src = src.repartition(p)
    # guard the <2-char case explicitly: sequence(1, 0) is DESCENDING
    # in Spark ([1, 0], not empty), which would fabricate two junk
    # "bigrams" per short document AND shift the corpus model totals
    bigrams = F.expr(
        "CASE WHEN length(_txt) >= 2"
        " THEN transform(sequence(1, length(_txt) - 1),"
        "                i -> substring(_txt, i, 2))"
        " ELSE CAST(array() AS array<string>) END"
    )
    base = src.select("_id", bigrams.alias("_bg"))
    exploded = base.select("_id", F.explode_outer("_bg").alias("_b"))
    # the model is charset^2-bounded whatever the corpus size; the
    # lazy localCheckpoint makes BOTH its consumers (the broadcast
    # build below and the 1-row total fold) read the same computed
    # RDD instead of each re-deriving the aggregate from a fresh
    # corpus parse — this is where the r8 plan paid its 2nd and 3rd
    # text passes
    model = (
        exploded.filter(F.col("_b").isNotNull())
        .groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    total = model.agg(F.sum("_c").cast("double").alias("_total"))
    scored = (
        exploded.join(F.broadcast(model), "_b", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("_id")
        .agg(
            F.count("_b").cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("_c").cast("double") / F.col("_total"))),
                    6).alias("avg_logprob"),
        )
    )
    return scored.select(F.col("_id").alias(id_col), "n_bigrams", "avg_logprob")
