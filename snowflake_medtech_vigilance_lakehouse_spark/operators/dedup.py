"""Deduplication operators (AI8; README.md declares MAUDE has
near-duplicate reports — SURVEY.md §2.9).

Four tiers, all shuffle-planned for 100 TB:

- exact_dedup          : hash-groupBy on the text (or fingerprint) key.
- ngram_jaccard_pairs  : EXACT n-gram-shingle Jaccard via an inverted
                         shingle index (explode -> self-join -> count),
                         the oracle-checkable baseline. Quadratic only
                         within a shingle bucket, never globally.
- minhash_lsh_pairs    : MinHash signatures + banded LSH bucketing —
                         the 100 TB path. Candidates only collide when
                         a band matches; each candidate is verified
                         with the true Jaccard so output = (subset of)
                         the exact operator's pairs.
- simhash / simhash_pairs : 64-bit SimHash + Hamming-radius pairing via
                         band keys.

Everything is built-in expressions (md5-derived 32-bit hashes,
higher-order array functions); no Python in the hot path. The base
hash for minhash/simhash is the first/second 8 hex chars of md5 —
chosen (over crc32/xxhash64) because DuckDB computes the identical
value (`('0x' || substr(md5(x), 1, 8))::BIGINT`), so the full LSH
pipelines are oracle-checkable end to end.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed coefficients for the universal hash family h_i(x) = (a_i*x + b_i) mod p
_MERSENNE_P = (1 << 61) - 1


def _hash_coeffs(num: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs derived from a splitmix-style mix of
    the seed — no RNG state, reproducible across runs/sessions.

    Bounds keep a*h + b inside a signed 64-bit long for any 32-bit
    input h < 2^32: a < 2^30 and b < 2^61, so the max is < 2^63 — no
    silent wraparound, and no ARITHMETIC_OVERFLOW under ANSI mode."""
    coeffs = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(num):
        pair = []
        for _ in range(2):
            x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            pair.append(z)
        a = (pair[0] % ((1 << 30) - 1)) + 1   # [1, 2^30)
        b = pair[1] % (1 << 61)               # [0, 2^61)
        coeffs.append((a, b))
    return coeffs


def _mh_sig_agg_exprs(num_hashes: int, seed: int) -> list[Column]:
    """The MinHash signature aggregation list — ``count(1)`` plus the
    ``num_hashes`` permutation MINs — built as ONE parsed SQL string
    per column instead of chained Column operators. Identical
    expression trees (the parser produces the same ``min((_h * a + b)
    % p)``; ``a < 2^30`` so the old ``F.lit(a)`` int literal was
    implicitly cast to long, which the optimizer constant-folds to
    exactly the ``{a}L`` literal written here), but construction cost
    drops ~5x: each Column operator is a py4j round-trip, and the 64
    mins × ~6 operators each made this THE dominant driver-side cost
    of the per-commit curation loops — measured 0.81 s per
    construction via Column ops vs 0.15 s via F.expr at local[32]
    (round 13; the loops are driver-job-bound, and this was the
    plan-CONSTRUCTION half of that bill)."""
    p = _MERSENNE_P
    return [F.expr("count(1) AS n_shingles")] + [
        F.expr(f"min((_h * {a}L + {b}L) % {p}L) AS mh_{i}")
        for i, (a, b) in enumerate(_hash_coeffs(num_hashes, seed))]


def md5_hash32(col: Column, *, hex_offset: int = 1) -> Column:
    """32-bit unsigned hash as a long: hex chars [offset, offset+8) of
    md5(utf8(col)) parsed base-16. Identical in DuckDB via
    ``('0x' || substr(md5(x), offset, 8))::BIGINT`` — the property that
    makes every consumer below fully oracle-checkable. offset=1 and
    offset=9 give two independent 32-bit hashes from one md5.

    Evaluated as two 4-hex-char ``conv``s combined by shift — the
    value is bit-identical to one conv of 8 chars (v[0:8] base 16 =
    v[0:4]*16^4 + v[4:8]), but measured 20% cheaper on the minhash
    signature stage at sf0.1 (2.65s -> 2.13s; the md5 itself is
    CSE'd, conv dominates and its cost grows superlinearly in digit
    count). Remaining gap to a non-oracle-checkable intrinsic (crc32:
    1.89s) is the documented price of the full DuckDB twin — see
    PLANS.md "Dedup"."""
    h = F.md5(col.cast("binary"))
    hi = F.conv(F.substring(h, hex_offset, 4), 16, 10).cast("long")
    lo = F.conv(F.substring(h, hex_offset + 4, 4), 16, 10).cast("long")
    return hi * F.lit(65536) + lo


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text,
    with the duplicate count. A single hash aggregation — the shuffle
    key is the text hash, which distributes uniformly at any scale."""
    return (
        docs.groupBy(text_col)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .select(id_col, "n_copies", text_col)
    )


def shingles_from_tokens(tokens: Column, n: int = 3, sep: str = " ") -> Column:
    """Distinct word n-gram shingles from a pre-split token array.

    ``tokens`` MUST be a materialized column reference (select the
    split into its own projection first): Catalyst does no CSE inside
    higher-order-function lambdas, so passing ``F.split(text)`` here
    inlines the split into every ``slice`` call — O(tokens^2) work per
    document (measured 3.7s -> 0.3s at sf0.1 for the 5k-doc corpus).

    Empty array when the document has < n tokens."""
    k = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(1), k - F.lit(n - 1)),
        lambda i: F.concat_ws(sep, F.slice(tokens, i, n)),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, n: int = 3, sep: str = " ") -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Convenience wrapper for expression contexts; inside operators
    prefer splitting once into a column and calling
    :func:`shingles_from_tokens` (see its CSE note)."""
    return shingles_from_tokens(F.split(text, sep), n, sep)


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int,
              widen: bool = True) -> DataFrame:
    """(id, _sh) with the tokenization materialized in its own
    projection so the shingle transform slices an evaluated array.

    ``widen=True``: if the input scans with fewer partitions than
    cores (single small parquet file), the raw text is repartitioned
    first — shingling is the CPU-heavy step, and a one-file scan would
    otherwise pin it to one task (measured 1.5s single-task at sf0.1
    for the pair-generation path). A many-file 100 TB input already
    scans wide and skips the extra shuffle.

    ``widen=False`` skips that pre-shuffle. Consumers whose next step
    is itself a shuffling aggregation (minhash's 64-MIN groupBy, the
    LSH verify join) should pass False: the aggregation redistributes
    the work anyway, and the extra full-text exchange was a measured
    ~35% regression on minhash_neardup at sf0.1 (round-2 verdict)."""
    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    if widen:
        p = docs.sparkSession.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < p:
            base = base.repartition(p)
    return (
        base.select("_id", F.split(F.col("_txt"), " ").alias("_tok"))
        .select("_id", shingles_from_tokens(F.col("_tok"), n).alias("_sh"))
    )


def _shingle_hash_arrays(docs: DataFrame, text_col: str, id_col: str,
                         n: int, widen: bool = True) -> DataFrame:
    """(_id, _h): per doc, the array of DISTINCT 8-byte n-gram hashes
    (unordered). The n-gram is hashed as the token slice itself
    (``xxhash64(slice(tokens, i, n))`` — Spark's hash of complex types
    is stable), skipping the concat_ws string build entirely; distinct
    over hashes == distinct over n-grams modulo 64-bit collisions
    (~1e-11 at 30k shingles, same bet the index already made). The
    global token order prefix filtering relies on is NOT imposed here:
    :func:`_df_ordered_arrays` re-sorts by (df, hash) downstream, so a
    per-doc hash sort would be paid only to be discarded."""
    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    if widen:
        p = docs.sparkSession.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < p:
            base = base.repartition(p)
    toks = base.select("_id", F.split(F.col("_txt"), " ").alias("_tok"))
    k = F.size("_tok")
    grams = F.transform(
        F.sequence(F.lit(1), k - F.lit(n - 1)),
        lambda i: F.xxhash64(F.slice(F.col("_tok"), i, n)),
    )
    return toks.select(
        "_id",
        F.when(k >= n, F.array_distinct(grams))
        .otherwise(F.array().cast("array<long>")).alias("_h"),
    )


def _df_ordered_arrays(arr: DataFrame) -> DataFrame:
    """Re-order each doc's shingle-hash array by ASCENDING document
    frequency (ties by hash) — the canonical AllPairs token order.

    The prefix lemma is valid under ANY global total order, but the
    candidate volume it produces is wildly order-dependent: under raw
    hash order a boilerplate shingle shared by hundreds of docs lands
    inside prefixes and its posting bucket goes quadratic (measured
    94M candidate pairs at sf3); under df order the prefixes hold each
    doc's RAREST shingles, hot shingles sink into the un-indexed
    suffix, and the same corpus generates ~200x fewer candidates with
    bit-identical final output. Costs one (doc, shingle) join +
    re-collect — linear in corpus shingles, repaid orders of magnitude
    over in pair generation. (df asc, hash asc) is a total order, so
    losslessness is untouched (pytest brute-force sweeps)."""
    ex = arr.select("_id", F.explode("_h").alias("_g"))
    dfp = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    # both sides are corpus-sized (every shingle occurrence vs every
    # distinct shingle): force the shuffle hash join — the groupBy
    # above already partitioned both by _g, so the exchange is reused;
    # letting AQE "optimize" this into a broadcast OOMs the driver at
    # sf3 and would be absurd at 100 TB
    return (
        ex.join(dfp.hint("shuffle_hash"), "_g")
        .groupBy("_id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_df", "_g"))),
            lambda s: s["_g"]).alias("_h"))
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a PREFIX-FILTERED
    inverted shingle index (the AllPairs/SSJoin family: Bayardo et
    al., WWW'07; Chaudhuri et al., ICDE'06 — public literature).

    Plan: per doc, sorted distinct shingle hashes -> index only the
    first ``|d| - ceil(t*|d|) + 1`` of them (the prefix). Any pair
    with Jaccard >= t has intersection >= ceil(t*max(|a|,|b|)), and
    the smallest common element under the global sort order provably
    lands inside BOTH prefixes — so candidate generation over prefix
    postings is lossless while indexing ~(1-t) of the corpus and
    cutting bucket pair-generation ~(1-t)^2 (measured 1.27M -> 330k
    candidates at sf0.1, t=0.5). Candidates are then verified EXACTLY:
    join the two full hash arrays and compute the true intersection
    with ``array_intersect`` — no co-occurrence counting over the full
    index needed.

    ``max_doc_freq`` drops stop-shingle buckets larger than the cap
    before pair generation — the 100 TB lever for adversarially hot
    n-grams (boilerplate). Because verification computes the TRUE
    Jaccard on full sets, the cap now only affects recall (survivor
    pairs keep exact scores — a subset of the uncapped output, not an
    underestimate). The DuckDB oracle runs with None.
    Returns (doc_id_1, doc_id_2, jaccard) with doc_id_1 < doc_id_2.
    """
    arr = _df_ordered_arrays(
        _shingle_hash_arrays(docs, text_col, id_col, n).filter(F.size("_h") > 0))
    # ceil(t*|d|) in EXACT terms: some double products overshoot the
    # true rational value (0.56*25 = 14.000000000000002 -> ceil 15,
    # one too high), shortening the prefix below the lossless AllPairs
    # bound and silently dropping pairs whose Jaccard sits exactly at
    # the threshold. Subtract an epsilon far below 1/max_doc_size but
    # far above double rounding error before taking the ceiling.
    plen = F.greatest(
        F.lit(1),
        (F.size("_h")
         - F.ceil(F.size("_h") * F.lit(float(threshold)) - F.lit(1e-9)) + 1
         ).cast("int"),
    )
    inv = arr.select("_id", F.explode(F.slice("_h", F.lit(1), plen)).alias("_g"))
    posting = (
        inv.groupBy("_g")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_doc_freq is not None:
        posting = posting.filter(F.size("ids") <= max_doc_freq)
    pairs = posting.select(
        F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS id1, y AS id2))))"
        )).alias("p")
    ).select("p.id1", "p.id2")
    # a pair sharing several prefix shingles appears several times —
    # dedupe BEFORE the verify join so each pair is verified once
    cand = pairs.groupBy("id1", "id2").agg(F.count(F.lit(1)).alias("_pco"))
    # exact verification on the full hash arrays via the TWO-SIDED
    # join: both probe sides hash-partition `arr` on `_id`, so the
    # exchange of the array frame is planned once and REUSED — arrays
    # cross the wire once, and only the (small) pair list shuffles
    # twice. The round-13 one-pass fold (explode pairs to endpoints,
    # meet in one id-keyed join, groupBy(id1,id2) the sides back) was
    # tried and REVERTED here: its pair-volume aggregation carries
    # BOTH full hash arrays through a pair-keyed exchange, and the sf1
    # sweep read 9.3 -> 27.2 s (2.9x) on exactly this operator — at
    # candidate volumes the self-join regime produces, shuffling
    # array payloads per pair loses to the reused id-keyed exchange
    # (guide §1.1: the "ideal" plan lost to the gotcha; §2.3: don't
    # move heavy payloads keyed by pair). The fold SURVIVES in
    # minhash_neardup_against, where the increment contract bounds
    # pair volume and it removes a second corpus scan.
    ver = (
        cand.join(arr.select(F.col("_id").alias("id1"), F.col("_h").alias("_h1")), "id1")
        .join(arr.select(F.col("_id").alias("id2"), F.col("_h").alias("_h2")), "id2")
        .select(
            "id1", "id2",
            F.size(F.array_intersect("_h1", "_h2")).alias("_inter"),
            F.size("_h1").alias("_n1"), F.size("_h2").alias("_n2"),
        )
    )
    # filter on the UNROUNDED ratio, round only for output (the oracle
    # does the same; a rounded filter would keep ratios within 5e-7
    # below threshold that the oracle drops)
    jac = (
        F.col("_inter").cast("double")
        / (F.col("_n1") + F.col("_n2") - F.col("_inter")).cast("double")
    )
    return (
        ver.select(
            F.col("id1").alias("doc_id_1"),
            F.col("id2").alias("doc_id_2"),
            jac.alias("_jac"),
        )
        .filter(F.col("_jac") >= threshold)
        .select("doc_id_1", "doc_id_2", F.round("_jac", 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 42) -> DataFrame:
    """MinHash signature per document: sig_i = min over shingles of
    (a_i * md5_hash32(shingle) + b_i) mod p.

    Shape: explode distinct shingles -> md5-hash once per
    (doc, shingle) -> hash-aggregate with num_hashes MIN()s. The
    permutations are plain expressions over the single hash column, so
    each shingle is hashed exactly once (a per-row array-transform
    formulation re-evaluates the shingle array per permutation — 64x
    the work, and measured ~80x slower at sf0.1). MIN combines
    map-side, so the shuffle carries one partial signature per
    (partition, doc); widen=False because that groupBy is the
    redistribution point (see _shingled)."""
    exploded = (
        _shingled(docs, text_col, id_col, n, widen=False)
        .select(F.col("_id").alias(id_col), F.explode("_sh").alias("_g"))
        .select(F.col(id_col), md5_hash32(F.col("_g")).alias("_h"))
    )
    # explode drops empty-shingle docs, matching the n_shingles > 0 contract
    return exploded.groupBy(id_col).agg(
        *_mh_sig_agg_exprs(num_hashes, seed))


def _band_buckets(sig: DataFrame, bands: int, rows: int,
                  id_col: str) -> DataFrame:
    """(_id, band, bucket) rows from a signature frame — the band key
    is the signature slice itself (a struct of ``rows`` longs, exact
    equality), shared by the self-join pair generator
    (:func:`minhash_lsh_pairs`) and the persisted store
    (:func:`minhash_store_frames`) so both produce byte-identical
    candidate keys."""
    # one parsed expression instead of bands*(rows+4) chained Column
    # operators: same struct field names and types (int band literal,
    # long mh_* slices), ~5x cheaper to CONSTRUCT — this runs once per
    # curation-loop commit, where plan construction was measured to be
    # half the per-commit driver bill (see _mh_sig_agg_exprs)
    band_rows = ", ".join(
        "named_struct('band', {bi}, 'bucket', named_struct({fields}))".format(
            bi=bi,
            fields=", ".join(f"'r{r}', mh_{bi * rows + r}"
                             for r in range(rows)))
        for bi in range(bands))
    return sig.select(
        F.col(id_col).alias("_id"),
        F.expr(f"explode(array({band_rows}))").alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 64, bands: int = 16, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Banded-LSH candidate generation + exact-Jaccard verification.

    num_hashes/bands rows per band; two docs are candidates iff some
    band of their signatures matches exactly (band key = the band's
    signature slice itself, a struct of `rows` longs — exact equality,
    no secondary bucket hash, so the candidate set is a deterministic
    function of the signatures and the DuckDB oracle reproduces it
    with plain column equality). Candidates are verified against true
    shingle Jaccard, so precision is exact; recall is the standard LSH
    S-curve at the chosen (bands, rows). This is the shape that
    survives 100 TB: the only join key is the band slice (a few longs
    per row — same shuffle order of magnitude as a hashed bucket)."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col, seed)
    buckets = _band_buckets(sig, bands, rows, id_col)
    # per-bucket pair generation instead of a bucket self-join: the
    # self-join recomputes the whole signature pipeline for each side,
    # while one groupBy shuffles the (band, bucket, id) rows once and
    # emits sorted pairs inside each bucket (LSH buckets are small by
    # construction, so the collect is bounded)
    cand = (
        buckets.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS id1, y AS id2))))"
        )).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    sh = _shingled(docs, text_col, id_col, n, widen=False)
    # two-sided verification join: both sides hash-partition `sh` on
    # the same column, so the shingle frame's exchange is planned once
    # and REUSED — shingle arrays cross the wire once while only the
    # small pair list shuffles per side. The round-13 one-pass fold
    # (explode pairs to endpoints, one id-keyed join,
    # groupBy(id1,id2)) was tried and REVERTED in the self-join
    # generators: its pair-keyed aggregation re-shuffles BOTH shingle
    # arrays per candidate pair, which the sf1 sweep priced at 2.9x on
    # the ngram twin of this operator (see ngram_jaccard_pairs).
    # filter on the UNROUNDED ratio and round only in the output
    # projection — the oracle does the same, and filtering on the
    # rounded value would keep a true jaccard in
    # [threshold - 5e-7, threshold) that the oracle drops
    jac = (
        F.size(F.array_intersect("_sh1", "_sh2")).cast("double")
        / F.size(F.array_union("_sh1", "_sh2")).cast("double")
    )
    verified = (
        cand.join(sh.withColumnRenamed("_id", "id1").withColumnRenamed("_sh", "_sh1"), "id1")
        .join(sh.withColumnRenamed("_id", "id2").withColumnRenamed("_sh", "_sh2"), "id2")
        .select(
            F.col("id1").alias("doc_id_1"),
            F.col("id2").alias("doc_id_2"),
            jac.alias("_jac"),
        )
        .filter(F.col("_jac") >= threshold)
        .select(
            "doc_id_1", "doc_id_2", F.round("_jac", 6).alias("jaccard")
        )
    )
    return verified


def minhash_store_frames(docs: DataFrame, *, num_hashes: int = 64,
                         bands: int = 32, n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         seed: int = 42,
                         materialize_base: bool = False,
                         base: DataFrame | None = None
                         ) -> tuple[DataFrame, DataFrame]:
    """The two frames of a MinHash dedup store, derivable in-plan or
    persisted by :func:`build_minhash_store`:

    - ``buckets`` (_id, band, bucket): the banded signature slices —
      exact-equality candidate keys, byte-identical to
      :func:`minhash_lsh_pairs`'s (same ``_band_buckets``).
    - ``hashes`` (_id, _h array<long>): each doc's DISTINCT md5-based
      32-bit shingle hashes — the verification set. Jaccard over hash
      sets equals Jaccard over shingle strings modulo 32-bit
      collisions (~1e-11 at corpus shingle counts — the same bet the
      n-gram index made, see :func:`_shingle_hash_arrays`), and at
      8 bytes per shingle the store is ~5-10x smaller than persisting
      the n-gram strings. md5 (not xxhash64) so a second engine — and
      the DuckDB oracle — can recompute the exact same sets.

    Docs with zero shingles (< n tokens) are absent from both frames,
    matching the ``n_shingles > 0`` contract of the signature op.

    Both frames aggregate the SAME exploded (doc, md5-hash) rows —
    the signature's 64 MINs and the verification set's collect_set
    are two aggregations of one base. ``materialize_base=True``
    eagerly localCheckpoints that base so the shingle+md5 pipeline
    runs ONCE instead of once per frame — for INCREMENT-sized inputs
    only (the absorb/incremental paths, bounded by contract); a
    corpus-sized build must keep the base lazy (a 100 TB (doc,
    shingle) materialization has no business in the block manager).

    ``base`` (internal, the CDF curation loop): a caller that already
    materialized THIS doc set's exploded (_id, _h) rows — e.g. the
    per-commit batch base its pairing stage built — passes it in and
    the shingle+md5 pipeline is not re-derived at all; ``docs`` is
    then ignored. The caller owns the docs≡base correspondence (the
    curation loop filters one checkpointed batch base by the keep
    decisions — filtering by id commutes with both per-id
    aggregations, so the frames are identical to re-deriving from the
    kept docs)."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    if base is not None:
        ex = base
    else:
        ex = minhash_exploded_base(docs, n=n, text_col=text_col,
                                   id_col=id_col)
        if materialize_base:
            ex = ex.localCheckpoint(eager=True)
    # same expressions as minhash_signatures (min over occurrences ==
    # min over the distinct set; n_shingles is not part of either
    # store frame, so bucket rows are byte-identical either way)
    sig = ex.groupBy("_id").agg(*_mh_sig_agg_exprs(num_hashes, seed))
    buckets = _band_buckets(sig, bands, rows, "_id")
    hashes = ex.groupBy("_id").agg(F.collect_set("_h").alias("_h"))
    return buckets, hashes


def minhash_exploded_base(docs: DataFrame, *, n: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """The shared exploded (_id, _h md5-hash) base both store frames
    aggregate (see :func:`minhash_store_frames`). Exposed so a caller
    that derives MULTIPLE frame sets from one bounded doc set (the
    CDF curation loop: the pairing stage over the full commit batch,
    then the absorb over its kept subset) can materialize the
    shingle+md5 pipeline ONCE and filter, instead of re-deriving it
    per consumer."""
    return (
        _shingled(docs, text_col, id_col, n, widen=False)
        .select("_id", F.explode("_sh").alias("_g"))
        .select("_id", md5_hash32(F.col("_g")).alias("_h"))
    )


def build_minhash_store(docs: DataFrame, path: str, *,
                        num_hashes: int = 64, bands: int = 32, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        seed: int = 42) -> None:
    """Persist the MinHash dedup store for INCREMENTAL near-dup: pay
    the corpus signature pass once, then every arriving batch dedupes
    against the store at increment-proportional cost
    (:func:`minhash_neardup_incremental`) instead of re-running the
    full-corpus pair stage. The lakehouse-native shape of a
    fingerprint registry at 100 TB: daily increments never re-shuffle
    the historical corpus.

    Layout: ``{path}`` = buckets parquet, ``{path}_hashes`` = the
    verification hash sets, ``{path}_meta/meta.json`` = the signature
    parameters (an increment computed under different
    num_hashes/bands/n/seed would silently never collide, so queries
    and appends read the params from the store, never from their
    caller)."""
    import json
    import os

    buckets, hashes = minhash_store_frames(
        docs, num_hashes=num_hashes, bands=bands, n=n,
        text_col=text_col, id_col=id_col, seed=seed)
    buckets.write.mode("overwrite").parquet(path)
    hashes.write.mode("overwrite").parquet(path + "_hashes")
    os.makedirs(path + "_meta", exist_ok=True)
    tmp = os.path.join(path + "_meta", "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"num_hashes": num_hashes, "bands": bands, "n": n,
                   "seed": seed, "text_col": text_col,
                   "id_col": id_col}, f)
    os.replace(tmp, os.path.join(path + "_meta", "meta.json"))


def _minhash_store_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path + "_meta", "meta.json")) as f:
        return json.load(f)


def _migrate_minhash_ticks(path: str) -> None:
    """One-time flat→tick migration of a MinHash store (round 13 —
    the churn tier): root-level parquet files (the build/append flat
    layout, all predating the first churn commit) MOVE into a
    ``tick=-1`` partition dir — pure renames, no data copied — so
    subsequent per-commit absorbs land as ``tick=<commit_version>``
    dirs and the tombstone liveness rule
    (:mod:`~..streaming.liveness`) has a per-row epoch to compare
    against. Epoch ``-1`` is correct for every pre-churn row: any
    tombstone (commit version >= 0) kills it."""
    import os

    for root in (path, path + "_hashes"):
        if not os.path.isdir(root):
            continue
        flat = [f for f in os.listdir(root) if f.endswith(".parquet")]
        if not flat:
            continue
        dst = os.path.join(root, "tick=-1")
        os.makedirs(dst, exist_ok=True)
        for f in flat:
            os.replace(os.path.join(root, f), os.path.join(dst, f))


def _minhash_tick_layout(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        n.startswith("tick=") for n in os.listdir(path))


def read_minhash_store(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """The LIVE (buckets, hashes) frames of a persisted MinHash store
    (round 13): a flat (pre-churn) store with no tombstone sidecar is
    two plain reads — the steady state pays nothing; a churned store
    applies the shared tombstone-liveness rule per frame (a row is
    dead iff a ``{path}_tombstones`` tick for its ``_id`` is newer
    than the row's absorb tick; flat-era rows read as epoch ``-1``)
    and drops the ``tick`` column, so every consumer —
    :func:`minhash_neardup_incremental`, the curation loop, ad-hoc
    probes — sees exactly the signatures that should still
    participate in dedup decisions."""
    from ..streaming.liveness import live_filter

    tomb = path + "_tombstones"

    def _live(df: DataFrame) -> DataFrame:
        ticked = "tick" in df.columns
        out = live_filter(
            df, tomb, F.col("_id"),
            F.col("tick") if ticked else F.lit(-1))
        return out.drop("tick") if ticked else out

    return (_live(spark.read.parquet(path)),
            _live(spark.read.parquet(path + "_hashes")))


def append_minhash_store(docs: DataFrame, path: str, *,
                         skip_existing: bool = False,
                         tick: int | None = None,
                         base: DataFrame | None = None) -> None:
    """Absorb an (already deduplicated) increment into the store —
    signature params come from the store's meta sidecar. Re-ingesting
    a doc_id refuses loudly by default: the store holds one signature
    per doc, and a duplicate would double its candidate generation
    (same append-only contract as the postings index).
    ``skip_existing=True`` silently drops already-present ids instead
    (legacy at-least-once mode for flat stores).

    ``tick=<commit_version>`` (round 13 — the churn tier) switches to
    the per-tick overwrite discipline every churn-capable layout
    uses: the increment lands as ``tick=N`` dirs (migrating a flat
    store's files under ``tick=-1`` first — renames, no rewrite), a
    replayed commit OVERWRITES its own tick instead of duplicating
    rows, and each row carries its absorb epoch for the tombstone
    liveness rule — an updated doc's re-signature at the tombstone's
    own commit version serves while the old copy dies. Existence
    checks are the tick-mode caller's job (the curation loop vets
    re-inserts against LIVE rows before absorbing), so ``tick`` and
    ``skip_existing`` are mutually exclusive: filtering a replay to
    zero rows and then overwriting its tick would DELETE the prior
    absorb."""
    meta = _minhash_store_meta(path)
    id_col = meta["id_col"]
    if tick is not None and skip_existing:
        raise ValueError(
            "append_minhash_store: tick= and skip_existing are "
            "mutually exclusive (a replay filtered to zero rows would "
            "overwrite its own tick with nothing)")
    if tick is None and _minhash_tick_layout(path):
        raise ValueError(
            f"append_minhash_store: {path} uses the tick layout (a "
            f"churn-capable store); pass tick=<commit_version> — a "
            f"flat append would mix root-level files into a "
            f"partitioned directory and break discovery")
    if tick is None:
        existing = docs.sparkSession.read.parquet(path + "_hashes")
        if skip_existing:
            docs = (docs.join(
                existing.select(F.col("_id").alias(id_col)), id_col,
                "left_anti"))
        else:
            dups = (docs.select(F.col(id_col).alias("_id")).distinct()
                    .join(existing.select("_id"), "_id").limit(5)
                    .collect())
            if dups:
                raise ValueError(
                    f"append_minhash_store refused: ids "
                    f"{[r[0] for r in dups]}… already present in "
                    f"{path}; the store holds one signature per doc — "
                    f"dedupe the increment "
                    f"(minhash_neardup_incremental) before absorbing "
                    f"it")
    # increments are bounded by contract — materialize the shared
    # exploded-hash base so the shingle+md5 pipeline (and the caller's
    # decisions-join input) runs once for the two frame writes; a
    # caller that already materialized this doc set's base (the CDF
    # curation loop, which filtered its pairing base by the keep
    # decisions) passes it via ``base=`` and nothing re-derives
    buckets, hashes = minhash_store_frames(
        docs, num_hashes=meta["num_hashes"], bands=meta["bands"],
        n=meta["n"], text_col=meta["text_col"], id_col=id_col,
        seed=meta["seed"], materialize_base=base is None, base=base)
    if tick is None:
        buckets.write.mode("append").parquet(path)
        hashes.write.mode("append").parquet(path + "_hashes")
    else:
        _migrate_minhash_ticks(path)
        # the two frame writes are independent jobs over the same
        # checkpointed base — submit them concurrently so the second
        # back-fills the first's task tail (guide §2.6). Same crash
        # window as the old sequential writes: either tick dir can
        # exist without the other until both land, and a replay
        # overwrites both. Tick mode only: the flat-append path may
        # carry a corpus-sized lazy base that should not execute
        # twice at once.
        with ThreadPoolExecutor(max_workers=2) as pool:
            fb = pool.submit(
                lambda: buckets.write.mode("overwrite")
                .parquet(f"{path}/tick={tick}"))
            fh = pool.submit(
                lambda: hashes.write.mode("overwrite")
                .parquet(f"{path}_hashes/tick={tick}"))
            fb.result()
            fh.result()


def compact_minhash_store(spark, path: str, *,
                          keep_ticks: int = 1) -> dict:
    """Physical churn apply for a tick-layout MinHash store (round 13
    — completes the OPTIMIZE symmetry: postings and IVF layouts got
    theirs in round 12). Folds the per-commit ``tick=N`` dirs of BOTH
    store frames below the newest ``keep_ticks`` into one
    consolidated dir each — dropping rows dead under the shared
    ``{path}_tombstones`` sidecar (retired/updated signatures
    physically gone) via the same tombstone-aware
    :func:`~..streaming.index_refresh.compact_index_ticks` machinery
    (key column ``_id``; consolidated dir named for the NEWEST merged
    tick so surviving re-signatures stay live; swap-staged, crash
    leaves the store untouched or loudly recoverable) — then prunes
    the tombstone ticks BOTH frames have compacted past. Flat
    (never-churned) stores are a no-op. Read results are IDENTICAL
    across the compaction (pytest-pinned): dead rows were already
    read-invisible through :func:`read_minhash_store`."""
    from ..streaming.index_refresh import (compact_index_ticks,
                                           prune_spent_tombstones)

    merged_b = compact_index_ticks(spark, path, keep_ticks=keep_ticks,
                                   key="_id")
    merged_h = compact_index_ticks(spark, path + "_hashes",
                                   keep_ticks=keep_ticks, key="_id",
                                   tomb_dir=path + "_tombstones")
    pruned = prune_spent_tombstones(
        spark, path, sibling_dirs=[path, path + "_hashes"])
    return {"merged_bucket_ticks": merged_b,
            "merged_hash_ticks": merged_h,
            "pruned_tombstones": pruned}


def minhash_neardup_against(new_docs: DataFrame,
                            corpus_buckets: DataFrame,
                            corpus_hashes: DataFrame, *,
                            threshold: float = 0.5,
                            num_hashes: int = 64, bands: int = 32,
                            n: int = 3, text_col: str = "text",
                            id_col: str = "doc_id",
                            seed: int = 42,
                            base: DataFrame | None = None,
                            frames: tuple[DataFrame, DataFrame] | None
                            = None) -> DataFrame:
    """Near-dup pairs of an INCREMENT against a MinHash store (plus
    the increment's internal pairs) — the incremental twin of
    :func:`minhash_lsh_pairs`: same banded candidate keys, same
    exact-Jaccard verification (over the store's md5 hash sets), same
    output contract (doc_id_1 < doc_id_2, jaccard rounded to 6 dp,
    >= threshold). Equals the full-corpus operator on corpus ∪
    increment restricted to pairs touching the increment
    (pytest-pinned), so accept/reject decisions made incrementally
    match a from-scratch rebuild.

    100 TB shape — the corpus side NEVER shuffles:

    - candidates: corpus buckets ⋈ broadcast(increment buckets) on
      (band, bucket) — a broadcast hash join, one corpus scan, zero
      exchanges of corpus data; increment-internal candidates reuse
      the bounded per-bucket pair generator on the increment alone.
    - verification: the bounded pair list explodes to one row per
      endpoint and broadcasts against the hash-set frame — ONE
      exchange-free corpus pass — and the sides fold back with a
      single pair-volume aggregation; only candidate-volume data
      ever shuffles.

    Increments are bounded by contract (a daily batch, not a second
    corpus); a corpus-scale "increment" belongs in
    :func:`minhash_lsh_pairs` over the union instead. Store and
    increment doc_ids must be disjoint (``append_minhash_store``
    enforces it on absorb)."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    if frames is not None:
        # ``frames`` (round 14, internal — the CDF curation loop): the
        # increment's (buckets, hashes) pair as minhash_store_frames
        # would build them from ``base``, with buckets ALREADY eagerly
        # checkpointed — the caller prefetches that checkpoint job
        # concurrently with the previous commit's absorb (it reads
        # only the batch, none of the store state; guide §2.6), so the
        # signature aggregation leaves this op's serial spine. The
        # caller owns the frames≡docs correspondence.
        new_buckets, new_hashes = frames
    else:
        new_buckets, new_hashes = minhash_store_frames(
            new_docs, num_hashes=num_hashes, bands=bands, n=n,
            text_col=text_col, id_col=id_col, seed=seed,
            materialize_base=base is None, base=base)
        # the increment pipeline (shingle -> md5) is materialized ONCE
        # as the store frames' shared exploded base (materialize_base
        # above); new_buckets still checkpoints because TWO subtrees
        # reference it (cross + intra) and each re-run would repeat
        # the 64-min signature aggregation. new_hashes is referenced
        # exactly once since the one-pass verification fold landed, so
        # its old eager checkpoint became pure cost (one extra job per
        # increment) and is gone. Eager executor-side blocks, released
        # by the ContextCleaner when the frames are garbage collected.
        new_buckets = new_buckets.localCheckpoint(eager=True)

    cross = (
        corpus_buckets.join(
            F.broadcast(new_buckets.withColumnRenamed("_id", "_nid")),
            ["band", "bucket"])
        # disjoint ids are the contract, but a REPLAYED increment
        # (crash-recovery re-run after its keeps were absorbed) meets
        # its own store copy here — a self-pair would score 1.0 and
        # make every replayed keep reject itself
        .filter(F.col("_id") != F.col("_nid"))
        .select(F.least("_id", "_nid").alias("id1"),
                F.greatest("_id", "_nid").alias("id2"))
    )
    intra = (
        new_buckets.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS id1, y AS id2))))"
        )).alias("p"))
        .select("p.id1", "p.id2")
    )
    # candidate generation scans the corpus buckets once; since the
    # one-pass verification fold, the pair list is referenced exactly
    # once (the exploded broadcast below), so the old eager
    # checkpoint — needed when two verification halves each re-ran
    # this subtree — became a pure extra job and is gone
    cand = cross.unionByName(intra).distinct()

    # a REPLAYED increment doc exists in BOTH frames (crash-recovery
    # re-run after its keeps were absorbed); a plain union would carry
    # its hash set twice and every surviving pair touching it would be
    # emitted as two identical rows — violating the pairs contract.
    # Broadcast-anti the (small) increment ids out of the corpus side:
    # the corpus scan stays exchange-free and the increment's copy
    # wins, so a replay sees exactly one hash set per id
    all_h = (corpus_hashes.join(
        F.broadcast(new_hashes.select("_id")), "_id", "left_anti")
        .unionByName(new_hashes))
    # pull BOTH sides' hash sets in ONE corpus pass (the old h1/h2
    # formulation ran the broadcast scan of the corpus hash store
    # twice — once per pair side — and then shuffled the two
    # pair-sized halves to meet; guide §2.3/2.4): explode the bounded
    # pair list to one (pair, side, id) row per endpoint, broadcast
    # it against the store (ONE exchange-free corpus scan), and fold
    # the two sides back together with a single pair-volume
    # aggregation — first(when(side...)) is deterministic because
    # each (pair, side) group holds exactly one row. Pairs whose
    # endpoint is absent from the store fold a NULL side and are
    # dropped, exactly like the old inner joins.
    cand_long = cand.select(
        "id1", "id2",
        F.explode(F.array(
            F.struct(F.lit(1).alias("_side"), F.col("id1").alias("_id")),
            F.struct(F.lit(2).alias("_side"), F.col("id2").alias("_id")),
        )).alias("_e")
    ).select("id1", "id2", F.col("_e._side").alias("_side"),
             F.col("_e._id").alias("_id"))
    joined = all_h.join(F.broadcast(cand_long), "_id")
    folded = (
        joined.groupBy("id1", "id2")
        .agg(F.first(F.when(F.col("_side") == 1, F.col("_h")),
                     ignorenulls=True).alias("_h1"),
             F.first(F.when(F.col("_side") == 2, F.col("_h")),
                     ignorenulls=True).alias("_h2"))
        .filter(F.col("_h1").isNotNull() & F.col("_h2").isNotNull())
    )
    inter = F.size(F.array_intersect("_h1", "_h2")).cast("double")
    jac = inter / (F.size("_h1") + F.size("_h2") - inter)
    return (
        folded
        .select(F.col("id1").alias("doc_id_1"),
                F.col("id2").alias("doc_id_2"), jac.alias("_jac"))
        .filter(F.col("_jac") >= threshold)
        .select("doc_id_1", "doc_id_2", F.round("_jac", 6).alias("jaccard"))
    )


def minhash_neardup_incremental(spark, new_docs: DataFrame, path: str, *,
                                threshold: float = 0.5,
                                base: DataFrame | None = None,
                                frames: tuple[DataFrame, DataFrame] | None
                                = None) -> DataFrame:
    """Path-based entry over a persisted :func:`build_minhash_store`:
    signature params are read from the store's meta sidecar so an
    increment can never be fingerprinted under mismatched parameters,
    and the corpus side is the store's LIVE rows
    (:func:`read_minhash_store` — a retired/updated doc's old
    signature never generates candidates, round 13). See
    :func:`minhash_neardup_against` for semantics and the scale-shape
    contract."""
    meta = _minhash_store_meta(path)
    buckets, hashes = read_minhash_store(spark, path)
    return minhash_neardup_against(
        new_docs, buckets, hashes,
        threshold=threshold, num_hashes=meta["num_hashes"],
        bands=meta["bands"], n=meta["n"], text_col=meta["text_col"],
        id_col=meta["id_col"], seed=meta["seed"], base=base,
        frames=frames)


def _release_persistent(jsc, rdd_ids: list[int]) -> None:
    """Unpersist the given persistent-RDD ids if still registered.
    Best-effort: an id the cleaner already dropped is skipped."""
    live = jsc.getPersistentRDDs()
    for rid in rdd_ids:
        rdd = live.get(rid)
        if rdd is not None:
            rdd.unpersist()


def _persisted_ids(jsc) -> set[int]:
    """Currently registered persistent-RDD ids."""
    return {int(k) for k in jsc.getPersistentRDDs().keys()}


def _eager_checkpoint(df: DataFrame, jsc) -> tuple[DataFrame, list[int]]:
    """localCheckpoint eagerly and return (checkpointed frame, the
    block ids the checkpoint registered) — the bookkeeping every
    iterative loop here needs to release superseded rounds explicitly
    (the ContextCleaner does not reliably reclaim checkpoint blocks;
    shared by connected_components and graph.pagerank).

    The id is read off the checkpointed frame's own LogicalRDD
    (round 14): the old global before/after diff of persistent-RDD ids
    mis-attributes blocks when two loops checkpoint CONCURRENTLY — the
    exact regime keep_representatives' CC ∥ PageRank overlap creates —
    and releasing a block the OTHER loop still needs kills it (a
    truncated lineage cannot recompute). The diff remains as the
    fallback for plans where the accessor is unavailable."""
    before = _persisted_ids(jsc)
    out = df.localCheckpoint(eager=True)
    try:
        return out, [int(out._jdf.queryExecution().analyzed().rdd().id())]
    except Exception:
        return out, [k for k in _persisted_ids(jsc) if k not in before]


def connected_components(pairs: DataFrame, left_col: str = "doc_id_1",
                         right_col: str = "doc_id_2",
                         max_iterations: int = 50,
                         check_every: int = 2) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every
    node is labeled with the minimum id reachable from it, so each
    duplicate cluster gets one canonical representative (the SURVEY
    AI8 'LSH + connected components' tail).

    Iterative min-label propagation as DataFrame ops: each round every
    node takes the min of its own label and its neighbors' labels;
    converges in O(diameter) rounds. The convergence count job runs
    only every ``check_every`` rounds (each check is a full extra job,
    so probing every round doubles the job count for long chains).
    Near-dup clusters are small and dense, so diameter is tiny; for
    general graphs at 100 TB the same loop runs with checkpointing
    every few rounds to cut lineage.

    Storage discipline (the RRF-leak class of bug): the edge list is
    materialized ONCE — an unmaterialized ``edges`` re-executes the
    entire upstream pair generation (shingle index / cosine
    cross-join) on every round's join (measured 15.5s -> 2.6s for
    semantic_dedup at sf0.1) — and every localCheckpoint's blocks are
    explicitly released the moment they are superseded; only the
    final round's blocks survive, backing the returned
    lineage-truncated frame.

    Raises RuntimeError if the loop exhausts ``max_iterations`` without
    converging — partially-propagated labels are NOT canonical ids and
    must never be returned silently.

    Returns (doc_id, component_id).
    """
    jsc = pairs.sparkSession.sparkContext._jsc

    edges = (
        pairs.select(F.col(left_col).alias("a"), F.col(right_col).alias("b"))
        .union(pairs.select(F.col(right_col).alias("a"), F.col(left_col).alias("b")))
        .distinct()
    )
    edges, edge_ids = _eager_checkpoint(edges, jsc)

    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    # delta propagation (round 14 — VERDICT r13 #6): only nodes whose
    # label CHANGED last round need to propagate this round — an
    # unchanged neighbor's label was already folded into every
    # out-neighbor the round after it last changed, and labels only
    # decrease, so re-sending it is a provable no-op (identical
    # per-round labels, identical fixpoint — pinned by
    # test_cc_delta_rounds_equal_full_propagation). Round 1 starts
    # from every node. The changed flag is computed INSIDE the
    # round's one aggregate (own-row label vs min), so the build side
    # of the edge join shrinks each round at zero extra exchanges —
    # on dense near-dup graphs the exchanged label volume drops to
    # the still-moving frontier.
    changed = labels
    prev_ids: list[int] = []
    last_ids: list[int] = []
    converged = False
    try:
        for i in range(1, max_iterations + 1):
            # min over {own label} ∪ {changed neighbors' labels} as
            # ONE union+groupBy — the former three-shuffle round (edge
            # join, neighbor-min groupBy, left-join back to labels)
            # carried the label frame through two extra exchanges per
            # round; the union needs no exchange and the self-row
            # makes the left-join's coalesce fallback unnecessary
            # (identical fixpoint: a node with no in-edges keeps its
            # own label as the group's only row). Guide §2.4.
            updated = (
                labels.select("node", "label",
                              F.lit(True).alias("_own"))
                .unionByName(
                    edges.join(changed, edges["b"] == changed["node"])
                    .select(F.col("a").alias("node"), "label",
                            F.lit(False).alias("_own")))
                .groupBy("node")
                .agg(F.min("label").alias("label"),
                     (F.min("label")
                      < F.max(F.when(F.col("_own"), F.col("label"))))
                     .alias("_chg"))
            )
            # cut lineage per round
            updated, last_ids = _eager_checkpoint(updated, jsc)
            if i % check_every == 0 or i == max_iterations:
                # the changed count reads the round's own checkpoint
                # (the flag came out of the aggregate) — no join
                # against the previous labels needed
                if updated.filter("_chg").count() == 0:
                    labels = updated.select("node", "label")
                    converged = True
                    break
            # `updated` is fully materialized (eager) and the
            # convergence check above has already read `labels`, so
            # the superseded round's blocks are unreachable — release.
            _release_persistent(jsc, prev_ids)
            prev_ids = last_ids
            labels = updated.select("node", "label")
            changed = updated.filter("_chg").select("node", "label")
    finally:
        # the edge checkpoint and all superseded rounds are dead on
        # every exit path (success, non-convergence, error); on
        # failure the last round's blocks go too — nothing is returned
        _release_persistent(jsc, edge_ids + prev_ids)
        if not converged:
            _release_persistent(jsc, last_ids)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; labels would be partially propagated"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit_j = sign of the sum
    of (+1/-1) votes from bit j of the token's 64-bit hash. The hash
    is two independent md5-derived 32-bit halves (bits 0-31 from hex
    chars 1-8, bits 32-63 from chars 9-16) so DuckDB reproduces every
    bit exactly (see md5_hash32). One projection, no UDF."""
    # explode -> hash each token once -> 64 conditional-sum aggregates
    # (an array-aggregate per bit would re-hash the token array 64x).
    # Both the vote list and the shift+OR assembly are built as PARSED
    # SQL strings instead of chained Column operators (round 14 — the
    # same construction lever as _mh_sig_agg_exprs: the 64 votes x ~7
    # py4j round-trips each plus the 64-term OR chain were ~1.7 s of
    # driver time per call; the parsed trees are identical, pinned by
    # test_simhash_expr_built_equals_column_formulation)
    exploded = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).select(
        F.col(id_col),
        md5_hash32(F.col("_t"), hex_offset=1).alias("_lo"),
        md5_hash32(F.col("_t"), hex_offset=9).alias("_hi"),
    )
    votes = [
        F.expr(
            "sum(CASE WHEN (shiftright({src}, {sh}) & 1) = 1 "
            "THEN 1 ELSE -1 END) AS v_{j}".format(
                src="_lo" if j < 32 else "_hi", sh=j % 32, j=j))
        for j in range(bits)
    ]
    with_votes = exploded.groupBy(id_col).agg(*votes)
    # assemble via shift+OR: 1<<63 overflows a long literal, shiftleft
    # wraps — the left-associative | chain matches the old Column fold
    sig = " | ".join(
        ["CAST(0 AS BIGINT)"]
        + [f"shiftleft(CAST(CASE WHEN v_{j} > 0 THEN 1 ELSE 0 END"
           f" AS BIGINT), {j})" for j in range(bits)])
    return with_votes.select(F.col(id_col),
                             F.expr(f"({sig}) AS simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Banding: split the 64-bit signature into (max_hamming+1) chunks —
    any pair within the radius must agree exactly on >= 1 chunk
    (pigeonhole), so the join key is (chunk_index, chunk_value), never
    a cross join. Pairs are verified with the true Hamming distance.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sig = simhash(docs, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    )
    chunk_rows = [
        F.struct(
            F.lit(ci).alias("ci"),
            F.shiftrightunsigned(F.col("simhash"), ci * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("cv"),
        )
        for ci in range(chunks)
    ]
    keyed = sig.select(
        "_id", "simhash", F.explode(F.array(*chunk_rows)).alias("ch")
    ).select("_id", "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    cand = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_id_1"),
            F.col("b._id").alias("doc_id_2"),
            F.col("a.simhash").alias("_s1"),
            F.col("b.simhash").alias("_s2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2")))
    return (
        cand.select("doc_id_1", "doc_id_2", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _whitespace_toks(docs: DataFrame, text_col: str,
                     id_col: str) -> DataFrame:
    """(_id, _tok): the shared whitespace tokenization (NULL text =
    empty) that keys the ExactSubstr tiers AND the chunking operator
    (operators/curation.py) — one definition so a tokenization tweak
    can never desynchronize chunk boundaries from span/dedup keys."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_tok"),
    )


def _dup_span_frames(docs: DataFrame, *, n: int, min_count: int,
                     text_col: str, id_col: str
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared ExactSubstr span pipeline — (toks, exploded spans,
    checkpointed duplicated-span list) — used by BOTH the measure tier
    (:func:`duplicated_span_stats`) and the action tier
    (:func:`cut_duplicated_spans`): the two must stay keyed
    identically (same tokenization, same ``xxhash64`` span key, same
    ``min_count`` rule, same skew-splittable checkpointed build side)
    or stats would report spans the cut no longer removes. NULL text
    is treated as empty.

    The lazy localCheckpoint on the dup-span list is NOT for reuse —
    it decouples the join-back's build side from its aggregate
    lineage. With the HashAggregate as the join child, AQE's
    OptimizeSkewedJoin is structurally inapplicable (it only rewrites
    joins whose children are bare shuffle stages — splitting an
    aggregate's partition would split its groups), so a boilerplate
    span hot enough to matter could never be skew-split once the dup
    list outgrows broadcast. Checkpointed, the forced-shuffle plan
    becomes Sort(Exchange(ExistingRDD)) on the build side and the hot
    probe-side partition splits (pinned in pytest with
    production-shaped thresholds); the cost is one re-exchange of the
    DISTINCT-duplicated-span list — tiny by construction."""
    toks = _whitespace_toks(docs, text_col, id_col)
    k = F.size("_tok")
    starts = F.when(k >= n, F.sequence(F.lit(1), k - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.slice(F.col("_tok"), i, n)).alias("gh"),
        ),
    )
    exploded = (
        toks.select("_id", F.explode(spans).alias("_g"))
        .select("_id", F.col("_g.pos").alias("_pos"),
                F.col("_g.gh").alias("_gh"))
    )
    dup_spans = (
        exploded.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("_gh")
        .localCheckpoint(eager=False)
    )
    return toks, exploded, dup_spans


def duplicated_span_stats(docs: DataFrame, *, n: int = 8,
                          min_count: int = 2, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Span-level exact-substring duplication stats — the ExactSubstr
    tier of the dedup family (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": remove any span that repeats
    verbatim in the corpus). Document-level tiers (exact / Jaccard /
    MinHash / SimHash / embedding) miss boilerplate that is pasted
    INTO otherwise-unique documents; this operator measures it so a
    filter (or a span cutter) can act on it.

    A span is a run of ``n`` consecutive whitespace tokens; it is
    *duplicated* when the identical token run occurs ``min_count`` or
    more times corpus-wide (cross-document and intra-document repeats
    both count, as in the paper's suffix-array formulation). Per
    document, returns

      (doc_id, n_tokens, dup_ngrams, dup_covered, dup_ratio)

    where ``dup_ngrams`` is the number of duplicated span starts,
    ``dup_covered`` the number of token positions lying under at least
    one duplicated span (interval union, not sum — overlapping spans
    are not double counted), and ``dup_ratio = dup_covered /
    n_tokens`` (rounded to 6). Documents with fewer than ``n`` tokens
    report zeros.

    100 TB shape — two exchanges, no Python, no driver traffic:

    1. positioned spans are built per document with one ``transform``
       over an index sequence against a MATERIALIZED token array (the
       Catalyst no-CSE-in-lambdas rule, see
       :func:`shingles_from_tokens`), each span keyed by
       ``xxhash64`` of the token slice (8-byte shuffle key instead of
       the span text; collisions are the same ~1e-11 bet the LSH index
       takes);
    2. corpus-wide occurrence counts come from a
       ``groupBy(span_hash).count()`` whose partial aggregation
       collapses even a pathologically frequent boilerplate span
       map-side, so ITS exchange carries one row per DISTINCT span;
       the duplicated subset joins back to the exploded spans —
       AQE broadcasts it when small (the audited sf plan: 2
       exchanges, no sort-merge join), and at a scale where it must
       shuffle instead, a residual hot key is AQE-skew-splittable.
       The first-draft COUNT window partitioned by the hash had
       neither property: WindowExec ships every occurrence of a hot
       span to one task and buffers the partition in an
       ExternalAppendOnlyUnsafeRowArray even when the function is
       just COUNT;
    3. surviving (duplicated) spans group back to their document —
       one more exchange, carrying ONLY duplicated spans, typically a
       small fraction of the corpus;
    4. the interval union is per-document array math
       (``flatten(transform(starts, s -> sequence(s, s+n-1)))`` then
       ``array_distinct``), bounded by n * dup_starts <= n * doc
       tokens;
    5. per-doc token counts LEFT JOIN the coverage frame so
       duplication-free documents still report zeros; AQE broadcasts
       the coverage side when it is small.

    Unlike the suffix-array formulation this bounds duplicate
    detection at spans of exactly ``n`` tokens (longer duplicates
    appear as runs of duplicated n-spans and are fully covered by the
    interval union; duplicates shorter than ``n`` are ignored) — the
    standard shingle relaxation of ExactSubstr, chosen because it is
    embarrassingly parallel and needs no global suffix order."""
    toks, exploded, dup_spans = _dup_span_frames(
        docs, n=n, min_count=min_count, text_col=text_col, id_col=id_col)
    dup = exploded.join(dup_spans, "_gh")
    covered = F.size(F.array_distinct(F.flatten(F.transform(
        F.col("_starts"), lambda s: F.sequence(s, s + F.lit(n - 1))
    ))))
    cov = (
        dup.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_dup_ngrams"),
             F.collect_list("_pos").alias("_starts"))
        .select("_id", "_dup_ngrams", covered.alias("_dup_covered"))
    )
    counts = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .cast("long").alias("n_tokens"),
    )
    return (
        counts.join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce("_dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
            F.coalesce("_dup_covered", F.lit(0)).cast("long").alias("dup_covered"),
            F.round(
                F.coalesce("_dup_covered", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"), 6
            ).alias("dup_ratio"),
        )
    )


def cut_duplicated_spans(docs: DataFrame, *, n: int = 8,
                         min_count: int = 2, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """The ACTION tier of ExactSubstr (round 9): where
    :func:`duplicated_span_stats` measures corpus-duplicated spans,
    this operator REMOVES them — Lee et al. 2022's actual
    intervention: every token position lying under at least one
    duplicated ``n``-token span is cut and the survivors are
    re-joined, deduplicating boilerplate pasted INTO otherwise-unique
    documents without dropping the documents.

    Returns (doc_id, n_tokens, n_kept, text_cut): original token
    count, surviving token count, and the cleaned text (empty string
    when everything was boilerplate — never NULL, matching
    ``array_join`` semantics on both engines). NULL input text is
    treated as empty.

    100 TB shape — identical to the stats operator through the
    duplicated-span join-back (same span keying, same distinct-span
    partial-agg exchange, same checkpointed build side keeping the
    hot-key path AQE-splittable), then ONE more id-keyed join carries
    the covered-position array back to the token arrays and the cut
    itself is per-row array math in codegen: keep-index filter +
    element_at transform, no explode of the surviving text."""
    toks, exploded, dup_spans = _dup_span_frames(
        docs, n=n, min_count=min_count, text_col=text_col, id_col=id_col)
    cov = (
        exploded.join(dup_spans, "_gh")
        .groupBy("_id")
        .agg(F.collect_list("_pos").alias("_starts"))
        .select("_id", F.array_distinct(F.flatten(F.transform(
            F.col("_starts"),
            lambda s: F.sequence(s, s + F.lit(n - 1))))).alias("_cov"))
    )
    kept = F.expr(
        "CASE WHEN _cov IS NULL THEN _tok"
        " ELSE transform(filter(sequence(1, size(_tok)),"
        "                       i -> NOT array_contains(_cov, i)),"
        "                i -> element_at(_tok, i)) END"
    )
    return (
        toks.join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_tok").cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, " ").alias("text_cut"),
        )
    )
