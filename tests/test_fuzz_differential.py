"""Seeded differential fuzzing: random tables + shared ANSI SQL run on
BOTH Spark (via temp view) and DuckDB, results hash-compared — the
property tier of the test strategy (SURVEY.md §5). Deterministic
(seed=20260813) so failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

SEEDS = (20260813, 7, 424242)
N_ROWS = 400

TEMPLATES = [
    # aggregation with filters and arithmetic
    """SELECT g, count(*) AS n, CAST(sum(i) AS BIGINT) AS s_i,
              round(sum(x), 6) AS s_x, round(avg(x), 6) AS a_x
       FROM t WHERE i % 3 <> 0 GROUP BY g""",
    # window frames incl. the signal-view trailing frame; NULLS FIRST
    # is explicit because Spark defaults ASC NULLS FIRST while DuckDB
    # defaults ASC NULLS LAST, and x joins the key to make the total
    # order (hence frame contents) engine-independent
    """SELECT g, i,
              CAST(row_number() OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x) AS BIGINT) AS rn,
              round(avg(x) OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), 6) AS m4,
              round(stddev_samp(x) OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), 6) AS sd4
       FROM t""",
    # case/coalesce/nullif scalar pipeline
    """SELECT i, coalesce(nullif(trim(s), ''), '(blank)') AS s_norm,
              CASE WHEN x > 0.5 THEN 'hi' WHEN x > 0.2 THEN 'mid' ELSE 'lo' END AS band
       FROM t""",
    # self-join aggregation
    """SELECT a.g, count(*) AS pairs
       FROM t a JOIN t b ON a.g = b.g AND a.i < b.i
       GROUP BY a.g""",
    # distinct + having-style filter via subquery
    """SELECT g, n_distinct FROM (
         SELECT g, CAST(count(DISTINCT i) AS BIGINT) AS n_distinct FROM t GROUP BY g
       ) WHERE n_distinct > 3""",
    # FILTER-clause conditional aggregates (pivot building block)
    """SELECT g,
              count(*) FILTER (WHERE i > 0)  AS n_pos,
              count(*) FILTER (WHERE i < 0)  AS n_neg,
              round(sum(x) FILTER (WHERE x > 0), 6) AS s_pos
       FROM t GROUP BY g""",
    # set algebra with distinct semantics
    """SELECT i FROM (
         SELECT i FROM t WHERE g < 5
         INTERSECT
         SELECT i FROM t WHERE g >= 5
       ) EXCEPT SELECT i FROM t WHERE i % 7 = 0""",
    # anti-join via NOT EXISTS (NULL-safe, unlike NOT IN)
    """SELECT g, CAST(count(*) AS BIGINT) AS n
       FROM t a
       WHERE NOT EXISTS (SELECT 1 FROM t b WHERE b.g = a.g AND b.i = -a.i AND b.i <> 0)
       GROUP BY g""",
    # rollup margins with NULL group keys
    """SELECT g, coalesce(s, '(null)') AS s_k, count(*) AS n,
              CAST(sum(i) AS BIGINT) AS s_i
       FROM t GROUP BY ROLLUP (g, coalesce(s, '(null)'))""",
    # uncorrelated scalar subqueries in projection and predicate
    """SELECT g, CAST(count(*) AS BIGINT) AS n,
              (SELECT max(i) FROM t) AS global_max
       FROM t WHERE i > (SELECT min(i) + 5 FROM t) GROUP BY g""",
]


def _random_table(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    strings = ["", " ", "a", "b ", " c", "dd", None]
    return pd.DataFrame({
        "g": [rng.randint(0, 9) for _ in range(N_ROWS)],
        "i": [rng.randint(-50, 50) for _ in range(N_ROWS)],
        "x": [round(rng.uniform(-1, 1), 6) for _ in range(N_ROWS)],
        "s": [rng.choice(strings) for _ in range(N_ROWS)],
    })


@pytest.fixture(scope="module", params=SEEDS, ids=[f"seed{s}" for s in SEEDS])
def engines(spark, request):
    pdf = _random_table(request.param)
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    con = duckdb.connect()
    con.register("t", pdf)
    yield spark, con
    con.close()


def _canon(df: pd.DataFrame) -> list[str]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
            return "<N>"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "<N>"
        if isinstance(v, float):
            # engines may differ by 1 ulp before their own round(x, 6);
            # canonicalize a level coarser so boundary straddles collapse
            return repr(round(v, 4))
        return str(v)

    rows = ["\x1f".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows)


@pytest.mark.parametrize("sql", TEMPLATES, ids=[f"tmpl{i}" for i in range(len(TEMPLATES))])
def test_spark_matches_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas()
    d = con.execute(sql).fetchdf()
    assert len(s) == len(d)
    cs, cd = _canon(s), _canon(d)
    diffs = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
    assert not diffs, f"{len(diffs)} diffs; first spark={cs[diffs[0]]!r} duckdb={cd[diffs[0]]!r}"


# ---------------------------------------------------------------------------
# Independent-recompute property tests (round 10): when an operator and
# its DuckDB oracle SHARE a derived formula, the hash gate is blind to
# formula bugs — the round-9 chunking gap-regime bug survived the gate
# because the oracle mirrored the bad chunk-count expression. These
# tests recompute each round-9 operator's contract in naive pure
# Python (different formulation, no shared expressions) over seeded
# random fixtures and tiny real slices.
# ---------------------------------------------------------------------------


def _naive_chunks(text, chunk, stride):
    """Naive chunking by simulation, NOT by the closed-form count:
    walk starts 0, stride, 2*stride, ... appending while in-text,
    stopping once a chunk reaches the tail (contiguous regime) or the
    next start would fall past the text (gap regime)."""
    toks = (text or "").split(" ")
    k = len(toks)
    out, s = [], 0
    while True:
        out.append((len(out), s + 1, toks[s:s + chunk]))
        if s + chunk >= k:
            break
        s += stride
        if s >= k:
            break
    return out


def test_chunk_documents_matches_naive_simulation(spark):
    import random as _r

    rng = _r.Random(20260815)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        chunk_documents)

    rows = [(i, " ".join(f"w{rng.randint(0, 5)}"
                         for _ in range(rng.randint(0, 40))) or None)
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # contiguous, exact-tiling, and gap regimes, plus stride 1
    for chunk, stride in ((4, 3), (4, 4), (4, 6), (3, 1), (1, 5)):
        got = {(r["doc_id"], r["chunk_id"], r["pos"], r["n_tokens"],
                r["chunk_text"])
               for r in chunk_documents(docs, chunk_tokens=chunk,
                                        stride=stride).collect()}
        want = {(i, cid, pos, len(ct), " ".join(ct))
                for i, text in rows
                for cid, pos, ct in _naive_chunks(text, chunk, stride)}
        assert got == want, (chunk, stride)


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_leakage_safe_split_matches_union_find_and_md5(spark):
    """Clusters via union-find (not min-label propagation), buckets
    via hashlib md5 (not Spark's md5), bounds via per-fraction
    integer accumulation — three independent reformulations."""
    import hashlib
    import random as _r

    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        leakage_safe_split)

    rng = _r.Random(11)
    ids = list(range(300))
    pairs = [(a, b) for a in ids for b in ids
             if a < b and rng.random() < 0.004]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    for fractions in ({"train": 0.8, "val": 0.1, "test": 0.1},
                      {"s1": 0.3, "s2": 0.3, "s3": 0.4}):
        got = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
               leakage_safe_split(docs, pdf,
                                  fractions=dict(fractions)).collect()}
        uf = _UnionFind()
        for a, b in pairs:
            uf.union(a, b)
        names = list(fractions)
        acc, bounds = 0, []
        for nm in names:
            acc += round(fractions[nm] * 1_000_000)
            bounds.append(acc)
        for i in ids:
            cl = uf.find(i) if i in uf.p else i
            bkt = int(hashlib.md5(str(cl).encode()).hexdigest()[:8],
                      16) % 1_000_000
            want = names[-1]
            for nm, hi in zip(names[:-1], bounds[:-1]):
                if bkt < hi:
                    want = nm
                    break
            assert got[i] == (cl, want), (i, got[i], cl, want)


def test_exact_substr_cut_matches_naive_coverage(spark):
    """Span-cut coverage recomputed by brute force: every 8-token
    window occurring >= 2 times anywhere in the corpus covers its
    positions; text_cut keeps exactly the uncovered tokens, in
    order."""
    import random as _r
    from collections import Counter

    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        cut_duplicated_spans)

    rng = _r.Random(5)
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(80):
        words = [f"w{rng.randint(0, 30)}" for _ in range(rng.randint(0, 25))]
        if i % 3 == 0:
            at = rng.randint(0, max(0, len(words)))
            words[at:at] = boiler.split(" ")
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_cut"])
           for r in cut_duplicated_spans(docs).collect()}

    L = 8
    toks = {i: (t or "").split(" ") if t else [""] for i, t in rows}
    counts = Counter(" ".join(t[i:i + L])
                     for t in toks.values()
                     for i in range(len(t) - L + 1))
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - L + 1):
            if counts[" ".join(t[s:s + L])] >= 2:
                covered.update(range(s, s + L))
        kept = [w for p, w in enumerate(t) if p not in covered]
        assert got[i] == (len(t), len(kept), " ".join(kept)), i


def test_keep_representatives_matches_naive_pagerank(spark):
    """Components via union-find, centrality via a dense pure-Python
    power iteration (dict arithmetic, no DataFrames), keeper = max
    rounded score then min id — recomputed end to end."""
    import random as _r

    from snowflake_medtech_vigilance_lakehouse_spark.operators.graph import (
        keep_representatives)

    rng = _r.Random(3)
    ids = list(range(60))
    pairs = sorted({(min(a, b), max(a, b))
                    for a in ids for b in ids
                    if a != b and rng.random() < 0.02})
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    got = {r["doc_id"]: (r["component_id"], r["score"], r["keep"])
           for r in keep_representatives(pdf).collect()}

    uf = _UnionFind()
    edges = []
    for a, b in pairs:
        uf.union(a, b)
        edges += [(a, b), (b, a)]
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        contrib = {}
        for s, dd in edges:
            contrib[dd] = contrib.get(dd, 0.0) + r[s] / outdeg[s]
        r = {v: 0.15 / n + 0.85 * contrib.get(v, 0.0) for v in nodes}
    want_scores = {v: round(r[v], 6) for v in nodes}
    for v in nodes:
        comp = uf.find(v)
        assert got[v][0] == comp
        assert abs(got[v][1] - want_scores[v]) <= 2e-6, v
    # exactly-one-keep per cluster, max rounded score, min-id tiebreak
    by_comp: dict[int, list[int]] = {}
    for v in nodes:
        by_comp.setdefault(uf.find(v), []).append(v)
    for comp, members in by_comp.items():
        best = min(members, key=lambda v: (-want_scores[v], v))
        for v in members:
            assert got[v][2] == (v == best), (comp, v)


def test_cdf_curation_decisions_match_naive_replay(spark, tmp_path):
    """The CDF curation loop's keep/reject trail recomputed by a
    naive single-threaded replay: python MinHash signatures (shared
    coefficient TABLE, independent pipeline — per-shingle md5 hash,
    per-coefficient min, band tuples), band-candidate generation by
    dict lookup, hash-set Jaccard verification, and the min-canonical
    keep rule with store absorption between commits."""
    import hashlib
    import random as _r

    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        curation as cu, dedup as dd)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)

    rng = _r.Random(9)
    vocab = [f"tok{j}" for j in range(12)]
    base_texts = [" ".join(rng.choice(vocab) for _ in range(12))
                  for _ in range(10)]
    rows = []
    for i in range(60):
        if rng.random() < 0.5:
            t = base_texts[rng.randrange(len(base_texts))]
            if rng.random() < 0.5:
                t += " extra"
        else:
            t = " ".join(rng.choice(vocab) for _ in range(12))
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    store = str(tmp_path / "mh")
    tbl = str(tmp_path / "tbl")
    dd.build_minhash_store(docs.filter("doc_id % 4 = 3"), store,
                           num_hashes=32, bands=16)
    for c in (0, 1, 2):
        dl.write_delta(docs.filter(f"doc_id % 4 = {c}"), tbl,
                       mode="overwrite" if c == 0 else "append")
    assert cu.curate_minhash_from_cdf(spark, tbl, store,
                                      threshold=0.5) == [0, 1, 2]
    got = {(r["doc_id"], int(r["tick"])): r["keep"] for r in
           spark.read.parquet(store + "_decisions").collect()}

    # --- naive replay ---
    coeffs = dd._hash_coeffs(32)
    p = dd._MERSENNE_P
    rowsz = 32 // 16

    def shingle_hashes(text):
        w = text.split(" ")
        grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                for g in grams}

    def sig(hs):
        return [min((h * a + b) % p for h in hs) for a, b in coeffs]

    def bands(s):
        return [(bi, tuple(s[bi * rowsz:(bi + 1) * rowsz]))
                for bi in range(16)]

    hsets = {i: shingle_hashes(t) for i, t in rows}
    store_ids = sorted(i for i, _ in rows if i % 4 == 3 and hsets[i])
    want = {}
    for c in (0, 1, 2):
        batch = sorted(i for i, _ in rows if i % 4 == c)
        cand = set()
        for i in batch:
            if not hsets[i]:
                continue
            bi = bands(sig(hsets[i]))
            for j in store_ids + [j for j in batch
                                  if j != i and hsets[j]]:
                if set(bi) & set(bands(sig(hsets[j]))):
                    a, b = hsets[i], hsets[j]
                    jac = len(a & b) / len(a | b)
                    if round(jac, 6) >= 0.5:
                        cand.add((min(i, j), max(i, j))
                                 if j in batch else (j, i))
        rejected = set()
        for x, y in cand:
            # historical partner always wins; within a commit the
            # larger id loses
            rejected.add(y if (x in store_ids or x < y) else x)
        for i in batch:
            want[(i, c)] = i not in rejected
        store_ids += sorted(i for i in batch
                            if want[(i, c)] and hsets[i])
    assert got == want
