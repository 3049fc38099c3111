"""Incremental search-index maintenance (AI7 -> AI5): the Cortex
`target_lag` analog for the BM25 index specifically.

New documents stream in; each refresh appends their postings
(doc_id, term, tf, dl) to the index table via the checkpointed file
stream, so a scheduled availableNow run processes only the delta.
Scoring then runs off the postings table with corpus stats computed
at query time (one tiny aggregate) — the index grows append-only and
never needs a full rebuild. At 100 TB the postings table is
partitioned/bucketed by term so a query touches only its terms'
buckets."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .liveness import live_filter


def postings_stream(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Streaming docs -> (doc_id, term, tf, dl) postings delta."""
    toks = F.split(F.col(text_col), " ")
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def refresh_postings(stream_docs: DataFrame, out_path: str,
                     checkpoint: str, *,
                     bucketed: bool = False,
                     n_buckets: int = 64) -> StreamingQuery:
    """Append the pending documents' postings to the index table
    (availableNow = one scheduled refresh tick; the checkpoint makes
    reruns incremental). Aggregation inside a streaming query needs
    complete/update mode, so the per-doc grouping runs in foreachBatch
    — each batch is a closed set of whole documents.

    Each tick ALSO appends one row of corpus-stats deltas
    (n_docs, sum_dl) to the ``{out_path}_stats`` sidecar — the
    Lucene-norms analog: query-time N/avgdl then aggregate the tiny
    sidecar (O(ticks) rows) instead of DISTINCT-scanning the whole
    postings table, which is what keeps indexed scoring free of any
    corpus-wide pass at 100 TB.

    The index contract is (doc_id, term) UNIQUE across ticks — df is
    then a plain count and N/avgdl a plain sidecar sum. That holds
    only if each document is ingested by exactly ONE tick, so the
    refresh ENFORCES it instead of documenting it: a ``{out_path}_docs``
    sidecar records each tick's doc_ids (one thin column — the same
    O(N_docs) scale as the doc-length norms every Lucene segment
    keeps), and a tick whose batch carries an already-ingested doc_id
    is REFUSED before anything lands. Re-ingesting a changed document
    is an update, which this append-only layout cannot express —
    stale postings for the doc's removed terms would linger whatever
    df did — so it must be a rebuild, not a silently absorbed tick.
    The check skips the current epoch's own sidecar dir, so an
    at-least-once replay of a crashed tick still passes.

    ``bucketed=True`` lays the index out partitioned by the ``tb``
    term bucket (see :func:`with_term_buckets`) so queries prune to
    their terms' directories."""

    def _append(batch: DataFrame, epoch: int) -> None:
        # per-tick OVERWRITE directories make the foreachBatch sink
        # idempotent under at-least-once replay: a batch that reran
        # after a crash-before-checkpoint replaces its own tick dir
        # instead of appending duplicate postings/stats (which would
        # silently double tf/df/N/avgdl). Readers see `tick` as one
        # more discovered partition column, which every consumer
        # ignores.
        _require_tick_layout(out_path)
        _require_tick_layout(out_path + "_stats")
        _refuse_reingested_docs(batch, out_path, epoch)
        post = postings_stream(batch)
        tick = f"{out_path}/tick={epoch}"
        if bucketed:
            (with_term_buckets(post, n_buckets).write.mode("overwrite")
             .partitionBy("tb").parquet(tick))
        else:
            post.write.mode("overwrite").parquet(tick)
        write_corpus_stats(batch, out_path + "_stats", tick=epoch)
        (batch.select("doc_id").distinct().write.mode("overwrite")
         .parquet(f"{out_path}_docs/tick={epoch}"))

    _require_checkpoint_owns_ticks(
        checkpoint, [out_path, out_path + "_stats", out_path + "_docs"])
    return (
        stream_docs.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def write_corpus_stats(docs: DataFrame, stats_path: str, *,
                       text_col: str = "text",
                       tick: int | None = None,
                       minus: DataFrame | None = None) -> None:
    """Append one (n_docs, sum_dl) delta row for ``docs`` to the
    stats sidecar — THE definition of the sidecar contract (schema +
    whitespace tokenization), shared by the refresh loop, the bench,
    and the tests so no copy can drift. ``tick`` selects the
    idempotent per-tick overwrite dir; None = a one-shot overwrite
    (batch-built indexes).

    ``minus`` (round 12 — the churn tier) subtracts a commit's DEAD
    documents: their preimage text carries the exact token counts the
    original ingest added, so a churn tick's delta row is
    (+live, -dead) and :func:`corpus_stats_from_sidecar` stays one
    plain sum — N/avgdl track the mutated corpus exactly with no
    corpus-wide pass."""
    def _signed(df: DataFrame, w: int) -> DataFrame:
        return df.select(
            F.lit(w).cast("long").alias("_w"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("_dl"))

    rows = _signed(docs, 1)
    if minus is not None:
        rows = rows.unionByName(_signed(minus, -1))
    out = rows.agg(
        F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("n_docs"),
        F.sum(F.col("_w") * F.col("_dl")).alias("sum_dl"))
    dst = stats_path if tick is None else f"{stats_path}/tick={tick}"
    out.write.mode("overwrite").parquet(dst)


def read_postings(spark, out_path: str) -> DataFrame:
    """Serve-side read of a refresh-maintained postings index: the
    (doc_id, term, tf, dl) rows that are LIVE under the
    ``{out_path}_tombstones`` sidecar (round 12 — a doc whose ingest
    tick is older than a tombstone for it is dead; the postimage
    re-ingested at the tombstone's own commit version or later
    serves). Without a sidecar this is a plain read — the steady
    state pays nothing. The churn-sized tombstone frame broadcasts;
    term/bucket pruning applies downstream as before (the liveness
    join is keyed on doc_id and preserves the ``tb`` partition
    column when present)."""
    from .liveness import live_filter

    posts = live_filter(spark.read.parquet(out_path),
                        out_path + "_tombstones",
                        F.col("doc_id"), F.col("tick"))
    return posts.drop("tick")


def corpus_stats_from_sidecar(spark, stats_path: str) -> DataFrame:
    """1-row (n_docs, avgdl) frame from the refresh sidecar — a scan
    of O(refresh ticks) tiny rows, never of the corpus."""
    s = spark.read.parquet(stats_path)
    return s.agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        (F.sum("sum_dl").cast("double")
         / F.sum("n_docs").cast("double")).alias("avgdl"),
    )


def with_term_buckets(postings: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Add the ``tb`` term-bucket column (pmod(xxhash64(term), n)) the
    index table is PARTITIONED by on disk. A query then prunes to its
    terms' buckets before any scan — at 100 TB this is the difference
    between reading ~df(term) rows and reading the whole postings
    table (``prune_term_buckets`` is the read-side half)."""
    return postings.withColumn(
        "tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))


def prune_term_buckets(postings: DataFrame, terms: tuple[str, ...],
                       n_buckets: int = 64) -> DataFrame:
    """Partition-prune a bucket-partitioned postings table to the
    query terms' buckets. The ``tb`` predicate is a literal IN over
    the partition column, so the parquet source skips every other
    bucket directory at planning time (zero I/O); the exact ``term``
    filter inside the surviving buckets still applies downstream."""
    buckets = sorted({
        b for (b,) in
        postings.sparkSession.createDataFrame(
            [(str(t),) for t in terms], "t string")
        .select(F.pmod(F.xxhash64("t"), F.lit(n_buckets))).collect()
    })
    return postings.filter(F.col("tb").isin(buckets)).drop("tb")


def bm25_from_postings(postings: DataFrame, terms: tuple[str, ...],
                       k1: float = 1.2, b: float = 0.75,
                       doc_stats: DataFrame | None = None) -> DataFrame:
    """Score documents against query terms from the postings table —
    no access to raw text; this is what serves after incremental
    refreshes. Returns (doc_id, bm25).

    ``doc_stats`` is an optional 1-row (n_docs, avgdl) frame — pass
    :func:`corpus_stats_from_sidecar` so corpus stats cost O(refresh
    ticks); without it they are derived by DISTINCT-scanning the
    postings (exact but corpus-wide — fine for tests, wrong at 100 TB
    when ``postings`` was already term-pruned).

    Relies on the index contract that postings are (doc_id, term)
    UNIQUE — ``refresh_postings`` aggregates per (doc, term) within a
    tick and ENFORCES one-tick-per-document via the ``_docs`` sidecar
    (a re-ingested doc_id refuses the tick, see
    :func:`_refuse_reingested_docs`) — so df is a plain count, not a
    two-phase distinct (one exchange round fewer on the interactive
    serving path)."""
    n_and_avg = doc_stats if doc_stats is not None else (
        postings.select("doc_id", "dl").distinct().agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    rel = postings.filter(F.col("term").isin(*terms))
    df_per_term = rel.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        rel.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                      / (F.col("df") + F.lit(0.5)))
                * F.col("tf").cast("double") * F.lit(k1 + 1.0)
                / (F.col("tf").cast("double") + F.lit(k1) * (
                    F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
            ).alias("_s"),
        )
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("_s"), 6).alias("bm25"))


def _ticked_dirs(tick_dirs: list[str],
                 file_prefix_root: str | None = None) -> list[str]:
    """The subset of ``tick_dirs`` that already hold ``tick=`` data
    (plus ``file_prefix_root`` when it holds ``tickN-`` stamped files)
    — shared lineage-detection for the two maintenance entry points'
    ownership guards."""
    import os
    import re

    owned = []
    for d in tick_dirs:
        if os.path.isdir(d) and any(
                n.startswith("tick=") for n in os.listdir(d)):
            owned.append(d)
    if file_prefix_root and os.path.isdir(file_prefix_root):
        pat = re.compile(r"^tick\d+-")
        for root, _, files in os.walk(file_prefix_root):
            if any(pat.match(f) for f in files):
                owned.append(file_prefix_root)
                break
    return owned


def _max_tick_prefix(path: str) -> int:
    """Newest refresh epoch among an IVF layout's ``tick<N>-``
    publication files (-1 when none) — the crash-window evidence the
    CDF-gated maintenance ops compare to the consumed high-water
    mark."""
    import os
    import re

    mx = -1
    for root, _, files in os.walk(path):
        for fn in files:
            m = re.match(r"tick(\d+)-", fn)
            if m:
                mx = max(mx, int(m.group(1)))
    return mx


def _require_checkpoint_owns_ticks(checkpoint: str, tick_dirs: list[str],
                                   file_prefix_root: str | None = None) -> None:
    """Refuse to start a refresh whose index already holds tick data
    but whose checkpoint is missing/empty.

    Per-tick overwrite idempotency keys ticks by the foreachBatch
    epoch, which is unique only within ONE checkpoint's lifetime. A
    lost/recreated checkpoint restarts epochs at 0 while the index
    persists: with NEW input, the first tick would silently OVERWRITE
    the prior lineage's tick-0 postings/stats (and the IVF path would
    delete its tick0-* files) while the prior run's later ticks
    survive — undetected data loss plus double-counted tf/df/N/avgdl.
    True at-least-once replay (crash after the tick's writes, before
    the checkpoint commit) keeps the checkpoint's offsets, so it
    passes this guard and the same-epoch overwrite stays idempotent;
    only the epoch-REUSE-across-lineages state is refused."""
    import os

    offsets = os.path.join(checkpoint, "offsets")
    if os.path.isdir(offsets) and os.listdir(offsets):
        return
    owned = _ticked_dirs(tick_dirs, file_prefix_root)
    if owned:
        raise ValueError(
            f"refresh refused: {sorted(set(owned))} hold tick data from "
            f"an earlier refresh lineage, but checkpoint {checkpoint} is "
            f"empty — a fresh checkpoint restarts epochs at 0 and would "
            f"overwrite/delete the earlier lineage's tick-0 output while "
            f"reprocessing all input. Restore the original checkpoint, "
            f"or rebuild the index from scratch (clear the tick data) "
            f"before refreshing with a new checkpoint")


def _postings_docs_frame(spark, out_path: str) -> DataFrame | None:
    """The postings index's ``_docs`` sidecar as a (doc_id, tick)
    frame — migrating a pre-sidecar index's distinct doc_ids under
    ``tick=-1`` first (epochs are >= 0, so a replay exclusion can
    never skip the backfill). ``None`` when nothing was ever
    ingested. Factored out of :func:`_refuse_reingested_docs` so the
    batched feed-range vet (round 14, :func:`_feed_reinsert_hits`)
    reads the same surface the per-commit guard does."""
    import os

    docs_side = out_path + "_docs"
    _require_tick_layout(docs_side)
    has_docs = os.path.isdir(docs_side) and any(
        n.startswith("tick=") for n in os.listdir(docs_side))
    if not has_docs:
        if os.path.isdir(out_path) and any(
                n.startswith("tick=") for n in os.listdir(out_path)):
            # pre-sidecar index (built before the _docs contract
            # existed): without a backfill every historical doc_id
            # would silently pass the guard while the docstring
            # promises enforcement
            (spark.read.parquet(out_path)
             .select("doc_id").distinct().write.mode("overwrite")
             .parquet(f"{docs_side}/tick=-1"))
        else:
            return None
    return spark.read.parquet(docs_side)


def _refuse_reingested_docs(batch: DataFrame, out_path: str,
                            epoch: int,
                            pending_dead: DataFrame | None = None
                            ) -> None:
    """Enforce the postings contract (each doc_id ingested by exactly
    one tick) at refresh time: join the incoming batch's doc_ids
    against the ``_docs`` sidecar (every prior tick's ids, one thin
    column) and refuse the tick on any hit. The current epoch's own
    dir is excluded so idempotent at-least-once replays pass.

    With a ``{out_path}_tombstones`` sidecar (round 12) only LIVE
    prior ingests count: a doc whose prior tick is older than a
    tombstone for it is dead, so re-inserting it (an update's
    postimage, at the tombstone's own commit or later) is legal —
    the stale postings stay physically present but serve-dead
    (:func:`read_postings`).

    ``pending_dead`` (round-13 ADVICE) is the CURRENT commit's
    dead-key frame, vetted as a tombstone tick at ``epoch`` BEFORE it
    is published — so the caller can refuse an illegal commit without
    having half-absorbed it (the old publish-then-vet order left the
    preimages serve-dead while the postimages and the negative
    ``_stats`` delta never landed)."""
    side = _postings_docs_frame(batch.sparkSession, out_path)
    if side is None:
        return  # brand-new index: nothing ingested yet
    prior = side.filter(F.col("tick") != epoch)
    prior = live_filter(
        prior, out_path + "_tombstones", F.col("doc_id"),
        F.col("tick"),
        pending=None if pending_dead is None else (pending_dead, epoch))
    prior = prior.select("doc_id")
    dups = (batch.select("doc_id").distinct()
            .join(prior, "doc_id").limit(5).collect())
    if dups:
        raise ValueError(
            f"refresh refused: doc_ids {[r[0] for r in dups]}… were "
            f"already ingested by an earlier tick of {out_path}. The "
            f"postings index is append-only per (doc_id, term); "
            f"re-ingesting a document would inflate df/tf/N/avgdl and "
            f"leave stale postings for its removed terms. Rebuild the "
            f"index (or dedupe the input stream) instead")


def _require_tick_layout(path: str) -> None:
    """Refuse to write the per-tick overwrite layout over a
    pre-existing flat append layout: root-level part files next to
    ``tick=N/`` dirs make Spark's partition discovery throw
    'Conflicting directory structures' at SERVE time — fail loudly at
    refresh time instead, naming the migration."""
    import os
    if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)):
        raise ValueError(
            f"{path} holds root-level parquet files (the pre-tick "
            f"append layout); move them under '{path}/tick=-1/' or "
            f"rebuild the index before refreshing with this version")


def assign_ivf_lists(vecs: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Assign vectors to their nearest existing IVF list — the
    quantizer is the persisted centroid sidecar, frozen at build time.

    Distance is squared Euclidean computed as ONE sequential fold of
    (x-c)^2 per (vector, centroid) — the same accumulation order as
    MLlib's dense ``Vectors.sqdist`` loop, so assignments match
    ``KMeansModel.transform`` except where MLlib's norm-trick fast
    path rounds differently on a near-equidistant tie (ties broken by
    list_id here, as in MLlib). n_lists folds per vector — fine for a
    refresh delta; the bulk corpus pays this once, at build.

    Returns (id, _v double-array, _nrm, list_id) — the index row
    layout of :func:`operators.similarity.build_ivf_index`.

    Plan note (round 13, measured): the argmin window LOOKS like it
    shuffles n_lists payload copies per vector, but Spark 3.5+/4.x
    plans the ``row_number() == 1`` filter as a WindowGroupLimit pair
    — a PARTIAL top-1-per-key pass runs map-side BEFORE the exchange,
    so one payload row per vector crosses the wire, same as an
    aggregate would. A ``groupBy(id).min(struct(_d2, list_id, _v,
    _nrm))`` rewrite was built, proven assignment-identical, and
    timed a wash (it plans as SortAggregate — the array-bearing
    buffer is not hash-aggregable — paying the identical local sort
    of the exploded rows; 400k×8 lists at local[32]: window 2.44 s
    vs min-struct 2.56 s vs min_by 2.40 s, fully overlapping reps;
    ``plans/r13/ivf_assign_*.txt``). Kept as the window: same
    exchange volume, same sorts, and WindowGroupLimit is the shape
    the plan audit has pinned since the build rounds."""
    from ..functions.vectors import l2_norm
    from pyspark.sql.window import Window

    # NULL vectors sort first under a NULL distance (asc puts NULLs
    # first) and would land in list 0 as dead rows — drop them, same
    # as the build-time exclusion in build_ivf_index
    v = vecs.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
    )
    diff2 = F.zip_with("_v", "_ctr", lambda x, c: (x - c) * (x - c))
    scored = (
        v.crossJoin(F.broadcast(centroids.select("list_id", "_ctr")))
        .withColumn("_d2", F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x))
        # a dimension-mismatched vector yields NULL _d2 against EVERY
        # centroid (zip_with pads with NULL); without this filter it
        # would sort first (asc puts NULLs first) and be filed into
        # list 0 as a dead row — the build-time KMeans fit would have
        # rejected it, so the streaming path must drop it too
        .filter(F.col("_d2").isNotNull())
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2").asc(), F.col("list_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "_v", "_nrm", "list_id")
    )


def compact_index_ticks(spark, path: str, *, keep_ticks: int = 1,
                        key: str = "doc_id",
                        tomb_dir: str | None = None) -> list[int]:
    """Merge old refresh-tick directories into one — the OPTIMIZE for
    the tick-partitioned index layout. ``refresh_postings`` (and the
    ``_stats``/``_growth`` sidecars) accumulate one ``tick=N`` dir per
    refresh forever: every dir is another listing + another parquet
    footer at serve time, so query planning cost grows O(ticks) while
    the data doesn't. This merges every tick below the newest
    ``keep_ticks`` into a single consolidated dir (named for the
    oldest merged tick), preserving rows exactly — readers ignore
    ``tick`` beyond partition discovery, so reader results are
    IDENTICAL across a compaction (pytest-pinned).

    ``keep_ticks >= 1`` (default) never touches the newest tick: only
    the latest uncommitted batch can ever replay under at-least-once,
    so every merged tick is replay-dead and the per-tick overwrite
    idempotency contract is preserved. Term-bucket (``tb=``) hive
    dirs inside ticks are re-partitioned into the consolidated dir.

    Swap discipline: the COMPLETE post-compaction layout is built in
    a staging root first (consolidated dir + hardlinks of every kept
    tick's files — no data copied), then swapped in with two
    directory renames via ``{path}_compact_retired``. A crash before
    the swap leaves the index untouched; between the renames it
    leaves the index path MISSING next to the retired dir — loud and
    recoverable (rename it back), never a silently shrunken index
    (the naive move-ticks-out-then-rename-in order has a window
    where readers see the survivors only). Returns the merged tick
    ids ([] = nothing to do).

    Concurrency: maintenance MUST run with the refresh stream for
    this index stopped (compaction is the scheduled-OPTIMIZE slot).
    The tick listing is re-verified immediately before the swap and
    the run aborts (index untouched) if a new tick committed while
    staging was being built — the naive swap would strand that tick
    in the retired dir and delete it.

    TOMBSTONES (round 12): when the layout carries a churn sidecar
    (``{path}_tombstones``; for a ``_docs`` sidecar path, the parent
    index's), the merge PHYSICALLY APPLIES it to the merged range —
    rows dead under the liveness rule (a tombstone newer than the
    row's tick) are dropped, and the consolidated dir is named for
    the NEWEST merged tick (so surviving rows, re-labeled with it,
    stay on the live side of every tombstone that already let them
    live; the default oldest-tick name would pull re-ingested rows
    back behind the tombstone that freed their doc id). The sidecar
    itself is NOT pruned — entries at or below the merged range are
    spent and kill nothing, and keeping them preserves correctness
    for the sibling ``_docs``/postings dir whichever is compacted
    first; the sidecar is churn-sized, not corpus-sized."""
    import os
    import shutil

    if keep_ticks < 1:
        raise ValueError("keep_ticks must be >= 1 (the newest tick is "
                         "the only one that can replay; it must survive)")
    if not os.path.isdir(path):
        return []
    ticks = sorted(int(d.split("=", 1)[1]) for d in os.listdir(path)
                   if d.startswith("tick="))
    merge = ticks[:-keep_ticks]
    if len(merge) <= 1:
        return []
    if tomb_dir is None:
        # default sidecar resolution: the layout's own, or — for a
        # ``_docs`` sidecar dir — the parent index's; other shared
        # layouts (the MinHash store's ``_hashes``, round 13) pass
        # their family's sidecar and key column explicitly
        tomb_dir = path + "_tombstones"
        if not os.path.isdir(tomb_dir) and path.endswith("_docs"):
            tomb_dir = path[:-len("_docs")] + "_tombstones"
    df = spark.read.parquet(path).filter(F.col("tick").isin(merge))
    merged_tick = merge[0]
    if os.path.isdir(tomb_dir):
        df = live_filter(df, tomb_dir, F.col(key), F.col("tick"))
        merged_tick = merge[-1]
    # tb-partitioning is inferred from the MERGED FRAME's schema, not
    # from tick={merge[0]}'s directory listing (round-13 ADVICE): a
    # prior compaction can leave an all-dead merged range behind, and
    # a listing-based probe of such an empty dir would say "no tb="
    # while the kept ticks keep the partitioning — the next
    # consolidated write would then mix tb-as-data-column leaves with
    # tb-as-partition-dir leaves and partition discovery throws. The
    # read schema carries the partition column whenever ANY leaf dir
    # is partitioned, so it cannot be fooled by an empty member.
    has_tb = "tb" in df.columns
    root = path + "_compact_stage"
    shutil.rmtree(root, ignore_errors=True)
    if df.isEmpty():
        # every merged row is tombstone-dead: write NO consolidated
        # dir (an empty tick dir carries no tb= subdirs and poisons
        # the next compaction's layout, per above) — the merged range
        # simply vanishes from the layout
        os.makedirs(root, exist_ok=True)
    else:
        writer = df.drop("tick").write.mode("overwrite")
        if has_tb:
            writer = writer.partitionBy("tb")
        writer.parquet(os.path.join(root, f"tick={merged_tick}"))
    # hardlink every SURVIVING entry (kept ticks + any non-tick files)
    # into the staging root so it is the complete next layout
    merged_names = {f"tick={t}" for t in merge}
    for entry in os.listdir(path):
        if entry in merged_names:
            continue
        src = os.path.join(path, entry)
        dst = os.path.join(root, entry)
        def _place(s: str, t: str) -> None:
            try:
                os.link(s, t)  # no data copied where links work
            except OSError:  # link-restricted FS (NFS/CIFS/FUSE)
                shutil.copy2(s, t)

        if os.path.isdir(src):
            for sub, _, files in os.walk(src):
                rel = os.path.relpath(sub, src)
                os.makedirs(os.path.join(dst, rel), exist_ok=True)
                for fn in files:
                    _place(os.path.join(sub, fn),
                           os.path.join(dst, rel, fn))
        else:
            _place(src, dst)
    # last-moment re-verification: the staging root was built from the
    # entry listing; a refresh tick that committed since then exists
    # in `path` but NOT in staging, so the swap would silently drop it
    # into the retired dir. Abort with the index untouched instead —
    # the contract is that the refresh stream is stopped during
    # maintenance, and this turns a violation into a loud error.
    now_ticks = sorted(int(d.split("=", 1)[1]) for d in os.listdir(path)
                       if d.startswith("tick="))
    if now_ticks != ticks:
        shutil.rmtree(root, ignore_errors=True)
        raise RuntimeError(
            f"compact_index_ticks aborted: {path} changed while the "
            f"compacted layout was being staged (a refresh tick "
            f"committed concurrently). Stop the refresh stream for "
            f"this index and re-run compaction — the index was left "
            f"untouched")
    retired = path + "_compact_retired"
    shutil.rmtree(retired, ignore_errors=True)
    os.rename(path, retired)
    os.rename(root, path)
    shutil.rmtree(retired)
    return merge


def _rewrite_docids_live(spark, path: str) -> None:
    """Rewrite the chunk index's ``{path}_docids`` bridge sidecar to
    its LIVE rows in one consolidated file set (round 12 — the sidecar
    lifecycle VERDICT r11 #3 flagged: refresh ticks accumulate
    tick-prefixed files forever, and churn leaves dead mapping rows
    whose doc ids would be refused for re-insert once the tombstones
    they die under are cleared). Preserves the bucketed ``_db=``
    layout (the decode join's directory pruning) and the ``_tick``
    values of surviving rows (liveness under any remaining tombstone
    is evaluated against them). Staged write + two renames, same
    crash discipline as the index swap. No-op when the sidecar does
    not exist (a plain, non-chunk IVF index)."""
    import os
    import shutil

    side = path + "_docids"
    if not os.path.isdir(side):
        return
    rows = live_filter(spark.read.parquet(side), path + "_tombstones",
                       F.col("_dkey"), F.col("_tick"))
    stage, retired = side + "_stage", side + "_retired"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(retired, ignore_errors=True)
    # localCheckpoint: the staged write's lineage reads the directory
    # the swap replaces (same discipline as compact_split_store) —
    # the sidecar is (id, _dkey, _tick) thin rows, doc-count sized
    (rows.localCheckpoint(eager=True).write.mode("overwrite")
     .partitionBy("_db").parquet(stage))
    os.rename(side, retired)
    os.rename(stage, side)
    shutil.rmtree(retired)


def prune_spent_tombstones(spark, out_path: str, *,
                           sibling_dirs: list[str] | None = None
                           ) -> list[int]:
    """Drop tombstone ticks that can no longer kill anything (round
    12 — the postings layout's tombstones are deliberately NOT pruned
    by :func:`compact_index_ticks`, because a tombstone spent for the
    postings dir may still govern the ``_docs`` sidecar until IT is
    compacted too). A tombstone at tick T kills rows with tick < T;
    once EVERY dir the sidecar governs has been compacted past T
    (its oldest surviving tick >= T), T is fully spent — run this
    after compacting all of them. ``sibling_dirs`` lists the governed
    dirs (default: the postings pair ``[out_path, out_path+"_docs"]``;
    the MinHash store passes its buckets/hashes pair, round 13).
    Returns the pruned tick ids ([] = nothing prunable). Driver-side
    directory arithmetic only; the ``spark`` arg is unused but kept
    for maintenance-op signature uniformity."""
    import os
    import shutil

    tomb_dir = out_path + "_tombstones"
    if not os.path.isdir(tomb_dir):
        return []

    def _min_tick(d: str) -> int | None:
        if not os.path.isdir(d):
            return None
        ticks = [int(n.split("=", 1)[1]) for n in os.listdir(d)
                 if n.startswith("tick=")]
        return min(ticks) if ticks else None

    dirs = sibling_dirs if sibling_dirs is not None else \
        [out_path, out_path + "_docs"]
    floors = [t for t in (_min_tick(d) for d in dirs) if t is not None]
    if not floors:
        return []
    floor = min(floors)
    pruned = []
    for n in sorted(os.listdir(tomb_dir)):
        if n.startswith("tick=") and int(n.split("=", 1)[1]) <= floor:
            shutil.rmtree(os.path.join(tomb_dir, n))
            pruned.append(int(n.split("=", 1)[1]))
    if not any(n.startswith("tick=") for n in os.listdir(tomb_dir)):
        shutil.rmtree(tomb_dir)
    return pruned


def compact_ivf_index(spark, path: str, *,
                      checkpoint: str | None = None) -> dict:
    """OPTIMIZE for a :func:`~..operators.similarity.build_ivf_index`
    layout maintained by refresh ticks (round 12): rewrite every
    inverted list to its LIVE rows in consolidated files — physically
    applying the ``{path}_tombstones`` sidecar, folding the
    ``tick<N>-`` publication files a tick cadence accumulates, and
    rewriting the ``{path}_docids`` bridge (chunk indexes) to live
    rows in one file set per bucket. Unlike
    :func:`maintain_ivf_index` this does NOT refit the quantizer:
    rows keep their list assignment, so it is cheap enough for a
    routine schedule, and the ``_growth`` drift ledger is preserved
    (appended mass is still appended mass to the frozen quantizer,
    wherever its bytes live). The ``_radii`` sidecar is recomputed
    from the surviving rows — deletes can only have SHRUNK each
    list's true radius, so this tightens the probe bound the
    max-merge refresh path can only over-state.

    Serving results are IDENTICAL across the compaction
    (pytest-pinned): dead rows were already serve-invisible, and the
    rewritten files read as epoch -1 with the spent tombstones
    cleared. Swap discipline matches the other maintenance ops
    (staged write, rename old away, rename new in — a crash between
    the renames leaves ``{path}_compact_old`` next to a missing
    index, loud and recoverable).

    MUST run with the refresh stopped and its newest tick COMMITTED:
    a tick in the at-least-once crash window would replay after its
    rows were folded into un-prefixed files and duplicate them. The
    guard reads the CDF state sidecar when present, else the
    streaming ``checkpoint`` (pass it for stream-maintained indexes);
    an index with tick files but neither source refuses. Returns
    {rows_before, rows_after, tombstones_applied}."""
    import json as _json
    import os
    import shutil

    from ..operators.similarity import (_ivf_radii_frame,
                                        _tombstones_applied_through,
                                        _write_tombstones_applied,
                                        apply_ivf_tombstones)

    def _tick_files() -> frozenset:
        out = set()
        for root, _, files in os.walk(path):
            for fn in files:
                if fn.startswith("tick") and fn.endswith(".parquet"):
                    out.add(os.path.join(os.path.relpath(root, path), fn))
        return frozenset(out)

    def _tomb_ticks() -> frozenset:
        d = path + "_tombstones"
        if not os.path.isdir(d):
            return frozenset()
        return frozenset(n for n in os.listdir(d)
                         if n.startswith("tick="))

    ticked = _tick_files()
    tombs_at_gate = _tomb_ticks()
    _applied_at_gate = _tombstones_applied_through(path)
    has_tombs = os.path.isdir(path + "_tombstones")
    if not ticked and not has_tombs:
        return {"rows_before": 0, "rows_after": 0,
                "tombstones_applied": 0}
    state_path = os.path.join(path + "_cdf_state", "state.json")
    if not os.path.exists(state_path):
        # an index maintained by the CURATION lineage keeps its mark
        # under _curate_cdf_state (round 13) — one lineage per index
        # is already guard-enforced, so whichever sidecar exists is
        # the authoritative high-water mark
        alt = os.path.join(path + "_curate_cdf_state", "state.json")
        if os.path.exists(alt):
            state_path = alt
    if ticked:
        max_tick = _max_tick_prefix(path)
        if os.path.exists(state_path):
            with open(state_path) as f:
                hwm = _json.load(f)["last_commit_version"]
            if max_tick > hwm:
                raise ValueError(
                    f"compact_ivf_index refused: tick {max_tick} of "
                    f"{path} is newer than the consumed high-water "
                    f"mark {hwm} (a crashed refresh's uncommitted "
                    f"tick) — folding it would duplicate its rows on "
                    f"replay. Re-run the refresh, then compact")
        elif checkpoint is not None:
            offsets = os.path.join(checkpoint, "offsets")
            batches = [int(f) for f in os.listdir(offsets)
                       if f.isdigit()] if os.path.isdir(offsets) else []
            latest = max(batches, default=-1)
            if latest < 0 or not os.path.exists(
                    os.path.join(checkpoint, "commits", str(latest))):
                raise ValueError(
                    f"compact_ivf_index refused: streaming batch "
                    f"{latest} of {checkpoint} is uncommitted (crash "
                    f"window) — re-run the refresh, then compact")
        else:
            raise ValueError(
                f"compact_ivf_index: {path} holds refresh-tick files "
                f"but no {state_path}; pass the refresh stream's "
                f"checkpoint so the crash-window guard can run")

    raw = spark.read.parquet(path)
    rows_before = raw.count()
    live = apply_ivf_tombstones(spark, path, raw)
    if live.isEmpty():
        raise ValueError(
            f"compact_ivf_index refused: every row of {path} is "
            f"tombstone-dead — an empty index cannot serve; rebuild "
            f"from the source table instead")
    stage, old = path + "_compact_stage", path + "_compact_old"
    for d in (stage, stage + "_radii", old, old + "_radii"):
        shutil.rmtree(d, ignore_errors=True)
    live.write.mode("overwrite").partitionBy("list_id").parquet(stage)
    if not os.path.isdir(stage):
        raise RuntimeError(
            f"compact_ivf_index requires a driver-visible POSIX index "
            f"path; {stage} is not readable from the driver")
    staged = spark.read.option("basePath", stage).parquet(stage)
    rows_after = staged.count()
    (_ivf_radii_frame(staged, spark.read.parquet(path + "_centroids"))
     .coalesce(1).write.mode("overwrite").parquet(stage + "_radii"))
    # applied-through marker (round-12 review fix): the staged rows
    # read as epoch -1 after the swap, so if the crash window between
    # the swap and the sidecar rmtree is hit, the already-applied
    # tombstones must not re-kill them at serve time. Stamped INTO
    # the staged dir so it travels with the rename.
    if has_tombs or _applied_at_gate >= 0:
        applied_through = max(
            _applied_at_gate,
            max((int(n.split("=", 1)[1]) for n in tombs_at_gate),
                default=-1))
        _write_tombstones_applied(stage, applied_through)
    # last-moment re-verification (same contract as the other
    # maintenance swaps): a refresh tick that committed while staging
    # would be absent from the staged layout — and a DELETE-ONLY
    # commit writes a tombstone tick with NO index files (round-12
    # review fix), so the tombstone listing is compared too; folding
    # from the pre-delete frame and then clearing the sidecar would
    # resurrect the deleted doc. Abort, index untouched.
    if _tick_files() != ticked or _tomb_ticks() != tombs_at_gate:
        for d in (stage, stage + "_radii"):
            shutil.rmtree(d, ignore_errors=True)
        raise RuntimeError(
            f"compact_ivf_index aborted: {path} gained refresh ticks "
            f"or tombstone ticks while the compacted layout was "
            f"staging. Stop the refresh stream and re-run — the "
            f"index was left untouched")
    for suf in ("", "_radii"):
        if os.path.isdir(path + suf):
            os.rename(path + suf, old + suf)
        os.rename(stage + suf, path + suf)
    if has_tombs:
        _rewrite_docids_live(spark, path)
        shutil.rmtree(path + "_tombstones", ignore_errors=True)
    for suf in ("", "_radii"):
        shutil.rmtree(old + suf, ignore_errors=True)
    return {"rows_before": rows_before, "rows_after": rows_after,
            "tombstones_applied": rows_before - rows_after}


def maintain_ivf_index(spark, path: str, checkpoint: str, *,
                       threshold: float = 0.2,
                       id_col: str = "vec_id", seed: int = 42) -> bool:
    """Rebuild-on-evidence for the persisted IVF index — the policy
    the ``_growth`` sidecar exists for (and which, through round 6,
    was documented but never executable). The quantizer is frozen at
    build time; every :func:`refresh_ivf_index` tick appends vectors
    under it, so the true centroids drift and recall decays silently.
    This op turns the sidecar's evidence into action:

    1. read ``_growth`` (O(ticks x lists) tiny rows) and the per-list
       row counts of the index (a metadata-ish aggregate over the
       partitioned layout);
    2. appended mass per list = growth; built mass = current - growth.
       Trigger when the GLOBAL appended/built ratio crosses
       ``threshold``, or any single list's does (a list absorbing
       disproportionate appends is exactly where the frozen quantizer
       is most wrong);
    3. on trigger: re-run ``build_ivf_index`` over the index's own
       rows (same n_lists, fresh k-means) into a staging dir, swap it
       in with two directory renames, clear ``_growth`` (drift is now
       zero). The refresh checkpoint stays valid — it tracks INPUT
       files, and the rebuild folds all previously-appended ticks
       into the new base, so the next tick continues from the same
       offsets with a fresh growth ledger.

    Returns True iff a rebuild ran. The swap is staged (rename old
    away, rename new in), not single-syscall-atomic: a crash between
    the renames leaves ``{path}_retired`` next to a missing index —
    loud and recoverable (rename it back), never silently wrong.
    Like the refresh loop, requires a driver-visible POSIX path.

    ``checkpoint`` is the REFRESH loop's checkpoint location: a
    rebuild folds every appended tick into un-prefixed base files, so
    a tick that could still REPLAY (its writes landed, its checkpoint
    commit didn't — the at-least-once crash window) would be
    re-appended after the rebuild and duplicate its vectors. The
    maintenance op therefore refuses to run while the newest batch is
    uncommitted — re-run the refresh (which replays idempotently into
    the tick layout) and retry. The checkpoint state is captured at
    that gate and RE-VERIFIED immediately before the swap: a tick
    that commits during the rebuild would be absent from the staged
    index, so the swap aborts loudly (live index untouched) instead
    of silently dropping it — run maintenance with the refresh
    stream stopped."""
    import os
    import shutil

    from ..operators.similarity import build_ivf_index

    growth_path = path + "_growth"
    if not os.path.isdir(growth_path):
        return False  # no appends since build: nothing to weigh
    growth = (spark.read.parquet(growth_path)
              .groupBy("list_id").agg(F.sum("n_appended").alias("appended")))
    current = (spark.read.parquet(path)
               .groupBy("list_id").agg(F.count(F.lit(1)).alias("total")))
    stats = (current.join(growth, "list_id", "left")
             .select("list_id",
                     F.coalesce("appended", F.lit(0)).alias("appended"),
                     "total")
             .collect())  # n_lists rows — metadata scale
    appended = sum(r["appended"] for r in stats)
    built = sum(r["total"] - r["appended"] for r in stats)
    if appended == 0:
        return False
    per_list = max(
        r["appended"] / max(1, r["total"] - r["appended"]) for r in stats)
    if appended / max(1, built) < threshold and per_list < threshold:
        return False

    # the checkpoint gate protects only the REBUILD branch: below
    # threshold the function returns False harmlessly whatever the
    # checkpoint state, so a periodic maintenance job keeps running
    # through the at-least-once crash window instead of erroring.
    # ``checkpoint`` is the refresh lineage's OWN commit evidence:
    # the streaming loop's checkpoint dir, or (round 12) a CDF
    # refresher's ``{path}_cdf_state`` root — detected by its
    # state.json, gated by comparing the newest published tick
    # prefix to the consumed high-water mark.
    import json as _json

    cdf_state = os.path.join(checkpoint, "state.json")
    offsets = os.path.join(checkpoint, "offsets")
    if os.path.exists(cdf_state):
        with open(cdf_state) as f:
            hwm = _json.load(f)["last_commit_version"]
        newest = _max_tick_prefix(path)
        if newest > hwm:
            raise ValueError(
                f"maintain_ivf_index: tick {newest} of {path} is newer "
                f"than the consumed high-water mark {hwm} (a crashed "
                f"refresh's uncommitted commit) — folding it into a "
                f"rebuild would duplicate it on replay. Re-run the "
                f"refresh, then retry maintenance")

        def _ckpt_state():
            with open(cdf_state) as f:
                return f.read()
    else:
        batches = [int(f) for f in os.listdir(offsets) if f.isdigit()] \
            if os.path.isdir(offsets) else []
        if not batches:
            raise ValueError(
                f"maintain_ivf_index: {growth_path} holds appended ticks "
                f"but checkpoint {checkpoint} is empty — wrong checkpoint "
                f"path, or the index belongs to a lost refresh lineage")
        latest = max(batches)
        if not os.path.exists(os.path.join(checkpoint, "commits",
                                           str(latest))):
            raise ValueError(
                f"maintain_ivf_index: refresh batch {latest} is "
                f"uncommitted (crash window) — folding its tick into a "
                f"rebuild would duplicate it on replay. Re-run the "
                f"refresh to let the batch replay idempotently, then "
                f"retry maintenance")

        def _ckpt_state():
            commits = os.path.join(checkpoint, "commits")
            return (
                frozenset(os.listdir(offsets)) if os.path.isdir(offsets)
                else frozenset(),
                frozenset(os.listdir(commits)) if os.path.isdir(commits)
                else frozenset(),
            )

    from ..operators.similarity import apply_ivf_tombstones

    ckpt_before = _ckpt_state()
    # rebuild from LIVE rows only (round 12): a churned index holds
    # tombstone-dead copies of updated/deleted vectors; folding them
    # into the rebuild — whose fresh files read as epoch -1 — would
    # let the surviving tombstones kill the UPDATED copies too. The
    # rebuild is the physical apply: dead rows are dropped here and
    # the spent tombstone sidecar is cleared after the swap.
    live = apply_ivf_tombstones(spark, path, spark.read.parquet(path))
    n_lists = spark.read.parquet(path + "_centroids").count()
    corpus = live.select(id_col, "_v")
    stage = path + "_rebuild"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(stage + "_centroids", ignore_errors=True)
    shutil.rmtree(stage + "_radii", ignore_errors=True)
    # a quantized index carries _v8/_qs/_n8 code columns; the rebuild
    # must preserve the layout (the codes are derivable from _v, so
    # re-quantizing at rebuild is the natural refresh of the scalar
    # quantizer's sample) — without this the staged index would lose
    # the codes and silently downgrade knn_ivf_indexed_compressed to
    # a loud "carries no int8 codes" error after routine maintenance
    build_ivf_index(corpus, stage, n_lists=n_lists, id_col=id_col,
                    vec_col="_v", seed=seed,
                    quantize_int8="_v8" in live.columns)
    # applied-through marker (round-12 review fix, same window as
    # compact_ivf_index): the rebuilt files read as epoch -1, so a
    # crash between the swap and the tombstone rmtree must not let
    # the already-applied tombstones re-kill the rebuilt copies
    from ..operators.similarity import (_tombstones_applied_through,
                                        _write_tombstones_applied)
    tomb_root = path + "_tombstones"
    if os.path.isdir(tomb_root) or _tombstones_applied_through(path) >= 0:
        ticks = [int(n.split("=", 1)[1]) for n in
                 (os.listdir(tomb_root) if os.path.isdir(tomb_root)
                  else []) if n.startswith("tick=")]
        _write_tombstones_applied(
            stage, max(_tombstones_applied_through(path),
                       max(ticks, default=-1)))
    # last-moment re-verification before the swap: the rebuild read
    # the index as of the gate; a refresh tick that committed DURING
    # the (slow) rebuild appended vectors the staged index does not
    # contain, so swapping would silently drop them. Abort with the
    # live index untouched — the maintenance contract is no
    # concurrent refresh, and this turns a violation into a loud
    # error instead of data loss.
    if _ckpt_state() != ckpt_before:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(stage + "_centroids", ignore_errors=True)
        shutil.rmtree(stage + "_radii", ignore_errors=True)
        raise RuntimeError(
            f"maintain_ivf_index aborted: checkpoint {checkpoint} "
            f"advanced while the rebuild was staging (a refresh tick "
            f"committed concurrently); the staged index would drop "
            f"that tick's vectors. Stop the refresh stream and re-run "
            f"maintenance — the live index was left untouched")
    retired = path + "_retired"
    # "" must swap first (the serve root); sidecars follow. A
    # pre-radii live index simply has no _radii to retire — the
    # staged rebuild always writes one, upgrading the layout.
    for suf in ("", "_centroids", "_radii"):
        shutil.rmtree(retired + suf, ignore_errors=True)
        if os.path.isdir(path + suf):
            os.rename(path + suf, retired + suf)
        os.rename(stage + suf, path + suf)
    # spent tombstones: the rebuild folded only live rows, so keeping
    # the sidecar would re-kill the rebuilt (epoch -1) copies of every
    # updated key. The _docids bridge is rewritten to live rows FIRST
    # — with the tombstones gone, a dead doc's stale mapping row would
    # otherwise count as live again and refuse its own re-insert.
    if os.path.isdir(path + "_tombstones"):
        _rewrite_docids_live(spark, path)
        shutil.rmtree(path + "_tombstones", ignore_errors=True)
    shutil.rmtree(growth_path, ignore_errors=True)
    for suf in ("", "_centroids", "_radii"):
        shutil.rmtree(retired + suf, ignore_errors=True)
    return True


def _ivf_update_radii(assigned: DataFrame, centroids: DataFrame,
                      path: str, *,
                      batch_rad: dict | None = None) -> None:
    """Keep the ``{path}_radii`` sidecar (the exactness lever of
    ``embedding_neardup_indexed``'s probe bound) fresh across refresh
    ticks: max-merge the batch's per-list normalized-space radii into
    the persisted n_lists-row sidecar. Runs BEFORE the tick publishes,
    so a crash leaves the radius an OVER-estimate (probe fan-out
    grows, exactness never breaks) and the max-merge replays
    idempotently. A NULL radius means "probe unconditionally"
    (zero-norm centroid) and stays NULL. A pre-radii index (no
    sidecar) is left alone — writing batch-only radii would
    UNDER-state the lists and silently break the bound; the serving
    op's fallback recompute covers such indexes until a rebuild
    writes the sidecar."""
    import os

    from ..operators.similarity import _ivf_radii_frame

    if not os.path.isdir(path + "_radii"):
        return
    spark = assigned.sparkSession
    try:
        old = {r["list_id"]: r["rad"] for r in
               spark.read.parquet(path + "_radii").collect()}
    except Exception:
        return  # unreadable (crash mid-rewrite): serving falls back
    if batch_rad is None:
        batch_rad = {r["list_id"]: r["rad"] for r in
                     _ivf_radii_frame(assigned, centroids).collect()}
    merged = dict(old)
    for lid, rad in batch_rad.items():
        prev = merged.get(lid)
        if lid not in merged:
            merged[lid] = rad
        elif prev is None or rad is None:
            merged[lid] = None
        else:
            merged[lid] = max(prev, rad)
    # driver-direct sidecar write (n_lists rows already on the
    # driver): the createDataFrame+coalesce(1) route was measured at
    # 3.4 s PER COMMIT for 8 rows — see write_local_sidecar
    from ..sources.writers import write_local_sidecar
    write_local_sidecar(
        spark, sorted(merged.items()),
        [("list_id", "int"), ("rad", "double")], path + "_radii")


def _idx_has_sq8(spark, path: str) -> bool:
    """Whether the index at ``path`` carries the quantize_int8 code
    columns — a BUILD-time property, so one parquet footer answers it.
    The old per-tick ``spark.read.parquet(path).schema`` listed every
    file of the (growing) ticked index on each absorb; the replay
    ledgers pay this once per commit, so read a single footer via
    pyarrow and fall back to Spark's inference only when the path is
    not driver-listable (remote FS)."""
    import os

    try:
        import pyarrow.parquet as pq
        for root, _, files in os.walk(path):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(root, fn))
                    return "_v8" in sch.names
        return False
    except Exception:
        return "_v8" in spark.read.parquet(path).schema.fieldNames()


def _ivf_append_batch(batch: DataFrame, path: str, epoch: int, *,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """One refresh tick of the persisted IVF index — shared by the
    streaming loop (:func:`refresh_ivf_index`, epoch = foreachBatch
    epoch) and the change-feed loop (:func:`refresh_ivf_from_cdf`,
    epoch = Delta commit version): assign the batch to its nearest
    frozen lists, stage, record growth, publish under deterministic
    ``tick{epoch}-`` file names — an at-least-once replay of the same
    epoch overwrites itself instead of appending duplicates."""
    import os
    import shutil

    spark = batch.sparkSession
    centroids = spark.read.parquet(path + "_centroids")
    assigned = assign_ivf_lists(batch, centroids, id_col, vec_col)
    if _idx_has_sq8(spark, path):
        # a quantize_int8 index: appended ticks must carry the same
        # int8 code columns or the compressed tier would read their
        # _v8/_n8 as NULL and silently never surface appended vectors
        # (quantization is row-local, so the build-time expressions
        # apply to a refresh delta unchanged)
        from ..operators.similarity import with_sq8_codes
        assigned = with_sq8_codes(assigned)
    # idempotent publish into the existing list_id layout (a tick=
    # level above list_id= would break partition discovery): stage
    # the tick, clear any files a crashed earlier attempt of THIS
    # tick left behind, then move under deterministic tick-stamped
    # names. The staged write is the ONLY execution of the assign
    # crossJoin+window subtree: emptiness is read from the staged dir
    # listing, and ONE per-list aggregate over the staged parquet
    # (tiny, list_id-partitioned) feeds both the radius merge and the
    # growth sidecar — the old isEmpty-then-radii-then-write order
    # executed the same subtree three times per tick, and at bench
    # scale the replay ledgers were measured driver-job-bound on
    # exactly those repeats (guide §2.4: remove recomputation).
    _require_tick_layout(path + "_growth")
    stage = os.path.join(path + "_stage", f"tick={epoch}")
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(stage)
    if not os.path.isdir(stage):
        # the move below is driver-side POSIX; on an object store
        # the walk would silently find nothing and the tick's
        # vectors would vanish while the growth sidecar claims
        # they were served
        raise RuntimeError(
            f"the IVF refresh requires a driver-visible POSIX "
            f"index path; {stage} is not readable from the driver")
    if not any(e.startswith("list_id=") for e in os.listdir(stage)):
        # an empty tick (empty streaming microbatch, or a curation
        # commit with zero keeps) publishes NOTHING: partitionBy
        # wrote no partition dirs for zero rows, so the staged
        # re-read below would fail schema inference — and an empty
        # growth tick dir would break the sidecar read the same way.
        # Skipping is replay-idempotent (same epoch, same empty
        # input); nothing under `path` has been touched yet.
        shutil.rmtree(stage, ignore_errors=True)
        return
    staged = spark.read.parquet(stage)
    # ONE per-list aggregate over the staged tick answers BOTH
    # sidecars (round 13: the replay loops are driver-job-bound, so
    # the separate radii job + growth-write job per commit were pure
    # per-commit overhead): per list, the appended row count, the max
    # normalized-space distance over scorable (_nrm > 0) members —
    # identical to _ivf_radii_frame's rad, which filtered those rows
    # before aggregating — and the scorable count that decides
    # whether the list participates in the radii merge at all (a
    # list with only zero-norm members was ABSENT from the old radii
    # frame and must stay out of the merge). Both sidecars are
    # n_lists-row driver data, so they write driver-side
    # (write_local_sidecar — same layout the Spark writer produced).
    from ..functions.vectors import l2_norm
    cn = l2_norm(F.col("_ctr"))
    chat = F.when(cn > 0, F.transform(F.col("_ctr"), lambda x: x / cn))
    diff2 = F.zip_with(
        F.col("_v"), F.col("_chat"),
        lambda v, c: (v / F.col("_nrm") - c) * (v / F.col("_nrm") - c))
    d = F.when(F.col("_nrm") > 0,
               F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x)))
    tick_stats = (
        staged.join(F.broadcast(centroids.select(
            "list_id", chat.alias("_chat"))), "list_id")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_appended"),
             F.max(d).alias("rad"),
             F.sum((F.col("_nrm") > 0).cast("long")).alias("n_scorable"))
        .collect())
    # radius merge BEFORE the publish moves below (crash leaves the
    # sidecar an over-estimate, never under)
    _ivf_update_radii(staged, centroids, path, batch_rad={
        r["list_id"]: r["rad"] for r in tick_stats
        if r["n_scorable"] > 0})
    from ..sources.writers import write_local_sidecar
    write_local_sidecar(
        spark,
        sorted((int(r["list_id"]), int(r["n_appended"]))
               for r in tick_stats),
        [("list_id", "int"), ("n_appended", "long")],
        f"{path}_growth/tick={epoch}")
    prefix = f"tick{epoch}-"
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.startswith(prefix):
                os.remove(os.path.join(root, fn))
    for root, _, files in os.walk(stage):
        rel_dir = os.path.relpath(root, stage)
        for i, fn in enumerate(
                sorted(f for f in files if f.endswith(".parquet"))):
            tgt = os.path.join(path, rel_dir)
            os.makedirs(tgt, exist_ok=True)
            os.replace(os.path.join(root, fn),
                       os.path.join(tgt, f"{prefix}{i:05d}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def _consume_change_feed(spark, delta_path: str, state_root: str, *,
                         op: str, contract: str,
                         tick_dirs: list[str],
                         file_prefix_root: str | None = None,
                         allow_churn: bool = False):
    """Shared CDF scaffolding for the index-from-change-feed
    refreshers: high-water-mark sidecar, lineage-ownership guard,
    maintenance-commit tolerance, and insert-only feed refusal.
    Returns ``(feed, versions, advance)`` — the change-feed frame
    restricted to ``versions`` (the new change-PRODUCING commit
    versions, oldest first; empty when up to date) and the
    crash-safe state writer the caller invokes after each commit's
    tick lands. Factored so a protocol fix lands once, not per
    refresher.

    ``allow_churn=True`` (round 12: the three INDEX refreshers;
    round 13: the curation loops too) skips the insert-only refusal —
    the caller absorbs delete/update_preimage rows as tombstone ticks
    and insert/update_postimage rows as appends. The decision ledgers
    stay append-only audit trails: dead docs simply stop producing
    decisions.

    Three contracts enforced here:

    - **Ownership**: a missing state sidecar over an index that
      already holds tick data means another maintenance lineage
      (the streaming loop, or a CDF lineage whose sidecar was lost)
      owns those ticks — processing Delta commit 0 as epoch 0 would
      silently overwrite the other lineage's tick-0 output, the exact
      loss mode :func:`_require_checkpoint_owns_ticks` refuses for
      the streaming entry. Refused loudly. On a brand-new index the
      sidecar is written (hwm=-1) BEFORE the first tick, so a crash
      between tick publish and state advance replays through the
      guard instead of tripping it.
    - **Maintenance tolerance**: OPTIMIZE / Z-ORDER commits carry
      ``dataChange=false`` and produce no feed rows;
      :func:`delta_lite.change_producing_versions` lets the mark
      advance past them instead of crashing
      :func:`delta_lite.read_change_feed` on a change-free range
      forever after.
    - **Insert-only**: update/delete feeds refuse with the caller's
      ``contract`` message — both index layouts are append-only."""
    import json as _json
    import os

    from ..sources import delta_lite as dl

    state_path = os.path.join(state_root, "state.json")

    def advance(v: int) -> None:
        os.makedirs(state_root, exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"last_commit_version": v}, f)
        os.replace(tmp, state_path)

    hwm = -1
    if os.path.exists(state_path):
        with open(state_path) as f:
            hwm = _json.load(f)["last_commit_version"]
    else:
        owned = _ticked_dirs(tick_dirs, file_prefix_root)
        if owned:
            raise ValueError(
                f"{op} refused: {sorted(set(owned))} hold tick data "
                f"from another maintenance lineage, but no "
                f"{state_root} sidecar exists — consuming the change "
                f"feed from commit 0 would overwrite/collide with "
                f"that lineage's ticks (Delta commit versions vs "
                f"foreachBatch epochs share one tick namespace). "
                f"Drive an index from exactly one maintenance source; "
                f"restore the sidecar or rebuild the index")
    latest = dl._list_versions(delta_path)[-1]
    if latest <= hwm:
        return None, [], advance
    versions = dl.change_producing_versions(
        delta_path, from_version=hwm + 1, to_version=latest)
    if not versions:
        # maintenance-only range: nothing to ingest, but the mark must
        # advance or every subsequent call re-reads (and with the old
        # code, crashed on) the same change-free commits
        advance(latest)
        return None, [], advance
    if hwm == -1:
        advance(-1)  # claim the lineage before the first tick lands
    feed = dl.read_change_feed(spark, delta_path,
                               from_version=hwm + 1, to_version=latest)
    if not allow_churn:
        bad = feed.filter(
            F.col("_change_type") != "insert").limit(1).collect()
        if bad:
            raise ValueError(
                f"{op}: change feed carries '{bad[0]['_change_type']}' "
                f"rows — {contract}")
    return feed, versions, advance


def bootstrap_cdf_state(state_root: str, version: int) -> None:
    """Claim a CDF maintenance lineage for an index BUILT from the
    table's snapshot (round 12): ``build_*_index`` over
    ``read_delta(tbl)`` at head version V covers commits 0..V, so the
    refresher must start consuming at V+1 — without this mark its
    first call would re-ingest the whole snapshot (and the re-ingest
    guards would refuse it loudly). Write the mark IMMEDIATELY after
    the build, before any new table commit. ``state_root`` is the
    refresher's state dir (``{index_path}_cdf_state``); refuses to
    overwrite an existing lineage."""
    import json as _json
    import os

    state_path = os.path.join(state_root, "state.json")
    if os.path.exists(state_path):
        raise ValueError(
            f"{state_root} already holds a CDF lineage; "
            f"bootstrap_cdf_state is only for a freshly built index")
    os.makedirs(state_root, exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"last_commit_version": int(version)}, f)
    os.replace(tmp, state_path)


def _split_churn(feed: DataFrame, version: int) -> tuple[DataFrame, DataFrame]:
    """One commit's change rows split into (dead, live): rows a churn
    tick must tombstone (delete / update_preimage — the pre-change
    copies) and rows it must append (insert / update_postimage).
    Synthesized feeds (commits without explicit cdc) list a rewritten
    file's rows as both delete and insert at the same version — the
    tombstone-at-own-epoch rule keeps the re-appended copy alive, so
    they absorb correctly, just with rewrite-sized work."""
    commit = feed.filter(F.col("_commit_version") == version)
    dead = commit.filter(
        F.col("_change_type").isin("delete", "update_preimage"))
    live = commit.filter(
        F.col("_change_type").isin("insert", "update_postimage"))
    return dead, live


def _feed_commit_stats(feed: DataFrame, *, dim_col: str | None = None,
                       minmax_col: str | None = None
                       ) -> dict[int, dict]:
    """Per-commit row counts of a change feed in ONE job: live rows
    (insert/update_postimage), dead rows (delete/update_preimage),
    and — when ``dim_col`` names an array column — the distinct
    non-null array sizes among the live rows. The replay loops were
    measured driver-job-bound (PLANS.md: 122 jobs / 31.7 task-seconds
    at sf0.1), and three of those jobs per commit were exactly these
    scalars (batch.isEmpty, dead.isEmpty, the dim-uniformity probe);
    one aggregate over the feed range answers all commits at once and
    reads the same bytes the per-commit probes did in total."""
    live = F.col("_change_type").isin("insert", "update_postimage")
    dead = F.col("_change_type").isin("delete", "update_preimage")
    aggs = [F.sum(live.cast("long")).alias("_n_live"),
            F.sum(dead.cast("long")).alias("_n_dead")]
    if dim_col is not None:
        aggs.append(F.collect_set(
            F.when(live & F.col(dim_col).isNotNull(),
                   F.size(dim_col))).alias("_dims"))
    if minmax_col is not None:
        # live-row id range per commit — the identity-bridge domain
        # check reads it from here instead of its own per-commit agg
        aggs.append(F.min(F.when(live, F.col(minmax_col))).alias("_lo"))
        aggs.append(F.max(F.when(live, F.col(minmax_col))).alias("_hi"))

    class _Stats(dict):
        # a change-producing commit with zero feed rows (e.g. an
        # empty append) has no group row; it reads as all-empty, the
        # same outcome the per-commit isEmpty probes produced
        def __missing__(self, v):
            return {"_n_live": 0, "_n_dead": 0, "_dims": [],
                    "_lo": None, "_hi": None}

    return _Stats(
        (r["_commit_version"], r.asDict())
        for r in feed.groupBy("_commit_version").agg(*aggs).collect())


def _feed_reinsert_hits(feed: DataFrame, prior: DataFrame,
                        key_col: str, *, n_examples: int = 5
                        ) -> tuple[dict[int, list], set[int]]:
    """Batched re-insert vet (round 14 — the replay loops are
    driver-job-bound, and the per-commit vet re-scanned the GROWING
    store once per commit; guide §2.4): ONE job answers, for every
    commit of the feed range, which of its inserted keys are LIVE in
    the start-state store at that commit's vet point.

    ``prior`` is the store's (key, epoch) rows — column 1 the key,
    column 2 the long publication epoch — already live-filtered
    against the PERSISTED tombstone sidecar (including any
    applied-through marker), but NOT against the feed's own deletes.
    Those are re-derived here from the feed itself, exactly as the
    per-commit vets saw them: a commit's dead keys act as a tombstone
    tick at that commit's version for its own vet (the ``pending``
    mechanism) and for every later commit's vet (the published tick).
    A prior row with epoch == the vetted commit's version is the
    commit's own replayed absorb and never counts (the ``tick != v``
    rule).

    Returns ``(hits, infeed)``:

    - ``hits[v]`` = up to ``n_examples`` (sorted) keys of commit v's
      inserted rows that are live in the start-state store at v's vet
      point — the caller raises its re-insert refusal when the loop
      REACHES v (commits before v absorb normally, the same partial
      progress the per-commit vet produced).
    - ``infeed`` = commit versions that insert a key some EARLIER
      commit of the range also inserted. For those the caller must
      fall back to the exact per-commit vet: whether the earlier
      insert is live when v is vetted depends on keep decisions made
      INSIDE the loop, which no upfront pass can know. Valid feeds
      (one insert per key per range) never trip this.
    """
    live = F.col("_change_type").isin("insert", "update_postimage")
    deadc = F.col("_change_type").isin("delete", "update_preimage")
    key_t = feed.schema[key_col].dataType.simpleString()
    ins = feed.filter(live).select(
        F.col(key_col).alias("_k"),
        F.col("_commit_version").cast("long").alias("_v"))
    dels = feed.filter(deadc).select(
        F.col(key_col).alias("_k"),
        F.col("_commit_version").cast("long").alias("_dv"))
    pr = prior.select(F.col(prior.columns[0]).alias("_k"),
                      F.col(prior.columns[1]).cast("long").alias("_e"))
    # store-side hits: a prior row is visible to commit v's vet iff
    # its epoch != v and no feed delete of its key at version <= v is
    # newer than the epoch (the liveness rule, max-tomb decomposed
    # into the persisted sidecar — applied by the caller — and the
    # feed's own deletes — applied here)
    hits_f = (
        ins.join(pr, "_k")
        .filter(F.col("_e") != F.col("_v"))
        .join(dels, "_k", "left")
        .groupBy("_v", "_k", "_e")
        .agg(F.max(F.when(F.col("_dv") <= F.col("_v"),
                          F.col("_dv"))).alias("_md"))
        .filter(F.col("_md").isNull() | (F.col("_md") <= F.col("_e")))
        .select("_v", "_k").distinct()
        .groupBy("_v")
        .agg(F.slice(F.array_sort(F.collect_set("_k")), 1,
                     n_examples).alias("_ks"))
        .select("_v", F.lit("hit").alias("_kind"), "_ks"))
    # in-feed repeats: commit v re-inserting a key an earlier commit
    # of the SAME range inserted (kept-or-rejected is loop state)
    rep_f = (
        ins.groupBy("_k")
        .agg(F.min("_v").alias("_v0"), F.collect_set("_v").alias("_vs"))
        .filter(F.size("_vs") > 1)
        .select(F.explode("_vs").alias("_v"), "_v0")
        .filter(F.col("_v") != F.col("_v0"))
        .select("_v").distinct()
        .select("_v", F.lit("infeed").alias("_kind"),
                F.array().cast(f"array<{key_t}>").alias("_ks")))
    hits: dict[int, list] = {}
    infeed: set[int] = set()
    for r in hits_f.unionByName(rep_f).collect():
        if r["_kind"] == "hit":
            hits[r["_v"]] = list(r["_ks"])
        else:
            infeed.add(r["_v"])
    return hits, infeed


def _write_tombstone_tick(keys: DataFrame, path: str, epoch: int, *,
                          known_nonempty: bool | None = None) -> bool:
    """Publish one commit's dead keys as ``{path}_tombstones/tick=N``
    (round 12 — the churn tier's sidecar): per-tick overwrite, so an
    at-least-once replay replaces its own tick instead of appending
    duplicates (duplicates would be harmless for the max-tick
    liveness rule, but the idempotence discipline is uniform across
    every sidecar). The single column is named ``key`` whatever the
    index id column is called — the liveness filter
    (:func:`~..operators.similarity.apply_ivf_tombstones`,
    :func:`read_postings`) joins it against the layout's own key
    expression. Returns True iff the tick held any dead key (an
    insert-only commit writes nothing — the steady state stays
    sidecar-free and filter-free). ``known_nonempty`` lets a caller
    that already counted the commit's dead rows (the one-job
    :func:`_feed_commit_stats` pass) skip the per-commit emptiness
    probe: False returns immediately, True skips straight to the
    write — same outcome as the probe, one fewer job per commit."""
    if known_nonempty is False:
        return False
    dead = keys.toDF("key").distinct()
    if known_nonempty is None and dead.isEmpty():
        return False
    _require_tick_layout(path + "_tombstones")
    dead.write.mode("overwrite").parquet(f"{path}_tombstones/tick={epoch}")
    return True


def refresh_ivf_from_cdf(spark, delta_path: str, path: str, *,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> list[int]:
    """Maintain the persisted IVF index from a Delta table's CHANGE
    FEED — the vector twin of :func:`refresh_postings_from_cdf`: the
    embeddings table is a governed Delta table and each commit's
    insert rows land as one ``tick<commit_version>-`` publication
    into the frozen-quantizer layout (growth sidecar included, so
    :func:`maintain_ivf_index`'s rebuild-on-evidence applies
    unchanged). A ``{path}_cdf_state`` sidecar holds the consumed
    high-water mark, advanced only after the commit's tick landed —
    a crash in between replays the commit idempotently (same epoch,
    same tick-stamped names).

    CHURN is absorbed (round 12 — r11's loop refused update/delete
    feeds, so one changed vector forced a full rebuild; the
    reference's search service keeps serving changed rows within
    target_lag, /root/reference/README.md:83,117): a commit's
    delete/update_preimage ids land as a ``{path}_tombstones`` tick
    and its insert/update_postimage vectors append as before. Serving
    filters dead rows by the newer-tombstone rule
    (:func:`~..operators.similarity.apply_ivf_tombstones`) — the
    updated copy, re-appended at the tombstone's own commit version,
    survives while every older copy dies. Tombstones are physically
    applied by :func:`compact_ivf_index` or the next
    :func:`maintain_ivf_index` rebuild. The ``_radii`` sidecar only
    max-merges, so after deletes it over-states (probe fan-out grows,
    exactness never breaks) until a rebuild/compaction recomputes it;
    likewise ``_growth`` keeps counting appended mass, so the rebuild
    trigger fires conservatively early under churn. Returns the
    commit versions ingested.

    Drive an index from exactly ONE maintenance source: stream OR
    change feed. The streaming loop's lost-checkpoint guard refuses to
    start over CDF-built ticks (empty checkpoint + tick data =
    refused), and :func:`_consume_change_feed`'s ownership guard
    refuses the other direction (missing state sidecar + existing tick
    data) — mixing would collide the two epoch namespaces
    (foreachBatch epochs vs Delta commit versions)."""
    feed, versions, advance = _consume_change_feed(
        spark, delta_path, path + "_cdf_state",
        op="refresh_ivf_from_cdf", contract="",
        tick_dirs=[path + "_growth"], file_prefix_root=path,
        allow_churn=True)
    stats = _feed_commit_stats(feed) if versions else {}
    for v in versions:
        dead, live = _split_churn(feed, v)
        _write_tombstone_tick(dead.select(id_col), path, v,
                              known_nonempty=stats[v]["_n_dead"] > 0)
        _ivf_append_batch(live.select(id_col, vec_col), path, v,
                          id_col=id_col, vec_col=vec_col)
        advance(v)
    return versions


def refresh_ivf_index(stream_vecs: DataFrame, path: str, checkpoint: str,
                      *, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """``target_lag`` analog for the ANN index (the vector twin of
    :func:`refresh_postings`): an availableNow tick appends the
    pending vectors to their nearest list's parquet directory, so
    :func:`operators.similarity.knn_ivf_indexed` serves them on the
    next query with no refit and no rebuild.

    The quantizer stays frozen; appended mass drifts the true
    centroids, so each tick also appends per-list counts to a
    ``{path}_growth`` sidecar. :func:`maintain_ivf_index` reads the
    sidecar and triggers ``build_ivf_index`` anew when growth crosses
    its threshold — rebuild-on-evidence, the OPTIMIZE analog, instead
    of silent recall decay."""

    def _append(batch: DataFrame, epoch: int) -> None:
        _ivf_append_batch(batch, path, epoch, id_col=id_col,
                          vec_col=vec_col)

    _require_checkpoint_owns_ticks(
        checkpoint, [path + "_growth"], file_prefix_root=path)
    return (
        stream_vecs.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def refresh_postings_from_cdf(spark, delta_path: str, out_path: str, *,
                              bucketed: bool = False,
                              n_buckets: int = 64) -> list[int]:
    """Refresh the BM25 postings index from a Delta table's CHANGE
    FEED — the lakehouse-to-index composition: the documents table is
    a governed Delta table (MERGE-able, time-travelable, vacuumed) and
    the search index maintains itself from the table's row-level
    deltas instead of a raw file stream. Cites the reference's search
    maintenance claim (/root/reference/README.md:61,117 — the service
    indexes the governed table, with target-lag freshness).

    Mechanics: a ``{out_path}_cdf_state`` sidecar holds the last
    consumed ``_commit_version`` (the incremental high-water mark);
    each call reads ``read_change_feed(from_version=hwm+1)`` and
    appends one ``tick=<commit_version>`` dir per commit — the SAME
    layout (and idempotency/uniqueness guards) as the streaming
    refresh, so serving, compaction, and the sidecar stats all apply
    unchanged. Returns the commit versions ingested ([] = up to
    date). Crash-safe: the state sidecar is advanced only after a
    commit's tick (and its ``_stats``/``_docs`` rows) landed; a crash
    in between replays the commit into the same tick dir
    idempotently.

    CHURN is absorbed (round 12 — previously update/delete feeds
    refused and a changed document forced a rebuild; the reference's
    search service re-serves changed rows within target_lag,
    /root/reference/README.md:83,117): a commit's dead rows
    (delete / update_preimage) land as a ``{out_path}_tombstones``
    tick plus a NEGATIVE ``_stats`` contribution computed from their
    preimage text (so N/avgdl track the mutated corpus with one
    sidecar sum), and the live rows (insert / update_postimage)
    append as before — the re-ingest guard admits a postimage whose
    prior ingest is tombstone-dead. Serve through
    :func:`read_postings`, which drops rows older than a tombstone
    for their doc; the stale postings are physically dropped when
    :func:`compact_index_ticks` folds their tick range."""
    feed, versions, advance = _consume_change_feed(
        spark, delta_path, out_path + "_cdf_state",
        op="refresh_postings_from_cdf", contract="",
        tick_dirs=[out_path, out_path + "_stats", out_path + "_docs"],
        allow_churn=True)
    stats = _feed_commit_stats(feed) if versions else {}
    # batched re-insert vet (round 14 — one job over the feed range
    # replaces the per-commit _docs-sidecar scan; exact per-commit
    # fallback when the range itself repeats an inserted id, see
    # _feed_reinsert_hits)
    hits: dict[int, list] = {}
    infeed: set[int] = set()
    if versions:
        side0 = _postings_docs_frame(spark, out_path)
        if side0 is not None:
            prior0 = live_filter(
                side0.select("doc_id", F.col("tick").cast("long")),
                out_path + "_tombstones", F.col("doc_id"),
                F.col("tick"))
            hits, infeed = _feed_reinsert_hits(feed, prior0, "doc_id")
    for v in versions:
        dead, live = _split_churn(feed, v)
        batch = live.select("doc_id", "text")
        dead = dead.select("doc_id", "text")
        _require_tick_layout(out_path)
        _require_tick_layout(out_path + "_stats")
        # vet BEFORE publishing the commit's tombstone tick (round-13
        # ADVICE): the guard sees the commit's dead keys as a pending
        # tombstone, so a legal update's postimage passes — but a
        # refused commit (an illegal duplicate insert mixed into it)
        # leaves NOTHING behind, where the old publish-then-vet order
        # left the preimages serve-dead with no postimage landed
        if v in infeed:
            _refuse_reingested_docs(batch, out_path, v,
                                    pending_dead=dead.select("doc_id"))
        elif hits.get(v):
            raise ValueError(
                f"refresh refused: doc_ids {hits[v]}… were "
                f"already ingested by an earlier tick of {out_path}. "
                f"The postings index is append-only per (doc_id, "
                f"term); re-ingesting a document would inflate "
                f"df/tf/N/avgdl and leave stale postings for its "
                f"removed terms. Rebuild the index (or dedupe the "
                f"input stream) instead")
        had_dead = _write_tombstone_tick(
            dead.select("doc_id"), out_path, v,
            known_nonempty=stats[v]["_n_dead"] > 0)
        post = postings_stream(batch)
        tick = f"{out_path}/tick={v}"
        # the commit's three tick publications (postings, stats
        # delta, docs sidecar) are independent jobs over the vetted
        # batch writing to three different tick dirs — submit them
        # concurrently (guide §2.6). The crash discipline is
        # unchanged: the high-water mark advances only after ALL
        # landed, so a crash with any subset published replays the
        # commit and every tick overwrites itself; the sequential
        # order only ever narrowed WHICH subset a crash could leave,
        # never prevented partial ticks.

        def _write_postings():
            if bucketed:
                (with_term_buckets(post, n_buckets).write
                 .mode("overwrite").partitionBy("tb").parquet(tick))
            else:
                post.write.mode("overwrite").parquet(tick)

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(_write_postings),
                pool.submit(write_corpus_stats, batch,
                            out_path + "_stats", tick=v,
                            minus=dead if had_dead else None),
                pool.submit(
                    lambda: batch.select("doc_id").distinct().write
                    .mode("overwrite")
                    .parquet(f"{out_path}_docs/tick={v}")),
            ]
            for f in futs:
                f.result()
        advance(v)
    return versions


def _chunk_index_append_batch(spark, batch: DataFrame, path: str,
                              epoch: int, meta: dict,
                              pending_dead: DataFrame | None = None,
                              feed_counts: dict | None = None
                              ) -> None:
    """One refresh tick of the persisted CHUNK index (round 11): the
    batch is (id, text) DOCUMENT rows, so the tick re-runs the exact
    build-time chunk->embed stage with the store's OWN meta-sidecar
    parameters (a drifted caller cannot embed increments with
    different geometry), appends the chunk vectors through
    :func:`_ivf_append_batch` (frozen quantizer, growth + radii
    sidecars, tick-stamped idempotent publish), and lands the
    batch's (id, _dkey) bridge rows into the ``_docids`` sidecar
    under the same tick-prefix discipline — an at-least-once replay
    of the same epoch overwrites itself everywhere.

    Guards, in order: re-ingest (a doc id already LIVE in the sidecar
    from ANOTHER tick refuses loudly — a re-inserted document would
    duplicate every one of its chunks; this epoch's own rows are
    replay-tolerant, and a doc whose prior ingest is tombstone-dead
    is legal to re-insert: that IS the update path, round 12), the
    identity bridge's id-domain check (non-negative, composite key
    inside int64), and the hash bridge's collision checks (in-batch
    distinct counts plus a ``_dkey`` join against the stored mapping
    where the stored id DIFFERS — an equal id re-keying itself is
    the update path, but a different id reusing a ``_dkey``, live or
    dead, would make the decode join attribute hits to both).

    ``pending_dead`` (round 13): the commit's dead ``_dkey`` frame.
    It enters the re-ingest guard as a pending tombstone tick at
    ``epoch`` and is PUBLISHED here, after every guard passes and
    before any index write — a refused commit leaves nothing behind
    (the old caller-side publish-before-guard order left the
    preimages serve-dead with no postimage landed, round-13
    ADVICE)."""
    import contextlib
    import os
    import shutil

    from ..operators import retrieval as rt

    def _publish_dead() -> None:
        if pending_dead is not None:
            _write_tombstone_tick(
                pending_dead, path, epoch,
                known_nonempty=None if feed_counts is None
                else feed_counts["_n_dead"] > 0)

    id_col, scale = meta["id_col"], int(meta["chunk_key_scale"])
    batch_empty = (batch.isEmpty() if feed_counts is None
                   else feed_counts["_n_live"] == 0)
    if batch_empty:
        _publish_dead()  # a delete-only commit IS its tombstone tick
        return  # replay-idempotent, same as _ivf_append_batch
    known = (spark.read.parquet(path + "_docids")
             .filter(F.col("_tick") != epoch))
    live_known = live_filter(
        known, path + "_tombstones", F.col("_dkey"), F.col("_tick"),
        pending=None if pending_dead is None else (pending_dead, epoch))
    dup = (batch.select(id_col).distinct()
           .join(live_known.select(id_col), id_col, "left_semi")
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"refresh_chunk_index_from_cdf: commit {epoch} re-inserts "
            f"document {dup[0][0]!r} already live in the chunk "
            f"index — a re-ingested doc would duplicate its chunks; "
            f"feed changes as update/delete commits (tombstoned and "
            f"re-served within the tick) or rebuild via "
            f"build_chunk_index")
    if meta["id_bridge"] == "identity":
        if feed_counts is not None and "_lo" in feed_counts:
            lo, hi = feed_counts["_lo"], feed_counts["_hi"]
        else:
            lo, hi = batch.agg(F.min(id_col), F.max(id_col)).first()
        if lo is None or lo < 0 or hi > (1 << 63) // scale - 1:
            raise ValueError(
                f"refresh_chunk_index_from_cdf: commit {epoch} carries "
                f"doc ids outside the identity bridge's domain "
                f"(min={lo}, max={hi}); this store was built with "
                f"identity keys and cannot absorb them — rebuild with "
                f"build_chunk_index (which would pick the hash bridge)")
        keyed = batch.withColumn("_dkey", F.col(id_col).cast("long"))
    else:
        keyed = batch.withColumn(
            "_dkey", F.pmod(F.xxhash64(F.col(id_col)),
                            F.lit(rt._DOC_KEY_SPACE)))
        n_ids, n_keys = keyed.agg(
            F.countDistinct(id_col), F.countDistinct("_dkey")).first()
        # clash = a DIFFERENT stored id (any tick, live or dead —
        # dead mapping rows still poison the decode join) reusing an
        # incoming _dkey; an equal id is the update path, already
        # vetted by the liveness guard above
        clash = None if n_ids != n_keys else (
            keyed.select("_dkey", F.col(id_col).alias("_bid"))
            .join(known.select("_dkey", F.col(id_col).alias("_kid")),
                  "_dkey")
            .filter(F.col("_bid") != F.col("_kid")).limit(1).collect())
        if n_ids != n_keys or clash:
            raise ValueError(
                f"refresh_chunk_index_from_cdf: commit {epoch} "
                f"collides in the 2^41 doc-key space "
                f"({'in-batch' if n_ids != n_keys else 'against the stored mapping'}); "
                f"supply non-negative integral doc ids for this corpus")
    _publish_dead()  # batch vetted — the churn tick may land now
    dense = rt._chunk_vectors(
        keyed, chunk_tokens=meta["chunk_tokens"], stride=meta["stride"],
        dim=meta["dim"], text_col=meta["text_col"],
        chunk_key_scale=scale)
    # the _docids bridge rows STAGE concurrently with the chunk
    # vectors' append (guide §2.6 — both jobs derive from the vetted
    # batch and write to invisible stage dirs); publication order is
    # unchanged: the sidecar moves below still run only after
    # _ivf_append_batch has published the index tick
    side = (keyed.select(id_col, "_dkey").distinct()
            .withColumn("_tick", F.lit(epoch).cast("long"))
            .withColumn("_db", F.pmod(F.col("_dkey"),
                                      F.lit(meta["docid_buckets"]))
                        .cast("int")))
    stage = os.path.join(path + "_docids_stage", f"tick={epoch}")
    with ThreadPoolExecutor(max_workers=1) as pool:
        side_f = pool.submit(
            lambda: side.write.mode("overwrite").partitionBy("_db")
            .parquet(stage))
        _ivf_append_batch(dense, path, epoch, id_col="vec_id",
                          vec_col="embedding")
        side_f.result()
    if not os.path.isdir(stage):
        raise RuntimeError(
            f"the chunk-index refresh requires a driver-visible POSIX "
            f"index path; {stage} is not readable from the driver")
    prefix = f"tick{epoch}-"
    tgt_root = path + "_docids"
    for root, _, files in os.walk(tgt_root):
        for fn in files:
            if fn.startswith(prefix):
                os.remove(os.path.join(root, fn))
    for root, _, files in os.walk(stage):
        rel = os.path.relpath(root, stage)
        for i, fn in enumerate(
                sorted(f for f in files if f.endswith(".parquet"))):
            tgt = os.path.join(tgt_root, rel)
            os.makedirs(tgt, exist_ok=True)
            os.replace(os.path.join(root, fn),
                       os.path.join(tgt, f"{prefix}{i:05d}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    with contextlib.suppress(OSError):
        os.rmdir(path + "_docids_stage")


def refresh_chunk_index_from_cdf(spark, delta_path: str,
                                 path: str) -> list[int]:
    """Maintain a persisted CHUNK-level IVF index
    (:func:`~.operators.retrieval.build_chunk_index`) from the
    DOCUMENTS table's Delta change feed — the composition round-11
    VERDICT #1 asked for and the reference's Cortex Search shape
    (indexed retrieval + target_lag maintenance,
    /root/reference/README.md:61,83,117): each commit's inserted
    documents are chunked and embedded with the store's own meta
    parameters and land as one tick into the frozen-quantizer layout,
    so :func:`~.operators.retrieval.chunked_retrieval_served` answers
    the very next query over them with no rebuild (pytest pins
    full-probe served ≡ the exact tier over base ∪ increments).

    Protocol is identical to :func:`refresh_ivf_from_cdf` (same
    ``_consume_change_feed`` scaffolding): ``{path}_cdf_state``
    high-water mark advanced only after the commit's tick landed,
    maintenance-commit tolerance, ownership guard against a second
    maintenance lineage. Returns the commit versions ingested
    ([] = up to date).

    CHURN is absorbed (round 12): a commit's delete/update_preimage
    doc ids map through the store's OWN bridge to ``_dkey`` and land
    as a ``{path}_tombstones`` tick — ONE doc-level tombstone kills
    every chunk of the dead version (the serve filter decodes each
    hit's ``vec_id div chunk_key_scale``); the postimage re-chunks
    and re-embeds at the same commit version and serves from the
    very next query. An index built from the table's SNAPSHOT (the
    ``build_chunk_index`` + :func:`bootstrap_cdf_state` flow) starts
    consuming at the snapshot version + 1."""
    from ..operators.retrieval import _DOC_KEY_SPACE, _read_chunk_meta

    meta = _read_chunk_meta(path)
    id_col = meta["id_col"]
    feed, versions, advance = _consume_change_feed(
        spark, delta_path, path + "_cdf_state",
        op="refresh_chunk_index_from_cdf", contract="",
        tick_dirs=[path + "_growth"], file_prefix_root=path,
        allow_churn=True)
    if meta["id_bridge"] == "identity":
        dkey = F.col(id_col).cast("long")
    else:
        dkey = F.pmod(F.xxhash64(F.col(id_col)), F.lit(_DOC_KEY_SPACE))
    stats = (_feed_commit_stats(
        feed, minmax_col=id_col if meta["id_bridge"] == "identity"
        else None) if versions else {})
    for v in versions:
        dead, live = _split_churn(feed, v)
        # the commit's dead keys ride into the append as a PENDING
        # tombstone: vetted first, published only once the batch
        # passes every guard (round-13 ADVICE — no half-absorbed
        # refusals)
        _chunk_index_append_batch(
            spark, live.select(id_col, meta["text_col"]), path, v, meta,
            pending_dead=dead.select(dkey.alias("k")),
            feed_counts=stats[v])
        advance(v)
    return versions
