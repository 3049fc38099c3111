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


def test_delta_concurrent_writer_loses(spark, sf_dir, tmp_path, monkeypatch):
    """Put-if-absent commit: a second writer racing for the same
    version must fail loudly, never clobber the winner's commit."""
    path = str(tmp_path / "delta_race")
    o = _orders(spark, sf_dir).limit(100)
    dl.write_delta(o, path)
    # the winner publishes version 1...
    winner_commit = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(winner_commit, "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n")
    before = open(winner_commit).read()
    # ...but the loser raced: it listed the log BEFORE the winner's
    # commit appeared, so it also targets version 1
    monkeypatch.setattr(dl, "_list_versions", lambda p: [0])
    with pytest.raises(dl.DeltaConcurrentWriteError, match="another writer"):
        dl.write_delta(o, path, mode="append")
    assert open(winner_commit).read() == before  # winner untouched
    # no orphan tmp files left behind in the log dir
    assert not [f for f in os.listdir(os.path.join(path, "_delta_log"))
                if f.endswith(".tmp")]


def test_delta_paths_url_encoded_per_protocol(spark, tmp_path):
    """add.path must be RFC 2396 URL-encoded (PROTOCOL.md): partition
    string values with '%', '+' and spaces must survive the
    encode->log->decode round trip."""
    path = str(tmp_path / "delta_enc")
    df = spark.createDataFrame(
        [(1, "50% off"), (2, "a+b c"), (3, "plain")], "id long, tag string"
    )
    dl.write_delta(df, path, partition_by=["tag"])
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json")) as f:
        adds = [json.loads(l)["add"] for l in f if l.strip() and "add" in l]
    # logged paths are encoded: no raw space; '%' only as an escape
    enc = [a["path"] for a in adds if "50" in a["path"]]
    assert enc and all(" " not in p for p in (a["path"] for a in adds))
    assert any("%25" in p for p in enc)  # '%' itself escaped
    back = dl.read_delta(spark, path)
    got = {r["tag"] for r in back.select("tag").collect()}
    # hive path escaping at the FS layer canonicalizes independently;
    # what matters is every partition reads back and values resolve
    assert back.count() == 3 and len(got) == 3


def test_delta_log_readable_by_independent_engine(spark, sf_dir, tmp_path):
    """Cross-engine read of the published table WITHOUT read_delta:
    an independent replay of the JSON log (test-local code) + DuckDB
    scanning the live parquet files must reproduce the source exactly.
    This is the offline stand-in for the delta_scan interop check."""
    import urllib.parse

    import duckdb

    path = str(tmp_path / "delta_interop")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice", "yyyy")
    dl.write_delta(o, path, partition_by=["yyyy"])
    dl.write_delta(o.filter(F.col("yyyy") == 1995), path, mode="overwrite",
                   partition_by=["yyyy"])

    # independent reader: replay add/remove per the public PROTOCOL
    live: set[str] = set()
    log = os.path.join(path, "_delta_log")
    for fname in sorted(os.listdir(log)):
        if not fname.endswith(".json"):
            continue
        for line in open(os.path.join(log, fname)):
            if not line.strip():
                continue
            a = json.loads(line)
            if "add" in a:
                live.add(urllib.parse.unquote(a["add"]["path"]))
            elif "remove" in a:
                live.discard(urllib.parse.unquote(a["remove"]["path"]))
    assert live
    con = duckdb.connect()
    files = [os.path.join(path, rel) for rel in sorted(live)]
    got = con.execute(
        "SELECT count(*), sum(o_orderkey), round(sum(o_totalprice), 2) "
        "FROM read_parquet(?, hive_partitioning=true)", [files]
    ).fetchone()
    src = o.filter(F.col("yyyy") == 1995).agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)
    ).first()
    assert (got[0], got[1], float(got[2])) == (src[0], src[1], float(src[2]))


def test_delta_scan_extension_interop(spark, sf_dir, tmp_path):
    """Full official-reader interop: DuckDB's delta extension scanning
    a delta_lite table. Skipped when the extension cannot load (this
    sandbox has no network to install it); runs green wherever
    `INSTALL delta` has happened."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL delta; LOAD delta")
    except Exception as e:  # offline sandbox: extension not bundled
        pytest.skip(f"duckdb delta extension unavailable offline: {e}")
    path = str(tmp_path / "delta_official")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, path)
    got = con.execute(
        f"SELECT count(*), sum(o_orderkey) FROM delta_scan('{path}')"
    ).fetchone()
    assert (got[0], got[1]) == (o.count(), o.agg(F.sum("o_orderkey")).first()[0])


def test_compact_swaps_files_without_changing_data(spark, sf_dir, tmp_path):
    """OPTIMIZE: three appends make many small files; compaction must
    reduce the live file count, keep row-level contents identical,
    mark the swap dataChange=false, and leave prior versions
    time-travelable (old files stay on storage)."""
    path = str(tmp_path / "delta_compact")
    o = _orders(spark, sf_dir).limit(300)
    dl.write_delta(o.repartition(4), path, partition_by=["yyyy"])
    dl.write_delta(o.repartition(4), path, mode="append", partition_by=["yyyy"])
    dl.write_delta(o.repartition(4), path, mode="append", partition_by=["yyyy"])
    head = dl._list_versions(path)[-1]
    live_before = dl._live_files(path, head)

    v = dl.compact_delta(spark, path, target_file_bytes=1 << 30)
    assert v == head + 1
    live_after = dl._live_files(path, v)
    assert len(live_after) < len(live_before)
    assert not (live_after & live_before)  # full swap

    got = dl.read_delta(spark, path).groupBy().count().collect()[0][0]
    assert got == 900
    # row-level equality, not just counts
    a = dl.read_delta(spark, path).select("o_orderkey").groupBy("o_orderkey").count()
    b = dl.read_delta(spark, path, version=head).select("o_orderkey").groupBy("o_orderkey").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    with open(os.path.join(path, "_delta_log", f"{v:020d}.json")) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    assert all(
        a[k]["dataChange"] is False
        for a in actions for k in ("add", "remove") if k in a
    )
    assert any(
        a.get("commitInfo", {}).get("operation") == "OPTIMIZE" for a in actions
    )
    # time travel to the pre-compaction head still scans the old files
    assert dl.read_delta(spark, path, version=head).count() == 900


def test_compact_noop_on_single_file_table(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_one")
    dl.write_delta(_orders(spark, sf_dir).limit(10).coalesce(1), path)
    head = dl._list_versions(path)[-1]
    assert dl.compact_delta(spark, path) == head  # no new commit


def test_vacuum_expires_tombstones_but_never_head(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_vac")
    o = _orders(spark, sf_dir).limit(200)
    dl.write_delta(o.repartition(3), path)
    dl.write_delta(o.repartition(3), path, mode="append")
    head = dl._list_versions(path)[-1]
    dl.compact_delta(spark, path, target_file_bytes=1 << 30)

    # inside retention: nothing deleted
    assert dl.vacuum_delta(path) == []

    # zero retention: every non-head file (the compacted-away ones) goes
    deleted = dl.vacuum_delta(path, retention_ms=0)
    assert deleted
    live = dl._live_files(path, dl._list_versions(path)[-1])
    assert not (set(deleted) & live)
    assert dl.read_delta(spark, path).count() == 400  # head unharmed
    assert dl._data_files(path) == live  # disk == head snapshot

    # the vacuumed version is now unreadable — the documented trade
    with pytest.raises(Exception):
        dl.read_delta(spark, path, version=head).count()


def test_merge_upsert_rewrites_only_touched_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_merge")
    o = _orders(spark, sf_dir)
    dl.write_delta(o, path, partition_by=["yyyy"])
    live_before = dl._live_files(path, dl._list_versions(path)[-1])

    # source: bump totalprice for 5 existing keys in ONE year + 2 new rows
    yy = [r["yyyy"] for r in
          spark.read.parquet(f"{sf_dir}/orders.parquet")
          .select(F.year("o_orderdate").alias("yyyy"))
          .groupBy("yyyy").count().orderBy("yyyy").collect()]
    target_year = yy[0]
    upd = (dl.read_delta(spark, path)
           .filter(F.col("yyyy") == target_year)
           .orderBy("o_orderkey").limit(5)
           .withColumn("o_totalprice", F.lit(999999.0)))
    mx = dl.read_delta(spark, path).agg(F.max("o_orderkey")).collect()[0][0]
    new = upd.limit(2).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(mx + 1))
    src = upd.unionByName(new)

    n_before = dl.read_delta(spark, path).count()
    v = dl.merge_delta(spark, path, src, on=["o_orderkey"])
    assert v == 1

    out = dl.read_delta(spark, path)
    assert out.count() == n_before + 2
    bumped = out.filter(F.col("o_totalprice") == 999999.0).count()
    assert bumped == 7  # 5 updates + 2 inserts carry the marker price

    # copy-on-write locality: only files in the touched partition were
    # replaced — every other year's files survive the commit untouched
    live_after = dl._live_files(path, dl._list_versions(path)[-1])
    untouched = {f for f in live_before if f"yyyy={target_year}" not in f}
    assert untouched <= live_after

    # time travel: pre-merge snapshot unchanged
    assert dl.read_delta(spark, path, version=0).count() == n_before
    assert dl.read_delta(spark, path, version=0).filter(
        F.col("o_totalprice") == 999999.0).count() == 0


def test_merge_delete_mode(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_merge_del")
    o = _orders(spark, sf_dir).limit(100)
    dl.write_delta(o, path)
    victims = dl.read_delta(spark, path).orderBy("o_orderkey").limit(10).select("o_orderkey")
    src = dl.read_delta(spark, path).join(victims, "o_orderkey", "left_semi")
    dl.merge_delta(spark, path, src, on=["o_orderkey"],
                   when_matched="delete", when_not_matched=None)
    out = dl.read_delta(spark, path)
    assert out.count() == 90
    assert out.join(victims, "o_orderkey", "left_semi").count() == 0


def test_merge_special_char_partition_values(spark, sf_dir, tmp_path):
    """Regression: _metadata.file_path is a percent-encoded Hadoop URI;
    merge must unquote it before re-encoding the remove path, or a
    partition value containing space/%/# double-encodes, the remove
    misses the original add, and the merge yields duplicate rows."""
    path = str(tmp_path / "delta_merge_pct")
    o = (_orders(spark, sf_dir).limit(40)
         .select("o_orderkey", "o_totalprice")
         .withColumn("seg", F.when(F.col("o_orderkey") % 2 == 0,
                                   F.lit("hi tier 100%"))
                             .otherwise(F.lit("lo#tier"))))
    dl.write_delta(o, path, partition_by=["seg"])
    n = dl.read_delta(spark, path).count()
    upd = (dl.read_delta(spark, path).orderBy("o_orderkey").limit(6)
           .withColumn("o_totalprice", F.lit(424242.0)))
    dl.merge_delta(spark, path, upd, on=["o_orderkey"])
    out = dl.read_delta(spark, path)
    assert out.count() == n  # no duplicates: removes matched the adds
    assert out.filter(F.col("o_totalprice") == 424242.0).count() == 6
    assert out.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_stats_skip_tz_aware_predicate(spark, sf_dir, tmp_path):
    """Regression: a timezone-aware predicate value must not be
    compared as a local wall-time string against naive file stats /
    hive dir values — that could wrongly prove a file skippable and
    silently drop rows."""
    import datetime as _dt
    naive_cut = _dt.datetime(1995, 1, 1)
    # same instant expressed with a +05:00 offset
    aware_cut = naive_cut.replace(
        tzinfo=_dt.timezone.utc).astimezone(_dt.timezone(_dt.timedelta(hours=5)))
    path = str(tmp_path / "delta_tz")
    o = (_orders(spark, sf_dir).limit(500)
         .select("o_orderkey", F.col("o_orderdate").cast("timestamp").alias("ts"))
         .withColumn("yyyy", F.year("ts")))
    dl.write_delta(o, path, partition_by=["yyyy"])
    want = dl.read_delta(spark, path).filter(F.col("ts") >= F.lit(naive_cut)).count()
    got = dl.read_delta(spark, path,
                        predicates=[("ts", ">=", aware_cut)]).count()
    assert got == want
    # unit-level: an aware value never prunes differently from its
    # naive-UTC equivalent
    adds = dl._live_adds(path, dl._list_versions(path)[-1])
    for rel, a in adds.items():
        assert (dl._stats_can_skip(a, "ts", ">=", aware_cut)
                == dl._stats_can_skip(a, "ts", ">=", naive_cut))


def test_merge_duplicate_source_keys_raise(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_merge_dup")
    o = _orders(spark, sf_dir).limit(20)
    dl.write_delta(o, path)
    dup_src = o.limit(3).unionByName(o.limit(3))
    n_versions = len(dl._list_versions(path))
    with pytest.raises(ValueError, match="duplicate"):
        dl.merge_delta(spark, path, dup_src, on=["o_orderkey"])
    assert len(dl._list_versions(path)) == n_versions  # nothing committed


def test_merge_releases_source_checkpoint(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_merge_leak")
    o = _orders(spark, sf_dir).limit(50)
    dl.write_delta(o, path)
    before = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}
    dl.merge_delta(spark, path, o.limit(5), on=["o_orderkey"])
    after = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}
    assert after <= before  # merge pins no storage past its return


def test_add_actions_carry_stats_and_pruning_is_lossless(spark, sf_dir, tmp_path):
    import json as _json
    path = str(tmp_path / "delta_stats")
    o = _orders(spark, sf_dir).orderBy("o_orderkey").repartitionByRange(4, "o_orderkey")
    dl.write_delta(o.sortWithinPartitions("o_orderkey"), path)

    adds = dl._live_adds(path, dl._list_versions(path)[-1])
    assert len(adds) >= 4
    for add in adds.values():
        s = _json.loads(add["stats"])
        assert s["numRecords"] > 0
        assert "o_orderkey" in s["minValues"] and "o_orderkey" in s["maxValues"]

    # range-partitioned layout -> a point predicate proves most files empty
    probe = dl.read_delta(spark, path).agg(F.min("o_orderkey")).collect()[0][0]
    preds = [("o_orderkey", "<=", probe + 1)]
    kept = [r for r, a in adds.items()
            if not any(dl._stats_can_skip(a, c, op, v) for c, op, v in preds)]
    assert len(kept) < len(adds)

    # and the pruned read returns EXACTLY the filtered rows
    full = dl.read_delta(spark, path).filter(F.col("o_orderkey") <= probe + 1)
    pruned = dl.read_delta(spark, path, predicates=preds)
    assert pruned.count() == full.count() > 0
    # conservative: a type-mismatched predicate value must never prune
    some_add = next(iter(adds.values()))
    assert dl._stats_can_skip(some_add, "o_comment", ">=", 5) is False
    assert dl._stats_can_skip(some_add, "no_such_col", "==", 1) is False


def test_zorder_compaction_concentrates_both_columns(spark, sf_dir, tmp_path):
    import json as _json
    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")

    def ranges(path):
        adds = dl._live_adds(path, dl._list_versions(path)[-1])
        spans = {"user_id": [], "value": []}
        for a in adds.values():
            s = _json.loads(a["stats"])
            for c in spans:
                spans[c].append(s["maxValues"][c] - s["minValues"][c])
        glo = ev.agg(
            (F.max("user_id") - F.min("user_id")).alias("user_id"),
            (F.max("value") - F.min("value")).alias("value"),
        ).collect()[0]
        return {c: (sum(v) / len(v)) / float(glo[c]) for c, v in spans.items()}, len(adds)

    # baseline: linear sort by ts-proxy (event_id) — neither column clusters
    lin = str(tmp_path / "delta_linear")
    dl.write_delta(ev.repartitionByRange(8, "event_id"), lin)
    lin_r, lin_n = ranges(lin)

    zo = str(tmp_path / "delta_zorder")
    dl.write_delta(ev.repartitionByRange(8, "event_id"), zo)
    v = dl.compact_delta(spark, zo, target_file_bytes=1 << 10,
                         zorder_by=["user_id", "value"])
    assert v == 1
    zo_r, zo_n = ranges(zo)
    assert zo_n >= 4  # multiple files, else "concentration" is vacuous

    # z-order narrows BOTH columns' per-file spans; the linear layout
    # leaves both near the full range
    assert zo_r["user_id"] < 0.6 and zo_r["value"] < 0.6, (zo_r, lin_r)
    assert lin_r["user_id"] > 0.7 and lin_r["value"] > 0.7, (zo_r, lin_r)
    assert zo_r["user_id"] < lin_r["user_id"] / 2
    assert zo_r["value"] < lin_r["value"] / 2

    # and the narrowed stats actually skip files for a 2-D box probe
    adds = dl._live_adds(zo, dl._list_versions(zo)[-1])
    med = ev.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    preds = [("user_id", "<=", float(med)), ("value", "<=", 0.0)]
    kept = [r for r, a in adds.items()
            if not any(dl._stats_can_skip(a, c, op, x) for c, op, x in preds)]
    assert len(kept) < zo_n
    # identical rows with and without skipping
    want = dl.read_delta(spark, zo).filter(
        (F.col("user_id") <= float(med)) & (F.col("value") <= 0.0)).count()
    assert dl.read_delta(spark, zo, predicates=preds).count() == want


def test_zorder_key_is_monotone_per_fixed_other_column(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(float(i), float(j)) for i in range(16) for j in range(16)],
        "a double, b double",
    )
    out = df.withColumn("z", zorder_key(df, ["a", "b"], bits=4)).collect()
    by_b = {}
    for r in out:
        by_b.setdefault(r["b"], []).append((r["a"], r["z"]))
    for b, pairs in by_b.items():
        pairs.sort()
        zs = [z for _, z in pairs]
        assert zs == sorted(zs), f"z not monotone in a at b={b}"


def test_txn_action_makes_writes_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_txn")
    o = _orders(spark, sf_dir).limit(50)
    v0 = dl.write_delta(o, path, mode="append", txn=("app-1", 0))
    n = dl.read_delta(spark, path).count()

    # same (appId, version) re-delivered -> no-op, no new commit
    v_again = dl.write_delta(o, path, mode="append", txn=("app-1", 0))
    assert v_again == v0
    assert dl.read_delta(spark, path).count() == n
    assert len(dl._list_versions(path)) == 1

    # next version commits; a DIFFERENT app with the same number also commits
    dl.write_delta(o, path, mode="append", txn=("app-1", 1))
    dl.write_delta(o, path, mode="append", txn=("app-2", 0))
    assert dl.read_delta(spark, path).count() == 3 * n
    assert dl.last_txn_version(path, "app-1") == 1
    assert dl.last_txn_version(path, "app-2") == 0
    assert dl.last_txn_version(path, "nobody") is None


def test_change_data_feed_from_merge_and_synthesis(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_cdf")
    o = _orders(spark, sf_dir).limit(100)
    dl.write_delta(o, path)
    n = 100

    upd = (dl.read_delta(spark, path).orderBy("o_orderkey").limit(5)
           .withColumn("o_totalprice", F.lit(111111.0)))
    mx = dl.read_delta(spark, path).agg(F.max("o_orderkey")).collect()[0][0]
    new = upd.limit(2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(mx + 1))
    v1 = dl.merge_delta(spark, path, upd.unionByName(new), on=["o_orderkey"],
                        change_data=True)

    # v0 synthesizes inserts from dataChange adds; v1 reads explicit cdc
    feed = dl.read_change_feed(spark, path)
    by = {(r["_commit_version"], r["_change_type"]) for r in feed.collect()}
    assert (0, "insert") in by and (1, "update_postimage") in by

    v1_feed = dl.read_change_feed(spark, path, from_version=v1)
    counts = {r["_change_type"]: r["n"] for r in
              v1_feed.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"update_preimage": 5, "update_postimage": 5, "insert": 2}
    # pre/post images carry old vs new values
    pre = v1_feed.filter(F.col("_change_type") == "update_preimage")
    post = v1_feed.filter(F.col("_change_type") == "update_postimage")
    assert pre.filter(F.col("o_totalprice") == 111111.0).count() == 0
    assert post.filter(F.col("o_totalprice") == 111111.0).count() == 5

    # incremental consumer: applying the v1 deltas to the v0 snapshot
    # reproduces the head snapshot exactly
    base = dl.read_delta(spark, path, version=0)
    gone = v1_feed.filter(
        F.col("_change_type").isin("update_preimage", "delete")).select("o_orderkey")
    arrived = v1_feed.filter(
        F.col("_change_type").isin("update_postimage", "insert")).select(*base.columns)
    derived = base.join(gone, "o_orderkey", "left_anti").unionByName(arrived)
    head = dl.read_delta(spark, path).select(*base.columns)
    assert derived.count() == head.count() == n + 2
    assert derived.exceptAll(head).count() == 0 and head.exceptAll(derived).count() == 0

    # CDF files are row history, not table data: snapshot reads ignore them
    assert dl.read_delta(spark, path).columns == o.columns


def test_change_feed_delete_mode(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_cdf_del")
    o = _orders(spark, sf_dir).limit(30)
    dl.write_delta(o, path)
    victims = dl.read_delta(spark, path).orderBy("o_orderkey").limit(4)
    v = dl.merge_delta(spark, path, victims, on=["o_orderkey"],
                       when_matched="delete", when_not_matched=None,
                       change_data=True)
    feed = dl.read_change_feed(spark, path, from_version=v)
    assert feed.filter(F.col("_change_type") == "delete").count() == 4
    assert feed.count() == 4


def test_checkpoint_bounds_replay_and_log_expiry(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_ckpt")
    o = _orders(spark, sf_dir).limit(200)
    a, b = o.filter(F.col("o_orderkey") % 2 == 0), o.filter(F.col("o_orderkey") % 2 == 1)
    dl.write_delta(a, path, txn=("app-x", 0))
    dl.write_delta(b, path, mode="append", txn=("app-x", 1))
    n = dl.read_delta(spark, path).count()

    head = dl.checkpoint_delta(path)
    assert head == 1
    assert os.path.exists(os.path.join(path, "_delta_log", "_last_checkpoint"))

    # snapshot via checkpoint == snapshot via full JSON replay
    assert dl.read_delta(spark, path).count() == n
    # commits after the checkpoint replay on top of it
    more = o.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    dl.write_delta(more, path, mode="append", txn=("app-x", 2))
    assert dl.read_delta(spark, path).count() == n + 10
    # time travel before the checkpoint still works while JSON remains
    assert dl.read_delta(spark, path, version=0).count() == a.count()

    # expire: pre-checkpoint JSON goes away, state survives
    expired = dl.expire_delta_log(path)
    assert expired == [0]
    assert dl.read_delta(spark, path).count() == n + 10
    assert dl.table_metadata(path)["partitionColumns"] == []
    # txn high-water mark survives expiry -> idempotence intact
    assert dl.last_txn_version(path, "app-x") == 2
    dl.write_delta(more, path, mode="append", txn=("app-x", 2))  # no-op
    assert dl.read_delta(spark, path).count() == n + 10
    # expired versions are gone for time travel
    with pytest.raises(ValueError, match="not in log"):
        dl.read_delta(spark, path, version=0)

    # stats survive the checkpoint: predicates still skip losslessly
    probe = dl.read_delta(spark, path).agg(F.min("o_orderkey")).collect()[0][0]
    got = dl.read_delta(spark, path, predicates=[("o_orderkey", "<=", probe)])
    assert got.count() == dl.read_delta(spark, path).filter(
        F.col("o_orderkey") <= probe).count()


def test_checkpoint_then_merge_uses_checkpoint_state(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_ckpt_merge")
    o = _orders(spark, sf_dir).limit(60)
    dl.write_delta(o, path)
    dl.checkpoint_delta(path)
    dl.expire_delta_log(path)

    upd = (dl.read_delta(spark, path).orderBy("o_orderkey").limit(3)
           .withColumn("o_totalprice", F.lit(55555.0)))
    dl.merge_delta(spark, path, upd, on=["o_orderkey"])
    out = dl.read_delta(spark, path)
    assert out.count() == 60
    assert out.filter(F.col("o_totalprice") == 55555.0).count() == 3


def test_additive_schema_evolution(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_evolve")
    o = _orders(spark, sf_dir).limit(40).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, path)

    # appending a new column without opting in still fails loudly
    widened = (_orders(spark, sf_dir).limit(10)
               .select("o_orderkey", "o_totalprice")
               .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
               .withColumn("channel", F.lit("web")))
    with pytest.raises(ValueError, match="merge_schema"):
        dl.write_delta(widened, path, mode="append")

    v1 = dl.write_delta(widened, path, mode="append", merge_schema=True)
    out = dl.read_delta(spark, path)
    assert set(out.columns) == {"o_orderkey", "o_totalprice", "channel"}
    assert out.count() == 50
    # pre-evolution rows read the new column as NULL, no rewrite happened
    assert out.filter(F.col("channel").isNull()).count() == 40
    assert out.filter(F.col("channel") == "web").count() == 10
    # time travel to v0 serves the ORIGINAL schema
    assert set(dl.read_delta(spark, path, version=0).columns) == {
        "o_orderkey", "o_totalprice"}

    # changing an existing column's type is never evolution
    bad = o.withColumn("o_totalprice", F.col("o_totalprice").cast("string"))
    with pytest.raises(ValueError, match="cannot change the type"):
        dl.write_delta(bad, path, mode="append", merge_schema=True)
    assert v1 == 1


def test_restore_and_history(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_restore")
    o = _orders(spark, sf_dir).limit(80).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, path)
    n0 = 80

    # a bad merge bumps 10 rows and inserts 3
    upd = (dl.read_delta(spark, path).orderBy("o_orderkey").limit(10)
           .withColumn("o_totalprice", F.lit(-1.0)))
    mx = dl.read_delta(spark, path).agg(F.max("o_orderkey")).collect()[0][0]
    bad = upd.unionByName(
        upd.limit(3).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(mx + 1)))
    dl.merge_delta(spark, path, bad, on=["o_orderkey"])
    assert dl.read_delta(spark, path).filter(F.col("o_totalprice") < 0).count() == 13

    # restore undoes it in metadata; history shows the whole story
    v = dl.restore_delta(path, 0)
    assert v == 2
    out = dl.read_delta(spark, path)
    assert out.count() == n0
    assert out.filter(F.col("o_totalprice") < 0).count() == 0
    hist = dl.table_history(path)
    assert [h["operation"] for h in hist] == ["RESTORE", "MERGE", "WRITE"]
    assert hist[0]["operationParameters"]["version"] == 0

    # restoring the head is a no-op; unknown versions raise
    assert dl.restore_delta(path, 2) == 2
    with pytest.raises(ValueError, match="not in log"):
        dl.restore_delta(path, 99)


def test_restore_rolls_back_schema_evolution(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_restore_schema")
    o = _orders(spark, sf_dir).limit(20).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, path)
    widened = o.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    ).withColumn("channel", F.lit("web"))
    dl.write_delta(widened, path, mode="append", merge_schema=True)
    assert "channel" in dl.read_delta(spark, path).columns

    dl.restore_delta(path, 0)
    out = dl.read_delta(spark, path)
    assert set(out.columns) == {"o_orderkey", "o_totalprice"}
    assert out.count() == 20


def test_merge_differential_random_sequences(spark, tmp_path):
    """Differential check of merge_delta: random upsert/delete batches
    applied to the Delta table AND to a plain Python dict model; after
    every commit the table must equal the model exactly. Deterministic
    seeds so failures reproduce."""
    import random

    for seed in (20260813, 99):
        rng = random.Random(seed)
        path = str(tmp_path / f"delta_fuzz_{seed}")
        model: dict[int, tuple] = {}

        init = [(k, rng.randint(0, 9), round(rng.uniform(0, 100), 2))
                for k in rng.sample(range(1000), 60)]
        df = spark.createDataFrame(init, "k long, g long, x double")
        dl.write_delta(df, path)
        model.update({r[0]: r for r in init})

        for step in range(4):
            op = rng.choice(["upsert", "delete"])
            keys = rng.sample(range(1000), rng.randint(1, 40))
            batch = [(k, rng.randint(0, 9), round(rng.uniform(0, 100), 2))
                     for k in keys]
            bdf = spark.createDataFrame(batch, "k long, g long, x double")
            if op == "upsert":
                dl.merge_delta(spark, path, bdf, on=["k"])
                model.update({r[0]: r for r in batch})
            else:
                dl.merge_delta(spark, path, bdf, on=["k"],
                               when_matched="delete", when_not_matched=None)
                for k in keys:
                    model.pop(k, None)
            got = {r["k"]: (r["k"], r["g"], r["x"])
                   for r in dl.read_delta(spark, path).collect()}
            assert got == model, f"seed={seed} step={step} op={op}"


def test_predicates_prune_by_partition_value(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_part_prune")
    o = _orders(spark, sf_dir)
    dl.write_delta(o, path, partition_by=["yyyy"])
    adds = dl._live_adds(path, dl._list_versions(path)[-1])
    years = sorted({int(a["partitionValues"]["yyyy"]) for a in adds.values()})
    assert len(years) > 1
    target = years[0]

    preds = [("yyyy", "==", target)]
    kept = [r for r, a in adds.items()
            if not any(dl._stats_can_skip(a, c, op, v) for c, op, v in preds)]
    assert kept and len(kept) < len(adds)
    assert all(f"yyyy={target}" in r for r in kept)

    got = dl.read_delta(spark, path, predicates=preds)
    want = dl.read_delta(spark, path).filter(F.col("yyyy") == target)
    assert got.count() == want.count() > 0
    # range op on the partition column too
    got_ge = dl.read_delta(spark, path, predicates=[("yyyy", ">=", years[-1])])
    want_ge = dl.read_delta(spark, path).filter(F.col("yyyy") >= years[-1])
    assert got_ge.count() == want_ge.count() > 0


def test_full_maintenance_lifecycle(spark, sf_dir, tmp_path):
    """Compose the whole table-maintenance surface the way a real
    pipeline would: write -> merge(+CDF) -> OPTIMIZE ZORDER ->
    checkpoint -> expire log -> vacuum — and verify contents, change
    feed, and stats-based skipping survive every step."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_events

    path = str(tmp_path / "delta_lifecycle")
    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")
    dl.write_delta(ev.repartitionByRange(6, "event_id"), path, txn=("life", 0))
    n = ev.count()

    upd = (dl.read_delta(spark, path).orderBy("event_id").limit(7)
           .withColumn("value", F.lit(424242.0)))
    dl.merge_delta(spark, path, upd, on=["event_id"], change_data=True)

    # downstream consumers drain the change feed BEFORE log expiry
    feed = dl.read_change_feed(spark, path, from_version=1, to_version=1)
    assert feed.filter(F.col("_change_type") == "update_postimage").count() == 7

    v_opt = dl.compact_delta(spark, path, target_file_bytes=1 << 10,
                             zorder_by=["user_id", "value"])
    ck = dl.checkpoint_delta(path)
    assert ck == v_opt
    dl.expire_delta_log(path)
    dl.vacuum_delta(path, retention_ms=0)

    # contents intact through the whole lifecycle
    out = dl.read_delta(spark, path)
    assert out.count() == n
    assert out.filter(F.col("value") == 424242.0).count() == 7
    # expired versions' change feed is gone — the documented horizon
    with pytest.raises(ValueError, match="no commits"):
        dl.read_change_feed(spark, path, from_version=1, to_version=1)
    # stats skipping still lossless off the checkpointed adds
    med = out.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    preds = [("user_id", "<=", float(med))]
    got = dl.read_delta(spark, path, predicates=preds).count()
    assert got == out.filter(F.col("user_id") <= float(med)).count()
    adds = dl._live_adds(path, dl._list_versions(path)[-1])
    kept = [r for r, a in adds.items()
            if not any(dl._stats_can_skip(a, c, op, x) for c, op, x in preds)]
    assert len(kept) < len(adds)  # z-order made the skip real
    # txn high-water survived checkpoint + expiry
    assert dl.last_txn_version(path, "life") == 0
    # history shows the floor entry for expired versions
    ops = [h["operation"] for h in dl.table_history(path)]
    assert "CHECKPOINT" in ops


def test_cdf_incremental_replication(spark, sf_dir, tmp_path):
    """silver->gold sync: replicate_incremental applies only the
    change feed since its high-water mark; re-runs are no-ops and the
    destination always equals the source head."""
    src = str(tmp_path / "repl_src")
    dst = str(tmp_path / "repl_dst")
    o = _orders(spark, sf_dir).limit(120).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, src)

    # first sync: full snapshot bootstrap
    assert dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"]) == 0
    assert dl.read_delta(spark, dst).count() == 120
    # already up to date
    assert dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"]) is None

    # source evolves: merge (upsert 6 + insert 2, with CDF), then a
    # delete-merge, then a change-less OPTIMIZE
    upd = (dl.read_delta(spark, src).orderBy("o_orderkey").limit(6)
           .withColumn("o_totalprice", F.lit(777.0)))
    mx = dl.read_delta(spark, src).agg(F.max("o_orderkey")).collect()[0][0]
    new = upd.limit(2).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(mx + 1))
    dl.merge_delta(spark, src, upd.unionByName(new), on=["o_orderkey"],
                   change_data=True)
    victims = (dl.read_delta(spark, src).orderBy(F.desc("o_orderkey")).limit(3)
               .select("o_orderkey", "o_totalprice"))
    dl.merge_delta(spark, src, victims, on=["o_orderkey"],
                   when_matched="delete", when_not_matched=None, change_data=True)
    dl.compact_delta(spark, src, target_file_bytes=1 << 30)

    applied = dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"])
    assert applied == dl._list_versions(src)[-1]

    got = dl.read_delta(spark, dst).select("o_orderkey", "o_totalprice")
    want = dl.read_delta(spark, src).select("o_orderkey", "o_totalprice")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # idempotent: a re-run (crash recovery) changes nothing
    n_dst_versions = len(dl._list_versions(dst))
    assert dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"]) is None
    assert len(dl._list_versions(dst)) == n_dst_versions


def test_cdf_replication_synthesized_feed(spark, sf_dir, tmp_path):
    """Regression for the delete/upsert ordering bug: commits WITHOUT
    explicit cdc actions (merge with change_data=False, or an
    overwrite) synthesize the change feed from file actions, so every
    key of a rewritten file shows up as BOTH 'delete' and 'insert' in
    the same version — updated rows AND innocent co-resident rows.
    Replication must apply deletes before upserts or those still-live
    rows vanish from the destination."""
    src = str(tmp_path / "synth_src")
    dst = str(tmp_path / "synth_dst")
    o = _orders(spark, sf_dir).limit(100).select("o_orderkey", "o_totalprice")
    dl.write_delta(o.coalesce(1), src)  # one file => maximal co-residency
    assert dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"]) == 0

    # v1: merge WITHOUT change_data — the synthesized feed lists all
    # 100 co-resident keys as delete+insert, only 5 actually changed
    upd = (dl.read_delta(spark, src).orderBy("o_orderkey").limit(5)
           .withColumn("o_totalprice", F.lit(111.0)))
    dl.merge_delta(spark, src, upd, on=["o_orderkey"])  # change_data=False

    # v2: overwrite with a disjointly-modified snapshot (drops 10 rows)
    keep = (dl.read_delta(spark, src).orderBy("o_orderkey")
            .limit(90).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0)))
    dl.write_delta(keep.coalesce(1), src, mode="overwrite")

    applied = dl.replicate_incremental(spark, src, dst, keys=["o_orderkey"])
    assert applied == dl._list_versions(src)[-1]
    got = dl.read_delta(spark, dst).select("o_orderkey", "o_totalprice")
    want = dl.read_delta(spark, src).select("o_orderkey", "o_totalprice")
    assert got.count() == want.count() == 90
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_check_constraints_gate_writes_and_merges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_check")
    o = _orders(spark, sf_dir).limit(50).select("o_orderkey", "o_totalprice")
    dl.write_delta(o, path)
    v = dl.add_check_constraint(path, "price_positive", "o_totalprice > 0")
    assert v == 1
    conf = dl.table_metadata(path)["configuration"]
    assert conf["delta.constraints.price_positive"] == "o_totalprice > 0"

    good = o.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    dl.write_delta(good, path, mode="append")  # passes

    bad = good.withColumn("o_totalprice", F.lit(-5.0)).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000))
    n_versions = len(dl._list_versions(path))
    with pytest.raises(dl.DeltaConstraintViolation, match="price_positive"):
        dl.write_delta(bad, path, mode="append")
    with pytest.raises(dl.DeltaConstraintViolation, match="price_positive"):
        dl.merge_delta(spark, path, bad, on=["o_orderkey"])
    assert len(dl._list_versions(path)) == n_versions  # nothing committed
    assert dl.read_delta(spark, path).filter(F.col("o_totalprice") <= 0).count() == 0

    # NULL is unknown, not a violation (ANSI CHECK semantics)
    nullish = good.withColumn("o_totalprice", F.lit(None).cast("double")).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(30_000_000))
    dl.write_delta(nullish, path, mode="append")
    # delete-merges never validate (they only remove rows)
    dl.merge_delta(spark, path, dl.read_delta(spark, path).limit(2),
                   on=["o_orderkey"], when_matched="delete", when_not_matched=None)


def test_zorder_key_supports_string_columns_by_hash(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(i, f"cat-{i % 7}") for i in range(200)], "v long, tag string")
    out = df.withColumn("z", zorder_key(df, ["v", "tag"], bits=4))
    # deterministic and total: same tag+bucket -> same interleave bits
    a = {(r["v"], r["tag"]): r["z"] for r in out.collect()}
    b = {(r["v"], r["tag"]): r["z"] for r in out.collect()}
    assert a == b and len(a) == 200


def test_vacuum_ages_out_change_data_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_vac_cdf")
    o = _orders(spark, sf_dir).limit(40)
    dl.write_delta(o, path)
    upd = (dl.read_delta(spark, path).orderBy("o_orderkey").limit(3)
           .withColumn("o_totalprice", F.lit(1.0)))
    dl.merge_delta(spark, path, upd, on=["o_orderkey"], change_data=True)
    cdf_root = os.path.join(path, "_change_data")
    assert os.path.isdir(cdf_root) and any(os.scandir(cdf_root))

    # within retention: feed intact
    dl.vacuum_delta(path)
    assert dl.read_change_feed(spark, path, from_version=1).count() > 0

    # zero retention: change files reclaimed
    deleted = dl.vacuum_delta(path, retention_ms=0)
    assert any(r.startswith("_change_data") for r in deleted)
    assert not any(
        f for _, _, fs in os.walk(cdf_root) for f in fs if f.endswith(".parquet"))
    # table data is untouched
    assert dl.read_delta(spark, path).count() == 40


def test_checkpoint_readable_by_independent_engine(spark, sf_dir, tmp_path):
    """The protocol checkpoint parquet must be consumable WITHOUT our
    reader or Spark: DuckDB reads the checkpoint file + tail JSON,
    reconstructs the live-file set, scans those parquet files, and
    must reproduce the table exactly."""
    import urllib.parse

    import duckdb

    path = str(tmp_path / "delta_ckpt_interop")
    o = _orders(spark, sf_dir).limit(150).select("o_orderkey", "o_totalprice")
    a, b = o.filter(F.col("o_orderkey") % 2 == 0), o.filter(F.col("o_orderkey") % 2 == 1)
    dl.write_delta(a, path)
    dl.write_delta(b, path, mode="append")
    dl.checkpoint_delta(path)
    dl.expire_delta_log(path)
    more = o.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    dl.write_delta(more, path, mode="append")

    con = duckdb.connect()
    ck = json.load(open(os.path.join(path, "_delta_log", "_last_checkpoint")))
    ck_file = os.path.join(path, "_delta_log", f"{ck['version']:020d}.checkpoint.parquet")
    live = {
        urllib.parse.unquote(r[0])
        for r in con.execute(
            "SELECT add.path FROM read_parquet(?) WHERE add IS NOT NULL",
            [ck_file]).fetchall()
    }
    log = os.path.join(path, "_delta_log")
    for fname in sorted(os.listdir(log)):
        if not fname.endswith(".json") or int(fname[:-5]) <= ck["version"]:
            continue
        for line in open(os.path.join(log, fname)):
            if not line.strip():
                continue
            act = json.loads(line)
            if "add" in act:
                live.add(urllib.parse.unquote(act["add"]["path"]))
            elif "remove" in act:
                live.discard(urllib.parse.unquote(act["remove"]["path"]))
    files = [os.path.join(path, rel) for rel in sorted(live)]
    n, s = con.execute(
        "SELECT count(*), sum(o_totalprice) FROM read_parquet(?)", [files]
    ).fetchone()
    want = dl.read_delta(spark, path).agg(
        F.count(F.lit(1)), F.sum("o_totalprice")).collect()[0]
    assert n == want[0] == 155
    assert abs(s - want[1]) < 1e-6


def test_with_commit_retry_rebases_on_loss(spark, sf_dir, tmp_path, monkeypatch):
    path = str(tmp_path / "delta_retry")
    o = _orders(spark, sf_dir).limit(30)
    dl.write_delta(o, path)

    calls = {"n": 0}
    real_put = dl.commit_put_if_absent

    def flaky(tmp, dst):
        calls["n"] += 1
        if calls["n"] == 1:  # first attempt loses the race
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise dl.DeltaConcurrentWriteError("simulated loss")
        real_put(tmp, dst)

    monkeypatch.setattr(dl, "commit_put_if_absent", flaky)
    v = dl.with_commit_retry(
        lambda: dl.write_delta(o.limit(5), path, mode="append"))
    assert v == 1 and calls["n"] == 2
    assert dl.read_delta(spark, path).count() == 35

    # exhausted retries propagate
    def always(tmp, dst):
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise dl.DeltaConcurrentWriteError("hot table")
    monkeypatch.setattr(dl, "commit_put_if_absent", always)
    with pytest.raises(dl.DeltaConcurrentWriteError):
        dl.with_commit_retry(
            lambda: dl.write_delta(o.limit(5), path, mode="append"), retries=2)


def test_maintain_delta_policy(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta_maintain")
    o = _orders(spark, sf_dir).limit(400)
    # create lots of tiny files via many appends
    dl.write_delta(o.limit(50).repartition(4), path)
    for i in range(1, 6):
        dl.write_delta(
            o.filter(F.col("o_orderkey") % 6 == i).repartition(4),
            path, mode="append")

    report = dl.maintain_delta(spark, path, max_small_files=8,
                               small_file_bytes=1 << 20,
                               target_file_bytes=1 << 20,
                               checkpoint_every=3, retention_ms=0)
    assert report["compacted"] and report["checkpointed"]
    assert report["vacuumed"] > 0
    n_live = len(dl._live_files(path, dl._list_versions(path)[-1]))
    assert n_live <= 8
    n = dl.read_delta(spark, path).count()

    # a healthy table is untouched on the next run
    report2 = dl.maintain_delta(spark, path, max_small_files=8,
                                small_file_bytes=1 << 20,
                                checkpoint_every=3, retention_ms=0)
    assert not report2["compacted"] and not report2["checkpointed"]
    assert dl.read_delta(spark, path).count() == n


def test_zorder_key_temporal_columns(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.layout import zorder_key

    df = spark.sql("""
        SELECT id,
               date_add(DATE '2024-01-01', CAST(id AS INT)) AS d,
               timestamp_millis(1700000000000 + id * 3600000) AS ts
        FROM range(0, 64)
    """)
    out = df.withColumn("z", zorder_key(df, ["d", "ts"], bits=4)).collect()
    zs = {r["id"]: r["z"] for r in out}
    assert len(set(zs.values())) > 1  # ranks spread, not constant
    # both columns increase with id, so z must be monotone overall
    ordered = [zs[i] for i in range(64)]
    assert ordered == sorted(ordered)


def test_timestamp_as_of_travel(spark, sf_dir, tmp_path):
    """Delta TIMESTAMP AS OF via commitInfo timestamps: resolves to
    the last version committed at or before the instant; loud on
    pre-history instants; exclusive with version."""
    import pytest as _pt

    path = str(tmp_path / "tt")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(60)
    dl.write_delta(o.limit(40), path)
    dl.write_delta(o.limit(20), path, mode="append")
    hist = {h["version"]: h["timestamp"] for h in dl.table_history(path)
            if h["version"] is not None}

    assert dl.read_delta(spark, path,
                         as_of_timestamp_ms=hist[0]).count() == 40
    assert dl.read_delta(
        spark, path, as_of_timestamp_ms=hist[1] + 10_000).count() == 60
    with _pt.raises(ValueError, match="at or before"):
        dl.read_delta(spark, path, as_of_timestamp_ms=hist[0] - 1)
    with _pt.raises(ValueError, match="not both"):
        dl.read_delta(spark, path, version=0,
                      as_of_timestamp_ms=hist[0])


def test_net_changes_folds_cdc(spark, tmp_path):
    """Round 13 — the CDC net-diff view: chained updates fold to one
    `modified` row with the last postimage, insert-then-delete inside
    the range nets to NOTHING, update-then-delete reads `removed`
    with the delete's preimage, and the whole-history view classifies
    surviving keys `added` regardless of later edits."""
    tbl = str(tmp_path / "nc")

    def rows(*ids):
        return spark.createDataFrame([(i, f"t{i}") for i in ids],
                                     "id long, text string")

    dl.write_delta(rows(1, 2, 3), tbl)                           # v0
    for txt in ("t2b", "t2c"):                                   # v1,v2
        dl.merge_delta(spark, tbl,
                       spark.createDataFrame([(2, txt)],
                                             "id long, text string"),
                       on=["id"], when_matched="update",
                       when_not_matched=None, change_data=True)
    dl.merge_delta(spark, tbl, rows(3), on=["id"],
                   when_matched="delete", when_not_matched=None,
                   change_data=True)                             # v3
    dl.write_delta(rows(4, 5), tbl, mode="append")               # v4
    dl.merge_delta(spark, tbl, rows(5), on=["id"],
                   when_matched="delete", when_not_matched=None,
                   change_data=True)                             # v5

    got = {r["id"]: (r["text"], r["net_change"],
                     r["last_commit_version"])
           for r in dl.net_changes(spark, tbl, "id",
                                   from_version=1).collect()}
    assert got == {2: ("t2c", "modified", 2),
                   3: ("t3", "removed", 3),
                   4: ("t4", "added", 4)}  # 5 netted away, 1 untouched
    got0 = {r["id"]: r["net_change"]
            for r in dl.net_changes(spark, tbl, "id").collect()}
    assert got0 == {1: "added", 2: "added", 4: "added"}
    dl.merge_delta(spark, tbl, rows(2), on=["id"],
                   when_matched="delete", when_not_matched=None,
                   change_data=True)                             # v6
    got2 = {r["id"]: (r["text"], r["net_change"])
            for r in dl.net_changes(spark, tbl, "id",
                                    from_version=1).collect()}
    assert got2[2] == ("t2c", "removed")
