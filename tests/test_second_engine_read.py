"""Second-engine read of iceberg_lite tables, OFFLINE: DuckDB executes
the data scan while an INDEPENDENT metadata walk (the test-local Avro
decoder from test_avro_lite + fresh JSON/bounds parsing written here,
sharing no code with iceberg_lite's reader) resolves the current
snapshot's files — the closest in-container stand-in for the
reference's "same table readable by a second engine" claim
(/root/reference/README.md:121-124,141) while the DuckDB
iceberg/delta extensions stay network-blocked."""

from __future__ import annotations

import json
import os
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import iceberg_lite as il
from snowflake_medtech_vigilance_lakehouse_spark.sources.uniform import publish_uniform
from tests.test_avro_lite import _ind_read_container


def _ind_current_files(path, meta=None):
    """Independent snapshot resolution: version-hint -> metadata JSON
    -> manifest list (Avro) -> manifests (Avro) -> live data files.
    Returns (rel_paths, manifest_entries).

    ``meta`` short-circuits the filesystem DISCOVERY half: when the
    table metadata document came from somewhere else (the REST
    catalog's LoadTableResult), the walk starts directly at its
    manifest list and never touches version-hint.text or
    v{N}.metadata.json — the scan plan then derives solely from what
    the catalog served."""
    if meta is None:
        with open(os.path.join(path, "metadata", "version-hint.text")) as f:
            version = int(f.read().strip())
        with open(os.path.join(path, "metadata",
                               f"v{version}.metadata.json")) as f:
            meta = json.load(f)
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests, _ = _ind_read_container(
        os.path.join(path, snap["manifest-list"]))
    entries = []
    for m in manifests:
        _, recs, _ = _ind_read_container(
            os.path.join(path, m["manifest_path"]))
        entries.extend(r for r in recs if r["status"] != 2)
    return [e["data_file"]["file_path"] for e in entries], entries


def test_duckdb_reads_iceberg_table_via_independent_metadata_walk(
        spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice2")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")).limit(300))
    il.write_iceberg(o, path, partition_by=["yyyy"])
    il.write_iceberg(o.limit(50), path, mode="append",
                     partition_by=["yyyy"])

    files, _ = _ind_current_files(path)
    assert files
    con = duckdb.connect()
    globs = [os.path.join(path, rel) for rel in files]
    n, s = con.execute(
        "SELECT count(*), sum(o_orderkey) FROM read_parquet(?)",
        [globs]).fetchone()
    # the second engine sees exactly what iceberg_lite (and the
    # source frame) see
    assert n == 350
    assert s == (o.agg(F.sum("o_orderkey")).first()[0]
                 + o.limit(50).agg(F.sum("o_orderkey")).first()[0])
    ours = il.read_iceberg(spark, path)
    assert ours.count() == n
    assert ours.agg(F.sum("o_orderkey")).first()[0] == s


def test_duckdb_prunes_from_independently_decoded_bounds(
        spark, sf_dir, tmp_path):
    """File skipping an EXTERNAL planner would do: decode the
    manifests' lower/upper bounds with a fresh single-value
    deserializer (little-endian struct.unpack written here), plan the
    file list for a point predicate, and let DuckDB scan only the
    survivors — result equals DuckDB's own full-scan filter."""
    path = str(tmp_path / "ice_prune")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .orderBy("o_orderkey").repartitionByRange(4, "o_orderkey")
         .sortWithinPartitions("o_orderkey"))
    il.write_iceberg(o, path)

    with open(os.path.join(path, "metadata", "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(path, "metadata",
                           f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    okey_id = next(f_["id"] for f_ in meta["schemas"][0]["fields"]
                   if f_["name"] == "o_orderkey")

    files, entries = _ind_current_files(path)
    con = duckdb.connect()
    all_globs = [os.path.join(path, rel) for rel in files]
    probe = con.execute(
        "SELECT min(o_orderkey) + 1 FROM read_parquet(?)",
        [all_globs]).fetchone()[0]

    keep = []
    for e in entries:
        lb = {x["key"]: x["value"] for x in e["data_file"]["lower_bounds"]}
        lo = struct.unpack("<q", lb[okey_id])[0]  # spec: long, little-endian
        if lo <= probe:  # predicate o_orderkey <= probe can match
            keep.append(os.path.join(path, e["data_file"]["file_path"]))
    assert 0 < len(keep) < len(files)  # pruning is real
    pruned_n = con.execute(
        "SELECT count(*) FROM read_parquet(?) WHERE o_orderkey <= ?",
        [keep, probe]).fetchone()[0]
    full_n = con.execute(
        "SELECT count(*) FROM read_parquet(?) WHERE o_orderkey <= ?",
        [all_globs, probe]).fetchone()[0]
    assert pruned_n == full_n > 0  # lossless from the external side


def test_duckdb_reads_uniform_table_through_iceberg_plane(
        spark, sf_dir, tmp_path):
    """One physical copy, three readers: delta_lite, iceberg_lite, and
    DuckDB through the independently-walked Iceberg plane — after a
    MERGE has exercised the maintenance mirror."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)

    path = str(tmp_path / "uni2")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")).limit(100)
         .select("o_orderkey", "o_totalprice", "yyyy"))
    publish_uniform(o, path, partition_by=["yyyy"])
    src = o.limit(10).withColumn("o_totalprice", F.lit(0.0))
    dl.merge_delta(spark, path, src, on=["o_orderkey"],
                   when_matched="update", when_not_matched=None)

    files, _ = _ind_current_files(path)
    con = duckdb.connect()
    n, zeros = con.execute(
        "SELECT count(*), sum(CASE WHEN o_totalprice = 0 THEN 1 ELSE 0 END)"
        " FROM read_parquet(?)",
        [[os.path.join(path, rel) for rel in files]]).fetchone()
    assert n == 100 and zeros == 10
    assert dl.read_delta(spark, path).count() == 100


def test_duckdb_scan_planned_solely_from_rest_load_table(
        spark, sf_dir, tmp_path):
    """The reference's Open-Catalog verification claim composed
    end-to-end (README.md:121-124,141): the second engine resolves the
    table by NAME over HTTP and its scan plan derives SOLELY from the
    REST LoadTableResult — the independent metadata walk starts at the
    served metadata document, never reading version-hint.text or
    v{N}.metadata.json from the filesystem (both are deleted before
    the walk to prove it). Covers a partitioned append table AND the
    uniform table's Iceberg plane after a Delta MERGE."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        rest_catalog as rc)

    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")))

    path = str(tmp_path / "ice_rest")
    base = o.limit(200)
    il.write_iceberg(base, path, partition_by=["yyyy"])
    il.write_iceberg(base.limit(40), path, mode="append",
                     partition_by=["yyyy"])

    upath = str(tmp_path / "uni_rest")
    u = base.limit(100).select("o_orderkey", "o_totalprice", "yyyy")
    publish_uniform(u, upath, partition_by=["yyyy"])
    dl.merge_delta(spark, upath,
                   u.limit(10).withColumn("o_totalprice", F.lit(0.0)),
                   on=["o_orderkey"], when_matched="update",
                   when_not_matched=None)

    root = str(tmp_path / "cat")
    rc.register_table(root, "marts", "orders", path)
    rc.register_table(root, "marts", "uni", upath)

    con = duckdb.connect()
    with rc.CatalogServer(root) as srv:
        results = {}
        for name in ("orders", "uni"):
            res = rc.load_table(srv.uri, "marts", name)
            table_root = os.path.dirname(
                os.path.dirname(res["metadata-location"]))
            # destroy every filesystem discovery aid: from here on the
            # ONLY way to plan the scan is the HTTP-served metadata
            os.remove(os.path.join(table_root, "metadata",
                                   "version-hint.text"))
            for f in os.listdir(os.path.join(table_root, "metadata")):
                if f.endswith(".metadata.json"):
                    os.rename(os.path.join(table_root, "metadata", f),
                              os.path.join(table_root, "metadata",
                                           f + ".hidden"))
            files, _ = _ind_current_files(table_root,
                                          meta=res["metadata"])
            assert files
            results[name] = con.execute(
                "SELECT count(*), sum(CASE WHEN o_totalprice = 0 "
                "THEN 1 ELSE 0 END) FROM read_parquet(?)",
                [[os.path.join(table_root, rel) for rel in files]]
            ).fetchone()

    assert results["orders"][0] == 240
    assert results["uni"] == (100, 10)  # post-MERGE uniform plane


def test_pyarrow_scan_planned_solely_from_rest_load_table(
        spark, sf_dir, tmp_path):
    """A THIRD engine through the same REST plane (the reference
    names two external verifiers, Trino + DuckDB; Trino cannot run in
    this container, so pyarrow.dataset — an independent C++ reader —
    stands in): the table resolves by NAME over HTTP, the scan plan
    derives SOLELY from the LoadTableResult (version-hint and
    v{N}.metadata.json destroyed first), and pyarrow's rows agree
    exactly with DuckDB planned from the identical file list AND with
    the engine's own iceberg_lite reader. A predicate + projection
    scan is also planned externally (pyarrow filter/columns) and
    cross-checked against DuckDB's filtered count."""
    import pyarrow.dataset as ds

    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        rest_catalog as rc)

    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")))

    path = str(tmp_path / "ice_pa")
    base = o.limit(200)
    il.write_iceberg(base, path, partition_by=["yyyy"])
    il.write_iceberg(base.limit(40), path, mode="append",
                     partition_by=["yyyy"])
    # the engine's own view, captured BEFORE the discovery aids die
    ours = il.read_iceberg(spark, path)
    ours_n = ours.count()
    ours_sum = ours.agg(F.sum("o_orderkey")).first()[0]

    upath = str(tmp_path / "uni_pa")
    u = base.limit(100).select("o_orderkey", "o_totalprice", "yyyy")
    publish_uniform(u, upath, partition_by=["yyyy"])
    dl.merge_delta(spark, upath,
                   u.limit(10).withColumn("o_totalprice", F.lit(0.0)),
                   on=["o_orderkey"], when_matched="update",
                   when_not_matched=None)

    root = str(tmp_path / "cat_pa")
    rc.register_table(root, "marts", "orders", path)
    rc.register_table(root, "marts", "uni", upath)

    con = duckdb.connect()
    with rc.CatalogServer(root) as srv:
        out = {}
        for name in ("orders", "uni"):
            res = rc.load_table(srv.uri, "marts", name)
            table_root = os.path.dirname(
                os.path.dirname(res["metadata-location"]))
            os.remove(os.path.join(table_root, "metadata",
                                   "version-hint.text"))
            for f in os.listdir(os.path.join(table_root, "metadata")):
                if f.endswith(".metadata.json"):
                    os.rename(os.path.join(table_root, "metadata", f),
                              os.path.join(table_root, "metadata",
                                           f + ".hidden"))
            files, _ = _ind_current_files(table_root,
                                          meta=res["metadata"])
            paths = [os.path.join(table_root, rel) for rel in files]
            dset = ds.dataset(paths, format="parquet")
            tbl = dset.to_table(columns=["o_orderkey", "o_totalprice"])
            pa_rows = sorted(zip(tbl.column("o_orderkey").to_pylist(),
                                 tbl.column("o_totalprice").to_pylist()))
            duck_rows = sorted(con.execute(
                "SELECT o_orderkey, o_totalprice FROM read_parquet(?)",
                [paths]).fetchall())
            assert pa_rows == duck_rows and len(pa_rows) > 0
            out[name] = (dset, paths, pa_rows)

        dset, paths, pa_rows = out["orders"]
        assert len(pa_rows) == 240 == ours_n
        assert sum(k for k, _ in pa_rows) == ours_sum

        # uniform plane after the Delta MERGE: the third engine sees
        # the post-merge rows, zeros included
        _, _, uni_rows = out["uni"]
        assert len(uni_rows) == 100
        assert sum(1 for _, p in uni_rows if p == 0) == 10

        # externally-planned predicate + projection: pyarrow pushes
        # the filter into its scan; DuckDB agrees on the same plan
        probe = min(k for k, _ in pa_rows) + 1
        flt = dset.to_table(columns=["o_orderkey"],
                            filter=ds.field("o_orderkey") <= probe)
        duck_n = con.execute(
            "SELECT count(*) FROM read_parquet(?) WHERE o_orderkey <= ?",
            [paths, probe]).fetchone()[0]
        assert flt.num_rows == duck_n > 0
