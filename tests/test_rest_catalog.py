"""REST catalog surface (S7 tail; the reference's Open Catalog
discovery point, README.md:121-124): tables resolved by
namespace.name through an HTTP endpoint, metadata-only traffic."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import iceberg_lite as il
from snowflake_medtech_vigilance_lakehouse_spark.sources import rest_catalog as rc


def _orders(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .withColumn("yyyy", F.year("o_orderdate")))


def test_catalog_discovery_and_read_by_name(spark, sf_dir, tmp_path):
    t1 = str(tmp_path / "t1")
    t2 = str(tmp_path / "t2")
    o = _orders(spark, sf_dir).limit(120)
    il.write_iceberg(o, t1, partition_by=["yyyy"])
    il.write_iceberg(o.limit(30), t2)
    root = str(tmp_path / "cat")
    rc.register_table(root, "marts", "adverse_events_enriched", t1)
    rc.register_table(root, "marts", "small", t2)
    rc.register_table(root, "raw", "events", t2)

    with rc.CatalogServer(root) as srv:
        assert rc.list_namespaces(srv.uri) == ["marts", "raw"]
        assert rc.list_tables(srv.uri, "marts") == [
            "adverse_events_enriched", "small"]

        res = rc.load_table(srv.uri, "marts", "adverse_events_enriched")
        # LoadTableResult: current metadata-location + full table-spec
        # metadata (snapshots, field-id schema) — what an engine plans
        # its scan from
        assert res["metadata-location"].endswith(".metadata.json")
        assert res["metadata"]["format-version"] == 2
        assert res["metadata"]["snapshots"]

        # reading BY NAME equals reading by path, predicates included
        by_name = rc.read_catalog_table(
            spark, srv.uri, "marts", "adverse_events_enriched")
        by_path = il.read_iceberg(spark, t1)
        assert by_name.count() == by_path.count() == 120
        assert by_name.exceptAll(by_path).count() == 0
        probe = by_path.agg(F.min("o_orderkey")).first()[0]
        pruned = rc.read_catalog_table(
            spark, srv.uri, "marts", "adverse_events_enriched",
            predicates=[("o_orderkey", "<=", probe)])
        assert pruned.count() == by_path.filter(
            F.col("o_orderkey") <= probe).count() > 0

        # unknown names are typed 404s, not HTML stack traces
        for route in ("/v1/namespaces/nope/tables",
                      "/v1/namespaces/marts/tables/nope"):
            with pytest.raises(urllib.error.HTTPError) as e:
                rc._get(srv.uri, route)
            assert e.value.code == 404
            assert json.loads(e.value.read())["error"]["type"] == \
                "NoSuchObjectException"


def test_catalog_register_endpoint_and_drop(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    il.write_iceberg(_orders(spark, sf_dir).limit(40), t)
    root = str(tmp_path / "cat")

    with rc.CatalogServer(root) as srv:
        # spec RegisterTableRequest: register an EXISTING table by its
        # metadata-location through the endpoint itself
        version = il._list_meta_versions(t)[-1]
        body = json.dumps({
            "name": "events",
            "metadata-location": il._meta_path(t, version),
        }).encode()
        req = urllib.request.Request(
            f"{srv.uri}/v1/namespaces/bronze/register", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert res["metadata"]["snapshots"]
        assert rc.list_tables(srv.uri, "bronze") == ["events"]
        assert rc.read_catalog_table(
            spark, srv.uri, "bronze", "events").count() == 40

        # a new COMMIT is visible on the next load (the catalog always
        # serves the current metadata version)
        il.write_iceberg(_orders(spark, sf_dir).limit(10), t, mode="append")
        assert rc.read_catalog_table(
            spark, srv.uri, "bronze", "events").count() == 50

        rc.drop_table(root, "bronze", "events")
        assert rc.list_namespaces(srv.uri) == []
    # data untouched by the drop (external-table semantics)
    assert il.read_iceberg(spark, t).count() == 50


def test_catalog_refuses_uncommitted_table(tmp_path):
    with pytest.raises(FileNotFoundError):
        rc.register_table(str(tmp_path / "cat"), "ns", "t",
                          str(tmp_path / "not_a_table"))


def test_catalog_confines_registrations_to_allowed_root(
        spark, sf_dir, tmp_path):
    """allowed_root: HTTP registrations/creates outside the configured
    tree are a typed 403 — without it any client reaching the port
    could point the catalog at an arbitrary local path and read its
    metadata through the API."""
    inside = tmp_path / "warehouse" / "t_in"
    outside = tmp_path / "elsewhere" / "t_out"
    o = _orders(spark, sf_dir).limit(20)
    il.write_iceberg(o, str(inside))
    il.write_iceberg(o, str(outside))
    root = str(tmp_path / "cat")

    with rc.CatalogServer(
            root, allowed_root=str(tmp_path / "warehouse")) as srv:
        def post_register(path):
            version = il._list_meta_versions(path)[-1]
            body = json.dumps({
                "name": "t",
                "metadata-location": il._meta_path(path, version),
            }).encode()
            req = urllib.request.Request(
                f"{srv.uri}/v1/namespaces/ns/register", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        with pytest.raises(urllib.error.HTTPError) as e:
            post_register(str(outside))
        assert e.value.code == 403
        assert json.loads(e.value.read())["error"]["type"] == \
            "ForbiddenException"
        with pytest.raises(urllib.error.HTTPError) as e:
            rc.create_table(srv.uri, "ns", "t2", str(outside))
        assert e.value.code == 403
        # symlink escape is resolved, not fooled
        link = tmp_path / "warehouse" / "sneaky"
        link.symlink_to(outside)
        with pytest.raises(urllib.error.HTTPError) as e:
            rc.create_table(srv.uri, "ns", "t3", str(link))
        assert e.value.code == 403

        assert post_register(str(inside))["metadata"]["snapshots"]
        assert rc.read_catalog_table(spark, srv.uri, "ns", "t").count() == 20


def test_catalog_create_table_and_duplicate_409(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    il.write_iceberg(_orders(spark, sf_dir).limit(30), t)
    root = str(tmp_path / "cat")
    with rc.CatalogServer(root) as srv:
        res = rc.create_table(srv.uri, "marts", "orders", t)
        assert res["metadata"]["snapshots"]
        assert rc.list_tables(srv.uri, "marts") == ["orders"]
        with pytest.raises(FileExistsError, match="already exists"):
            rc.create_table(srv.uri, "marts", "orders", t)
        assert rc.read_catalog_table(
            spark, srv.uri, "marts", "orders").count() == 30


def test_catalog_commit_two_writers_optimistic_concurrency(
        spark, sf_dir, tmp_path):
    """The catalog-mediated write path: two engines append data files
    to the same table and commit THROUGH the catalog from the SAME
    base — the first wins, the second gets a typed 409
    CommitFailedException, rebuilds against the fresh base
    (catalog_commit_data_files' retry loop) and lands. Both appends
    survive; by-name reads and iceberg_lite agree."""
    import os

    t = str(tmp_path / "t")
    o = _orders(spark, sf_dir).limit(50)
    il.write_iceberg(o, t)
    root = str(tmp_path / "cat")

    def land(df):
        """Engine-side data I/O: files under data/, no commit yet."""
        before = il._data_files(t)
        df.write.mode("append").parquet(os.path.join(t, "data"))
        return sorted(il._data_files(t) - before)

    with rc.CatalogServer(root) as srv:
        rc.create_table(srv.uri, "marts", "orders", t)
        base = rc.load_table(srv.uri, "marts", "orders")[
            "metadata-location"]

        files_a = land(o.limit(10))
        files_b = land(o.limit(5))
        meta_a, _ = il.build_commit_metadata(
            o.schema.json(), t, files_a, mode="append")
        meta_b, _ = il.build_commit_metadata(
            o.schema.json(), t, files_b, mode="append")

        # writer A wins the version
        resA = rc.commit_table(srv.uri, "marts", "orders", base, meta_a)
        assert resA["metadata-location"] != base
        # writer B's base is stale -> typed conflict, nothing published
        with pytest.raises(rc.CommitFailedError, match="stale"):
            rc.commit_table(srv.uri, "marts", "orders", base, meta_b)
        assert rc.read_catalog_table(
            spark, srv.uri, "marts", "orders").count() == 60

        # B retries through the load-rebuild-commit loop and lands
        resB = rc.catalog_commit_data_files(
            srv.uri, "marts", "orders", o.schema.json(), files_b,
            mode="append")
        assert resB["metadata-location"] != resA["metadata-location"]
        assert rc.read_catalog_table(
            spark, srv.uri, "marts", "orders").count() == 65
    assert il.read_iceberg(spark, t).count() == 65

    # a commit built for a DIFFERENT table lineage is refused
    t2 = str(tmp_path / "t2")
    il.write_iceberg(o.limit(3), t2)
    with rc.CatalogServer(root) as srv:
        cur = rc.load_table(srv.uri, "marts", "orders")
        alien, _ = il.build_commit_metadata(
            o.schema.json(), t2, [], mode="append")
        with pytest.raises(rc.CommitFailedError, match="lineage"):
            rc.commit_table(srv.uri, "marts", "orders",
                            cur["metadata-location"], alien)


def test_catalog_commit_refuses_malformed_metadata(spark, sf_dir, tmp_path):
    """Structural validation before the swap: a commit whose document
    would wedge every subsequent loadTable (no snapshots, dangling
    current-snapshot-id, missing manifest-list file) is the CLIENT's
    typed 409 — never published, never the next reader's 500."""
    t = str(tmp_path / "t")
    o = _orders(spark, sf_dir).limit(20)
    il.write_iceberg(o, t)
    root = str(tmp_path / "cat")
    with rc.CatalogServer(root) as srv:
        rc.create_table(srv.uri, "marts", "orders", t)
        cur = rc.load_table(srv.uri, "marts", "orders")
        base, good = cur["metadata-location"], cur["metadata"]

        import copy
        for mutate, msg in (
                (lambda m: m.update({"snapshots": []}), "no snapshots"),
                (lambda m: m.update({"current-snapshot-id": 999}),
                 "not among snapshots"),
                (lambda m: m["snapshots"][-1].update(
                    {"manifest-list": "metadata/nope.avro"}),
                 "does not exist"),
                (lambda m: m.update({"format-version": 1}),
                 "format-version"),
        ):
            m = copy.deepcopy(good)
            mutate(m)
            with pytest.raises(rc.CommitFailedError, match=msg):
                rc.commit_table(srv.uri, "marts", "orders", base, m)
        # nothing was published; the table still loads and reads
        assert rc.load_table(srv.uri, "marts", "orders")[
            "metadata-location"] == base
        assert rc.read_catalog_table(
            spark, srv.uri, "marts", "orders").count() == 20


def test_catalog_drop_table_endpoint(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    il.write_iceberg(_orders(spark, sf_dir).limit(15), t)
    root = str(tmp_path / "cat")
    with rc.CatalogServer(root) as srv:
        rc.create_table(srv.uri, "marts", "orders", t)
        rc.drop_table_http(srv.uri, "marts", "orders")
        assert rc.list_namespaces(srv.uri) == []
        with pytest.raises(urllib.error.HTTPError) as e:
            rc.drop_table_http(srv.uri, "marts", "orders")
        assert e.value.code == 404
    # external-table semantics: data untouched by the drop
    assert il.read_iceberg(spark, t).count() == 15


def test_catalog_concurrent_mutations_lose_no_updates(spark, sf_dir,
                                                      tmp_path):
    """The registry read-modify-write is serialized: the server is
    threaded, so without the lock two concurrent creates (or a create
    racing a drop) load the same registry snapshot and the LAST save
    silently undoes the other's change. Hammer the mutation routes
    from many threads and assert every accepted mutation survived."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "t")
    il.write_iceberg(_orders(spark, sf_dir).limit(10), t)
    root = str(tmp_path / "cat")
    with rc.CatalogServer(root) as srv:
        names = [f"tab{i:02d}" for i in range(16)]
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(
                lambda n: rc.create_table(srv.uri, "marts", n, t), names))
        assert rc.list_tables(srv.uri, "marts") == sorted(names)

        # concurrent drops: each accepted (204) drop must stick, and
        # the survivors are exactly the undropped half
        def _drop(n):
            req = urllib.request.Request(
                f"{srv.uri}/v1/namespaces/marts/tables/{n}",
                method="DELETE")
            with urllib.request.urlopen(req) as r:
                return r.status
        with ThreadPoolExecutor(max_workers=8) as pool:
            codes = list(pool.map(_drop, names[:8]))
        assert codes == [204] * 8
        assert rc.list_tables(srv.uri, "marts") == sorted(names[8:])
