"""Minimal Iceberg REST catalog — the cross-engine discovery surface
the reference's architecture names (Open Catalog; /root/reference/
README.md:121-124): engines find tables by NAMESPACE.NAME through an
HTTP endpoint instead of sharing filesystem paths.

Implements the read side of the public Iceberg REST Catalog OpenAPI
(the endpoints every engine's catalog client starts with) over
``iceberg_lite`` tables, plus table registration:

    GET  /v1/config                               -> catalog config
    GET  /v1/namespaces                           -> namespace list
    GET  /v1/namespaces/{ns}                      -> namespace props
    GET  /v1/namespaces/{ns}/tables               -> table identifiers
    GET  /v1/namespaces/{ns}/tables/{table}       -> LoadTableResult
    HEAD /v1/namespaces/{ns}/tables/{table}       -> existence
    POST /v1/namespaces/{ns}/register             -> register by
                                                     metadata-location
    POST /v1/namespaces/{ns}/tables               -> createTable
                                                     (409 on exists)
    POST /v1/namespaces/{ns}/tables/{table}       -> commitTable:
                                                     base-check +
                                                     put-if-absent
                                                     version swap
                                                     (409 on conflict)
    DELETE /v1/namespaces/{ns}/tables/{table}     -> dropTable
                                                     (metadata only,
                                                     204)

Everything is Python stdlib (``http.server`` + ``urllib``) — no new
dependencies — and the registry is one JSON file next to the catalog
root, so the server is stateless across restarts. The LoadTableResult
carries the CURRENT ``metadata-location`` and the full table metadata
JSON exactly as committed by ``iceberg_lite`` (whose layout follows
the table-spec v2), which is what a real engine needs to plan a scan:
snapshots, manifest list locations, schema with field-ids, and — with
round 7's column stats — per-file bounds for pruning.

Scale note: a catalog serves METADATA ONLY (a few KB per request);
data I/O never passes through it. That is the design that lets one
catalog front 100 TB of tables — and why this server answers every
request from the registry file + the table's own metadata JSON,
without touching a data file.

Write path: engines commit THROUGH the catalog with the spec's
load-modify-commit flow — build the next metadata document against
the served base (``iceberg_lite.build_commit_metadata``), POST it to
commitTable with the base ``metadata-location``; the server refuses
with 409 ``CommitFailedException`` if the base is stale (another
writer won) or if the put-if-absent version write loses an internal
race, and the client rebuilds on the fresh base and retries
(:func:`catalog_commit_data_files`). That is the same
optimistic-concurrency discipline ``iceberg_lite`` enforces on
direct filesystem commits, now mediated for engines that only speak
HTTP to the catalog.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import iceberg_lite as il

_REGISTRY = "catalog-registry.json"


def _load_registry(root: str) -> dict:
    p = os.path.join(root, _REGISTRY)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_registry(root: str, reg: dict) -> None:
    os.makedirs(root, exist_ok=True)
    p = os.path.join(root, _REGISTRY)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=2)
    os.replace(tmp, p)


def register_table(root: str, namespace: str, name: str,
                   table_path: str) -> None:
    """Register an iceberg_lite table under ``namespace.name``.
    Validates the table has committed metadata before registering —
    a catalog must never hand out a dangling location."""
    il.table_metadata(table_path)  # raises if not a committed table
    reg = _load_registry(root)
    reg.setdefault(namespace, {})[name] = os.path.abspath(table_path)
    _save_registry(root, reg)


def drop_table(root: str, namespace: str, name: str) -> None:
    """Remove a registration (metadata only — data is untouched,
    exactly like an external-table DROP)."""
    reg = _load_registry(root)
    reg.get(namespace, {}).pop(name, None)
    if namespace in reg and not reg[namespace]:
        del reg[namespace]
    _save_registry(root, reg)


class _Handler(BaseHTTPRequestHandler):
    root: str = "."
    allowed_root: str | None = None
    # serializes registry READ-MODIFY-WRITE sections: the server is a
    # ThreadingHTTPServer, so two concurrent mutations (create/drop/
    # register) would otherwise both load the same registry snapshot
    # and the second _save_registry would silently undo the first
    # (lost update). Reads stay lock-free — _save_registry publishes
    # atomically via os.replace, so a reader never sees a torn file.
    # Class attribute: CatalogServer binds a FRESH lock per server
    # subtype, so two servers over different roots don't serialize
    # each other.
    _reg_lock = threading.Lock()

    def log_message(self, *a):  # quiet test runs
        pass

    def _confine(self, table_path: str) -> None:
        """Reject registrations/creates outside the configured data
        root: without this, any client that can reach the port could
        point the catalog at an arbitrary local filesystem path and
        read its metadata through the API."""
        if self.allowed_root is None:
            return
        root = os.path.realpath(self.allowed_root)
        p = os.path.realpath(table_path)
        if os.path.commonpath([root, p]) != root:
            raise PermissionError(
                f"table location {table_path} is outside the catalog's "
                f"allowed root {self.allowed_root}")

    def _json(self, code: int, payload: dict | None) -> None:
        body = b"" if payload is None else json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _not_found(self, what: str) -> None:
        self._json(404, {"error": {"message": f"{what} not found",
                                   "type": "NoSuchObjectException",
                                   "code": 404}})

    def _route(self):
        parts = [urllib.parse.unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        reg = _load_registry(self.root)
        if parts == ["v1", "config"]:
            return self._json(200, {"defaults": {}, "overrides": {}})
        if parts == ["v1", "namespaces"]:
            return self._json(200, {
                "namespaces": [[ns] for ns in sorted(reg)]})
        if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
            if parts[2] not in reg:
                return self._not_found(f"namespace {parts[2]}")
            return self._json(200, {"namespace": [parts[2]],
                                    "properties": {}})
        if (len(parts) == 4 and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"):
            ns = parts[2]
            if ns not in reg:
                return self._not_found(f"namespace {ns}")
            return self._json(200, {"identifiers": [
                {"namespace": [ns], "name": n} for n in sorted(reg[ns])]})
        if (len(parts) == 5 and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"):
            ns, name = parts[2], parts[4]
            path = reg.get(ns, {}).get(name)
            if path is None:
                return self._not_found(f"table {ns}.{name}")
            version = il._list_meta_versions(path)[-1]
            meta = il.table_metadata(path, version)
            return self._json(200, {
                "metadata-location": il._meta_path(path, version),
                "metadata": meta,
                "config": {},
            })
        return self._not_found(self.path)

    def do_GET(self):  # noqa: N802 (stdlib naming)
        try:
            self._route()
        except Exception as e:  # never leak a stack trace as HTML
            self._json(500, {"error": {"message": str(e),
                                       "type": type(e).__name__,
                                       "code": 500}})

    do_HEAD = do_GET  # noqa: N815

    def do_DELETE(self):  # noqa: N802
        """dropTable: remove the registration (metadata only — data
        and table files untouched, external-table semantics; the spec
        route's purgeRequested flag is deliberately unsupported)."""
        parts = [urllib.parse.unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        try:
            if (len(parts) == 5 and parts[:2] == ["v1", "namespaces"]
                    and parts[3] == "tables"):
                ns, name = parts[2], parts[4]
                with self._reg_lock:
                    if name not in _load_registry(self.root).get(ns, {}):
                        return self._not_found(f"table {ns}.{name}")
                    drop_table(self.root, ns, name)
                return self._json(204, None)
            return self._not_found(self.path)
        except Exception as e:
            self._error(500, type(e).__name__, str(e))

    def _load_result(self, table_path: str) -> dict:
        version = il._list_meta_versions(table_path)[-1]
        return {
            "metadata-location": il._meta_path(table_path, version),
            "metadata": il.table_metadata(table_path, version),
            "config": {},
        }

    def _error(self, code: int, typ: str, msg: str) -> None:
        self._json(code, {"error": {"message": msg, "type": typ,
                                    "code": code}})

    def do_POST(self):  # noqa: N802
        parts = [urllib.parse.unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            if (len(parts) == 4 and parts[:2] == ["v1", "namespaces"]
                    and parts[3] == "register"):
                # spec RegisterTableRequest: name + metadata-location;
                # the table root is the metadata file's grandparent
                loc = req["metadata-location"]
                table_path = os.path.dirname(os.path.dirname(loc))
                self._confine(table_path)
                with self._reg_lock:
                    register_table(self.root, parts[2], req["name"],
                                   table_path)
                return self._json(200, self._load_result(table_path))
            if (len(parts) == 4 and parts[:2] == ["v1", "namespaces"]
                    and parts[3] == "tables"):
                # createTable (lite): claim a NEW identifier for a
                # committed table location; duplicate identifiers are
                # a typed 409, never a silent re-point
                ns, name = parts[2], req["name"]
                self._confine(req["location"])
                with self._reg_lock:
                    if name in _load_registry(self.root).get(ns, {}):
                        return self._error(
                            409, "AlreadyExistsException",
                            f"table {ns}.{name} already exists")
                    register_table(self.root, ns, name, req["location"])
                return self._json(200, self._load_result(req["location"]))
            if (len(parts) == 5 and parts[:2] == ["v1", "namespaces"]
                    and parts[3] == "tables"):
                return self._commit_table(parts[2], parts[4], req)
            return self._not_found(self.path)
        except PermissionError as e:
            self._error(403, "ForbiddenException", str(e))
        except Exception as e:
            self._error(500, type(e).__name__, str(e))

    def _commit_table(self, ns: str, name: str, req: dict) -> None:
        """commitTable: the catalog-mediated optimistic version swap.
        The client built the next metadata document against the base
        it loaded; the server verifies that base is STILL current,
        then publishes the next version with put-if-absent — a stale
        base or a lost write race is a typed 409 CommitFailedException
        the client retries against the fresh base."""
        table_path = _load_registry(self.root).get(ns, {}).get(name)
        if table_path is None:
            return self._not_found(f"table {ns}.{name}")
        cur_version = il._list_meta_versions(table_path)[-1]
        cur_loc = il._meta_path(table_path, cur_version)
        if req.get("base-metadata-location") != cur_loc:
            return self._error(
                409, "CommitFailedException",
                f"base metadata {req.get('base-metadata-location')} is "
                f"stale; current is {cur_loc} — reload and rebuild the "
                f"commit")
        metadata = req["metadata"]
        cur_meta = il.table_metadata(table_path, cur_version)
        if metadata.get("table-uuid") != cur_meta["table-uuid"]:
            return self._error(
                409, "CommitFailedException",
                "metadata table-uuid does not match the served table "
                "(commit built for a different table lineage)")
        # structural validation BEFORE the swap: the catalog must
        # never publish a document that wedges every subsequent
        # loadTable/scan (the REST spec's requirements/updates checks
        # exist for exactly this) — a malformed commit is the
        # CLIENT's 409, not the next reader's 500
        snaps = metadata.get("snapshots")
        cur_id = metadata.get("current-snapshot-id")
        bad = None
        if metadata.get("format-version") != 2:
            bad = "format-version must be 2"
        elif not isinstance(snaps, list) or not snaps:
            bad = "metadata carries no snapshots"
        elif cur_id not in {s.get("snapshot-id") for s in snaps}:
            bad = "current-snapshot-id is not among snapshots"
        else:
            cur_snap = next(s for s in snaps
                            if s.get("snapshot-id") == cur_id)
            ml = cur_snap.get("manifest-list") or ""
            if not os.path.exists(os.path.join(table_path, ml)):
                bad = (f"current snapshot's manifest-list {ml!r} does "
                       f"not exist under the table location")
        if bad:
            return self._error(409, "CommitFailedException",
                               f"invalid metadata refused: {bad}")
        try:
            il.publish_commit_metadata(table_path, metadata,
                                       cur_version + 1)
        except il.IcebergCommitError as e:
            return self._error(409, "CommitFailedException", str(e))
        return self._json(200, self._load_result(table_path))


class CatalogServer:
    """In-process catalog endpoint over a registry root. Use as a
    context manager; ``uri`` is the base URL clients talk to.

    Scope: binds loopback by default and carries NO authentication —
    a test/dev catalog, not a hardened service. ``allowed_root``
    confines HTTP-registered/created table locations to one directory
    tree (reject-outside, resolved through symlinks); without it any
    client that can reach the port could register, and then read,
    Iceberg metadata from an arbitrary local path. Production
    deployments of the real REST spec put OAuth2 and a warehouse
    root in front of exactly these endpoints."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0,
                 *, allowed_root: str | None = None):
        os.makedirs(root, exist_ok=True)
        handler = type("BoundHandler", (_Handler,),
                       {"root": root, "allowed_root": allowed_root,
                        "_reg_lock": threading.Lock()})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.uri = f"http://{host}:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    def __enter__(self) -> "CatalogServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def _get(uri: str, route: str) -> dict:
    with urllib.request.urlopen(f"{uri}{route}") as r:
        return json.loads(r.read())


def list_namespaces(uri: str) -> list[str]:
    return [ns[0] for ns in _get(uri, "/v1/namespaces")["namespaces"]]


def list_tables(uri: str, namespace: str) -> list[str]:
    ns = urllib.parse.quote(namespace)
    return [t["name"] for t in
            _get(uri, f"/v1/namespaces/{ns}/tables")["identifiers"]]


def load_table(uri: str, namespace: str, name: str) -> dict:
    """LoadTableResult for ``namespace.name`` (metadata + location)."""
    ns, t = urllib.parse.quote(namespace), urllib.parse.quote(name)
    return _get(uri, f"/v1/namespaces/{ns}/tables/{t}")


class CommitFailedError(RuntimeError):
    """A catalog commit was refused: the base metadata was stale or
    the version write lost a race. Reload and rebuild to retry."""


def _post(uri: str, route: str, payload: dict) -> dict:
    body = json.dumps(payload).encode()
    req = urllib.request.Request(
        f"{uri}{route}", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def drop_table_http(uri: str, namespace: str, name: str) -> None:
    """dropTable through the endpoint (metadata only; 404s propagate
    as HTTPError)."""
    ns, t = urllib.parse.quote(namespace), urllib.parse.quote(name)
    req = urllib.request.Request(
        f"{uri}/v1/namespaces/{ns}/tables/{t}", method="DELETE")
    urllib.request.urlopen(req).close()


def create_table(uri: str, namespace: str, name: str,
                 table_path: str) -> dict:
    """createTable: claim ``namespace.name`` for a committed table
    location through the endpoint. Raises ``FileExistsError`` on a
    duplicate identifier (the server's 409 AlreadyExists)."""
    import urllib.error

    ns = urllib.parse.quote(namespace)
    try:
        return _post(uri, f"/v1/namespaces/{ns}/tables",
                     {"name": name, "location": os.path.abspath(table_path)})
    except urllib.error.HTTPError as e:
        if e.code == 409:
            raise FileExistsError(json.loads(e.read())["error"]["message"])
        raise


def commit_table(uri: str, namespace: str, name: str,
                 base_metadata_location: str, metadata: dict) -> dict:
    """commitTable: ask the catalog to publish ``metadata`` as the
    table's next version, conditional on ``base_metadata_location``
    still being current. Raises :class:`CommitFailedError` on the
    server's 409 (stale base / lost race) — reload, rebuild, retry."""
    import urllib.error

    ns, t = urllib.parse.quote(namespace), urllib.parse.quote(name)
    try:
        return _post(uri, f"/v1/namespaces/{ns}/tables/{t}", {
            "base-metadata-location": base_metadata_location,
            "metadata": metadata,
        })
    except urllib.error.HTTPError as e:
        if e.code == 409:
            raise CommitFailedError(json.loads(e.read())["error"]["message"])
        raise


def catalog_commit_data_files(uri: str, namespace: str, name: str,
                              schema_json: str, rel_files: list[str], *,
                              mode: str = "append",
                              partition_by: list[str] | None = None,
                              max_retries: int = 3) -> dict:
    """Engine-side commit THROUGH the catalog: the full
    load-modify-commit loop. Data files already landed under the
    table's ``data/`` (data I/O never touches the catalog); this
    resolves the current base over HTTP, builds the next metadata
    document against it (``iceberg_lite.build_commit_metadata``),
    and POSTs the commit — on ``CommitFailedError`` (another writer
    won the version) it rebuilds against the fresh base and retries,
    so two concurrent appends both land, serialized by the catalog.
    Returns the new LoadTableResult."""
    from . import iceberg_lite as il_mod

    last: CommitFailedError | None = None
    for _ in range(max_retries):
        cur = load_table(uri, namespace, name)
        base = cur["metadata-location"]
        table_path = os.path.dirname(os.path.dirname(base))
        metadata, _version = il_mod.build_commit_metadata(
            schema_json, table_path, rel_files, mode=mode,
            partition_by=partition_by)
        try:
            return commit_table(uri, namespace, name, base, metadata)
        except CommitFailedError as e:
            last = e  # stale base: rebuild on the fresh one
    raise CommitFailedError(
        f"commit of {len(rel_files)} files to {namespace}.{name} lost "
        f"{max_retries} consecutive races: {last}")


def read_catalog_table(spark, uri: str, namespace: str, name: str,
                       **read_kwargs):
    """Read a catalog table by NAME: resolve the metadata-location
    through the REST endpoint (the cross-engine handshake — no shared
    path knowledge), then scan it with the iceberg_lite reader.
    ``read_kwargs`` pass through (``snapshot_id``, ``predicates``,
    ``partition_filter``)."""
    res = load_table(uri, namespace, name)
    table_path = os.path.dirname(os.path.dirname(res["metadata-location"]))
    return il.read_iceberg(spark, table_path, **read_kwargs)
