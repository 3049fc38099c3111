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

    def log_message(self, *a):  # quiet test runs
        pass

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

    def do_POST(self):  # noqa: N802
        parts = [urllib.parse.unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        try:
            if (len(parts) == 4 and parts[:2] == ["v1", "namespaces"]
                    and parts[3] == "register"):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                # spec RegisterTableRequest: name + metadata-location;
                # the table root is the metadata file's grandparent
                loc = req["metadata-location"]
                table_path = os.path.dirname(os.path.dirname(loc))
                register_table(self.root, parts[2], req["name"], table_path)
                version = il._list_meta_versions(table_path)[-1]
                return self._json(200, {
                    "metadata-location": il._meta_path(table_path, version),
                    "metadata": il.table_metadata(table_path, version),
                    "config": {},
                })
            return self._not_found(self.path)
        except Exception as e:
            self._json(500, {"error": {"message": str(e),
                                       "type": type(e).__name__,
                                       "code": 500}})


class CatalogServer:
    """In-process catalog endpoint over a registry root. Use as a
    context manager; ``uri`` is the base URL clients talk to."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        os.makedirs(root, exist_ok=True)
        handler = type("BoundHandler", (_Handler,), {"root": root})
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
