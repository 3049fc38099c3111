"""Dual-format publication: ONE physical copy of parquet data files
carrying BOTH a Delta transaction log and an Iceberg metadata tree —
the literal "one copy, many engines" architecture the reference
describes for its marts (/root/reference/README.md:121-124,141), and
what Delta Lake's UniForm feature does in production: every Delta
commit also generates Iceberg metadata pointing at the same files.

Layout after ``publish_uniform(df, path)``::

    path/
      <hive dirs>/part-*.parquet   the single data copy (Delta layout)
      _delta_log/                  delta_lite transaction log
      metadata/                    iceberg_lite metadata + Avro manifests

Both planes are written by the same commit call, Delta first (the
data-owning plane, exactly like UniForm), then Iceberg metadata over
the files the Delta commit added — O(files) footer reads, no data
movement or copies. Readers pick their plane: ``read_delta`` replays
``_delta_log``; ``read_iceberg`` walks the manifest tree. Each plane
keeps its own independent maintenance/time-travel semantics over the
shared files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from . import delta_lite as dl
from . import iceberg_lite as il


def publish_uniform(df: DataFrame, path: str, *,
                    mode: str = "overwrite",
                    partition_by: list[str] | None = None) -> tuple[int, int]:
    """Publish ``df`` once, committing both metadata planes. Returns
    ``(delta_version, iceberg_snapshot_id)``.

    ``mode='overwrite'`` replaces the logical table in both planes
    (prior files stay for each plane's time travel); ``'append'`` is
    Delta append + Iceberg fast-append of exactly the new files."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    partition_by = list(partition_by or [])

    # pre-flight the ICEBERG plane's commit validations before the
    # Delta plane commits: a Delta commit followed by an Iceberg
    # refusal (schema drift, partition-spec mismatch) would leave the
    # planes permanently diverged — the one state this module's
    # invariant (uniform_file_sets equality) must never reach
    il.validate_against_committed(path, df.schema.json(), partition_by)

    version = dl.write_delta(df, path, mode=mode,
                             partition_by=partition_by or None,
                             mirror_iceberg=False)

    # the files THIS delta commit added (decoded rel paths)
    with open(dl._log_path(path, version)) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    added = [dl._decode_path(a["add"]["path"]) for a in acts
             if "add" in a and a["add"].get("dataChange")]

    snapshot_id = il.commit_data_files(
        df.schema.json(), path, added,
        mode=mode, partition_by=partition_by)
    return version, snapshot_id


def has_iceberg_plane(path: str) -> bool:
    """True when ``path`` carries a committed iceberg_lite metadata
    plane next to its data — the signature of a uniform table. A bare
    ``metadata/`` dir with no version files doesn't count."""
    if not os.path.isdir(os.path.join(path, "metadata")):
        return False
    return bool(il._list_meta_versions(path))


def mirror_delta_head_into_iceberg(path: str) -> int:
    """Commit an Iceberg snapshot whose live file set is EXACTLY the
    Delta head's — how Delta-plane maintenance (MERGE / OPTIMIZE /
    RESTORE / direct writes) keeps the Iceberg plane current, the way
    real UniForm mirrors every commit. Called automatically by the
    delta_lite maintenance entry points when they detect the plane.
    Returns the new snapshot id.

    Commit cost follows the commit, not the table — with the sync
    preconditions that keep the mirror IDEMPOTENT and SELF-HEALING:

    - already in sync (Iceberg current file set == Delta head's):
      no-op returning the current snapshot id, so re-invoking at a
      mirrored head never double-appends;
    - pure-add head (an append) AND Iceberg current == the Delta
      PARENT version's live set: fast-append of exactly the commit's
      files — O(commit's files) footer reads, so N streamed appends
      cost O(N) total, not O(N^2);
    - anything else (removes in the commit, or a mirror gap from a
      crash between a Delta commit and its mirror): full-live-set
      overwrite snapshot — the O(live files) resync that heals any
      divergence, whatever its history."""
    import json as _json

    head = dl._list_versions(path)[-1]
    meta = dl.table_metadata(path, head)
    partition_by = list(meta.get("partitionColumns") or [])
    live_head = set(dl._live_files(path, head))
    imeta = il.table_metadata(path)
    current_sid = imeta["current-snapshot-id"]
    iceberg_live = set(il._snapshot_files(path, imeta, current_sid))
    if iceberg_live == live_head:
        return current_sid  # already mirrored — idempotent no-op
    with open(dl._log_path(path, head)) as f:
        acts = [_json.loads(line) for line in f if line.strip()]
    adds = [dl._decode_path(a["add"]["path"]) for a in acts if "add" in a]
    has_removes = any("remove" in a for a in acts)
    if (adds and not has_removes and head > 0
            and iceberg_live == set(dl._live_files(path, head - 1))):
        return il.commit_data_files(
            meta["schemaString"], path, adds, mode="append",
            partition_by=partition_by)
    live = sorted(live_head)
    return il.commit_data_files(
        meta["schemaString"], path, live, mode="overwrite",
        partition_by=partition_by)


def uniform_file_sets(path: str) -> tuple[set[str], set[str]]:
    """(delta live files, iceberg live files) as rel paths — equal for
    a table maintained exclusively through :func:`publish_uniform`;
    the invariant tests assert on."""
    d_files = set(dl._live_files(path, dl._list_versions(path)[-1]))
    meta = il.table_metadata(path)
    i_files = set(il._snapshot_files(path, meta, meta["current-snapshot-id"]))
    return d_files, i_files
