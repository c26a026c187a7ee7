"""TableIO seam: Iceberg when a catalog is configured, else Parquet +
JSON snapshot manifests with the same checkpoint/time-travel semantics.

No Iceberg jars exist in this sandbox (and no network to fetch them), so
the seam keeps every caller working against either backend:

- ``location`` = ``"iceberg:<catalog.db.table>"`` → ``spark.read.format
  ("iceberg")`` / ``df.writeTo(...).append()`` — used verbatim on a real
  cluster with ``spark.sql.catalog.*`` configured.
- ``location`` = a filesystem path → Parquet directory plus our own
  ``_snapshots/`` JSON manifests: every commit writes data files first,
  then atomically renames a manifest listing ALL live files (the Iceberg
  commit protocol in miniature). Readers pin a snapshot id and see an
  immutable file list — writers never disturb them.

Snapshot commits are same-directory renames (atomic on POSIX); on an
object store the rename becomes a conditional PUT of the manifest.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"


def is_iceberg(location: str) -> bool:
    return location.startswith("iceberg:")


def read_table(
    spark: SparkSession, location: str, snapshot_id: str | None = None
) -> DataFrame:
    if is_iceberg(location):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(location[len("iceberg:"):])
    snap = resolve_snapshot(location, snapshot_id)
    if snap is None:                     # no snapshot yet: plain directory
        return spark.read.parquet(location)
    files = [os.path.join(location, f) for f in snap["files"]]
    if not files:
        raise ValueError(f"snapshot {snap['id']} of {location} is empty")
    return spark.read.parquet(*files)


def append(df: DataFrame, location: str) -> str | None:
    """Append rows and commit a new snapshot; returns the snapshot id
    (None for the Iceberg backend — Iceberg tracks its own)."""
    if is_iceberg(location):
        df.writeTo(location[len("iceberg:"):]).append()
        return None
    staged = os.path.join(location, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staged)
    data_files = []
    for f in sorted(os.listdir(staged)):
        if f.endswith(".parquet"):
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staged, f), os.path.join(location, name))
            data_files.append(name)
    # best-effort cleanup of the staging skeleton
    for f in os.listdir(staged):
        os.remove(os.path.join(staged, f))
    os.rmdir(staged)
    return commit_snapshot(location, add=data_files)


def list_snapshots(location: str) -> list[dict]:
    d = os.path.join(location, SNAP_DIR)
    if not os.path.isdir(d):
        return []
    snaps = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                snaps.append(json.load(fh))
    return sorted(snaps, key=lambda s: s["seq"])


def resolve_snapshot(location: str, snapshot_id: str | None) -> dict | None:
    snaps = list_snapshots(location)
    if not snaps:
        return None
    if snapshot_id is None:
        return snaps[-1]
    for s in snaps:
        if s["id"] == snapshot_id:
            return s
    raise ValueError(f"unknown snapshot {snapshot_id!r} for {location}")


def commit_snapshot(location: str, add: list[str]) -> str:
    """Write a manifest = previous live files + ``add`` (atomic rename)."""
    prev = resolve_snapshot(location, None)
    files = (prev["files"] if prev else []) + list(add)
    rows = 0
    for f in files:
        rows += pq.read_metadata(os.path.join(location, f)).num_rows
    snap = {
        "id": uuid.uuid4().hex,
        "seq": (prev["seq"] + 1) if prev else 0,
        "ts": time.time(),
        "files": files,
        "rows": rows,
    }
    d = os.path.join(location, SNAP_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"._tmp-{snap['id']}.json")
    with open(tmp, "w") as fh:
        json.dump(snap, fh)
    os.rename(tmp, os.path.join(d, f"{snap['seq']:012d}-{snap['id']}.json"))
    return snap["id"]
