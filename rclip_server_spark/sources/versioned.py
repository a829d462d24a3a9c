"""Versioned table layout: a manifest log over immutable parquet segments —
snapshot isolation, time travel, optimistic concurrency, and vacuum on plain
parquet.

Why this exists: the flat write path (writer.upsert_parquet / soft_delete)
gives MERGE semantics with an atomic swap, but a swap DESTROYS the previous
state — no reader isolation across a concurrent rewrite, no audit trail, no
rollback. Table formats (the Delta transaction-log and Iceberg snapshot
designs — both published) solve this with one idea: data files are IMMUTABLE,
and a tiny commit log says which file set IS the table at each version. This
module is that idea at its minimum viable size:

    path/
      seg-<uuid>/           immutable parquet segment dirs (never modified)
      _snapshots/v%08d.json manifest: the segment list that IS version n
      _latest               current-version pointer (atomic rename swap)

* **Snapshot isolation**: a reader resolves ONE manifest, then reads only
  immutable segments — concurrent commits cannot shear it mid-query
  (the flat layout's swap can unlink files under a running scan).
* **Optimistic concurrency**: the commit is `O_CREAT | O_EXCL` on the next
  manifest path — exactly one of two racing writers creates v(n+1); the
  loser gets ``ConcurrentWriteError`` and must re-merge against the new
  head (the Delta-log protocol, with the filesystem as the arbiter).
* **Time travel**: ``read(path, version=k)`` — the manifest for k still
  names its segments because vacuum is the only deleter.
* **Vacuum**: delete segments unreferenced by the kept manifests; the ONLY
  operation that removes data, and it never touches the head.

Scale notes: manifests hold segment names, not row data — KB-sized at any
table size. ``append`` commits are O(batch) (new segment + manifest listing
parent segments + it). ``upsert``/overwrite commits rewrite the merged state
into one new segment — the honest plain-parquet cost (Delta's MERGE rewrites
only matched files; the bucketed layout in writer.py bounds rewrite that way,
and the two compose: a production system would version bucket directories).
A real multi-writer object-store deployment would put the `_latest` swap
behind a conditional-put; single-filesystem rename is atomic here.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"
_LATEST = "_latest"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first — re-read the head,
    re-apply the change, retry."""


def _snap_path(path: str, version: int) -> str:
    return os.path.join(path, _SNAP_DIR, f"v{version:08d}.json")


def current_version(path: str) -> int:
    with open(os.path.join(path, _LATEST)) as f:
        return int(f.read().strip())


def _manifest(path: str, version: int) -> dict:
    with open(_snap_path(path, version)) as f:
        return json.load(f)


def _write_segment(df: DataFrame, path: str) -> str:
    seg = f"seg-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(os.path.join(path, seg))
    return seg


def _commit(path: str, version: int, segments: list[str], op: str,
            batch_id: int | None = None) -> None:
    """Atomic commit: O_CREAT|O_EXCL manifest create (the concurrency
    arbiter), then the `_latest` pointer swap (atomic rename)."""
    manifest = {"version": version, "segments": segments, "op": op,
                "parent": version - 1 if version > 1 else None}
    if batch_id is not None:
        manifest["batch_id"] = int(batch_id)
    target = _snap_path(path, version)
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} already committed at {target}"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    tmp = os.path.join(path, f"{_LATEST}.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.rename(tmp, os.path.join(path, _LATEST))


def create(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Create the versioned table as version 1. Returns the version."""
    os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=False)
    seg = _write_segment(df, path)
    _commit(path, 1, [seg], "create")
    return 1


def read(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read the table AT a version (default: head). Resolves the manifest
    once — the returned plan names immutable segment dirs, so concurrent
    commits and even a head overwrite cannot shear this reader."""
    v = current_version(path) if version is None else int(version)
    m = _manifest(path, v)
    dirs = [os.path.join(path, s) for s in m["segments"]]
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def append(spark: SparkSession, path: str, batch: DataFrame) -> int:
    """O(batch) append commit: write one new segment, manifest = parent
    segments + it. The ingest-path commit — never reads or rewrites
    existing data."""
    v = current_version(path)
    seg = _write_segment(batch, path)
    try:
        _commit(path, v + 1, _manifest(path, v)["segments"] + [seg], "append")
    except ConcurrentWriteError:
        shutil.rmtree(os.path.join(path, seg))  # orphan cleanup, then surface
        raise
    return v + 1


def overwrite(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Full-replace commit (B18-flavored reload target): one new segment is
    the whole new state. Old versions remain readable until vacuum."""
    v = current_version(path)
    seg = _write_segment(df, path)
    try:
        _commit(path, v + 1, [seg], "overwrite")
    except ConcurrentWriteError:
        shutil.rmtree(os.path.join(path, seg))
        raise
    return v + 1


def upsert(spark: SparkSession, path: str, updates: DataFrame, key: str) -> int:
    """MERGE-on-key commit: read the head snapshot, left-anti + union merge
    (writer.upsert_parquet's plan), write the merged state as one new
    segment. Readers of older versions are untouched; a concurrent commit
    between our read and our commit raises ConcurrentWriteError so the
    caller re-merges against the new head instead of silently losing it
    (write-write conflict detection, the Delta-log rule)."""
    v = current_version(path)
    target = read(spark, path, v)
    merged = target.join(
        updates.select(key).distinct(), [key], "left_anti"
    ).unionByName(updates, allowMissingColumns=True)
    seg = _write_segment(merged, path)
    try:
        _commit(path, v + 1, [seg], "upsert")
    except ConcurrentWriteError:
        shutil.rmtree(os.path.join(path, seg))
        raise
    return v + 1


def committed_batch_ids(path: str) -> set[int]:
    """Batch ids recorded by ``append_exactly_once`` commits still in the
    log. Vacuum trims old manifests, so the streaming engine's checkpoint
    (which bounds how far back a replay can reach) must be retained at
    least as long as the manifest window — the standard sink-log pairing."""
    out: set[int] = set()
    snap_dir = os.path.join(path, _SNAP_DIR)
    for name in os.listdir(snap_dir):
        with open(os.path.join(snap_dir, name)) as f:
            m = json.load(f)
        if "batch_id" in m:
            out.add(int(m["batch_id"]))
    return out


def append_exactly_once(
    spark: SparkSession, path: str, batch: DataFrame, batch_id: int
) -> int | None:
    """EXACTLY-ONCE streaming append: the micro-batch's id is recorded IN
    the commit manifest, so a crash-replay of the same batch (foreachBatch
    is at-least-once) finds its id already in the log and skips — the
    transactional-sink recipe from the Structured Streaming docs, with the
    manifest log as the transaction record. Returns the committed version,
    or None when the batch was already committed (replay)."""
    if int(batch_id) in committed_batch_ids(path):
        return None
    v = current_version(path)
    seg = _write_segment(batch, path)
    try:
        _commit(path, v + 1, _manifest(path, v)["segments"] + [seg],
                "stream-append", batch_id=int(batch_id))
    except ConcurrentWriteError:
        shutil.rmtree(os.path.join(path, seg))
        raise
    return v + 1


def upsert_with_retry(
    spark: SparkSession, path: str, updates: DataFrame, key: str,
    max_retries: int = 3,
) -> int:
    """MERGE with the standard optimistic-concurrency loop: on a
    write-write conflict, re-read the NEW head, re-apply the merge, and
    retry — each attempt merges against the latest committed state, so the
    loser's update is re-based, never lost or double-applied (the Delta
    commit-retry protocol). Raises after ``max_retries`` rebases."""
    for attempt in range(max_retries + 1):
        try:
            return upsert(spark, path, updates, key)
        except ConcurrentWriteError:
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


def history(path: str) -> list[dict]:
    """The commit log, oldest first: version, op, parent, segment count."""
    out = []
    snap_dir = os.path.join(path, _SNAP_DIR)
    for name in sorted(os.listdir(snap_dir)):
        with open(os.path.join(snap_dir, name)) as f:
            m = json.load(f)
        out.append({"version": m["version"], "op": m["op"],
                    "parent": m["parent"], "n_segments": len(m["segments"])})
    return out


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop manifests older than the last ``keep_last`` versions and delete
    segments no kept manifest references. Returns the deleted segment names.
    The only destructive operation — time travel reaches exactly the kept
    window afterwards. (A production vacuum would also honor a retention
    duration so in-flight readers of just-expired versions drain first.)"""
    head = current_version(path)
    cutoff = head - int(keep_last) + 1
    keep_segs: set[str] = set()
    snap_dir = os.path.join(path, _SNAP_DIR)
    for name in sorted(os.listdir(snap_dir)):
        with open(os.path.join(snap_dir, name)) as f:
            m = json.load(f)
        if m["version"] >= cutoff:
            keep_segs.update(m["segments"])
        else:
            os.remove(os.path.join(snap_dir, name))
    deleted = []
    for d in sorted(os.listdir(path)):
        if d.startswith("seg-") and d not in keep_segs:
            shutil.rmtree(os.path.join(path, d))
            deleted.append(d)
    return deleted
