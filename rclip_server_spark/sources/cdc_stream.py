"""Streaming CDC source over a ``sources.versioned`` table (Spark 4 Python
DataSource API): ``readStream.format("versioned_cdc")`` tails the manifest
log the way Delta's streaming source tails its transaction log.

This is the read-side complement of the exactly-once sink
(streaming/sink.start_stream_append_versioned): pipelines can stream INTO a
versioned table transactionally and any number of downstream consumers can
stream OUT of it incrementally — each micro-batch is exactly the segments
the commits in (start_version, end_version] added, an O(delta) read that
never opens a pre-existing segment (the same fast path as
versioned.table_changes).

Scale shape: offsets are VERSION NUMBERS (the checkpoint stores two ints);
micro-batch planning is a KB-sized manifest walk on the driver; each added
segment becomes one input partition whose FILES are read on executors with
pyarrow — so a day of ingest streams as a day of data regardless of table
size. CDC tailing requires append-only evolution between the consumed
offsets (append / stream-append, flat or bucketed); an upsert/overwrite/
compaction in the interval rewrites history in place, so the source fails
loudly with the version that broke the contract rather than emitting rows
that were never "changes" (same rule as table_changes' fast path; consumers
that need rewrite-aware diffs call table_changes with a key).

Usage:
    from rclip_server_spark.sources import cdc_stream
    cdc_stream.register(spark)
    df = (spark.readStream.format("versioned_cdc")
          .option("path", table_path)
          .option("from_version", 1)   # optional: backfill from v1;
          .load())                      # default tails from the current head
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# the create ops plus versioned.APPEND_OPS (imported, not copied —
# r11 added the metadata-only 'add-column' there and a parallel list
# here silently diverged: batch table_changes accepted the commit
# while this stream reader killed the query on it)
from .versioned import APPEND_OPS as _V_APPEND_OPS

_APPEND_OPS = frozenset(
    {"create", "create-bucketed", *_V_APPEND_OPS}
)


def _arrow_to_ddl(field) -> str:
    import pyarrow as pa

    t = field.type
    if pa.types.is_int64(t):
        s = "bigint"
    elif pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        s = "int"
    elif pa.types.is_float64(t):
        s = "double"
    elif pa.types.is_float32(t):
        s = "float"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        s = "string"
    elif pa.types.is_boolean(t):
        s = "boolean"
    elif pa.types.is_timestamp(t):
        s = "timestamp"
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        s = "binary"
    elif pa.types.is_list(t):
        inner = _arrow_to_ddl(pa.field("x", t.value_type)).split(" ", 1)[1]
        s = f"array<{inner}>"
    else:
        raise ValueError(f"versioned_cdc: unsupported column type {t} "
                         f"for field {field.name}")
    return f"{field.name} {s}"


class _SegmentPartition(InputPartition):
    def __init__(self, seg_dir: str, columns: list[str], types: dict):
        self.seg_dir = seg_dir
        self.columns = columns
        self.types = types  # column -> Spark DDL type (for evolved nulls)


class VersionedCDCStreamReader(DataSourceStreamReader):
    """Offsets are committed version numbers; ``partitions(start, end)``
    resolves the segments added by the commits in (start, end] from the
    manifest log (driver-side, metadata-only); ``read`` opens one
    segment's parquet files on an executor."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.from_version = options.get("from_version")
        self.columns = list(schema.fieldNames())
        self.types = {f.name: f.dataType.simpleString()
                      for f in schema.fields}


    # -- manifest helpers (driver-side; self-contained re-implementation is
    #    deliberate: DataSourceStreamReader instances are pickled to the
    #    Python worker that plans batches, where the repo is not importable)
    def _versions(self) -> list[int]:
        import re

        snap = os.path.join(self.path, "_snapshots")
        rx = re.compile(r"^v(\d{8})\.json$")
        return sorted(
            int(m.group(1)) for m in map(rx.match, os.listdir(snap)) if m
        )

    def _manifest(self, v: int) -> dict:
        import json

        with open(os.path.join(self.path, "_snapshots", f"v{v:08d}.json")) as f:
            return json.load(f)

    @staticmethod
    def _segs(m: dict) -> set:
        if m.get("segments") is not None:
            return set(m["segments"])
        return {s for ss in m.get("buckets", {}).values() for s in ss}

    def initialOffset(self) -> dict:
        if self.from_version is not None:
            # backfill: treat everything after from_version-1 as new
            return {"version": int(self.from_version) - 1}
        return {"version": self._versions()[-1]}

    def latestOffset(self) -> dict:
        # NOTE: no maxOffsetsPerTrigger-style admission control here — the
        # Python runner invokes offset methods on stateless pickled copies
        # of this reader, so an in-instance "last planned end" cannot bound
        # the batch reliably. A deep backfill therefore arrives as one
        # batch whose PARTITIONS are still per-segment (executor
        # parallelism bounds the per-task work); chunked admission belongs
        # at this API's engine level when it grows ReadLimit support.
        return {"version": self._versions()[-1]}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts = []
        for v in range(lo + 1, hi + 1):
            m = self._manifest(v)
            if m["op"] not in _APPEND_OPS:
                raise ValueError(
                    f"versioned_cdc: version {v} is a {m['op']!r} commit — "
                    f"CDC tailing requires append-only evolution; use "
                    f"versioned.table_changes(key=...) for rewrite-aware "
                    f"diffs"
                )
            parent = self._segs(self._manifest(v - 1)) if v > 1 else set()
            for seg in sorted(self._segs(m) - parent):
                parts.append(_SegmentPartition(
                    os.path.join(self.path, seg), self.columns, self.types
                ))
        # Spark requires >= 1 partition per batch; an empty-append interval
        # yields one empty partition (a dir that lists no parquet files)
        return parts or [_SegmentPartition("", self.columns, self.types)]

    def read(self, partition: _SegmentPartition):
        # executor-side: self-contained (no repo imports on workers), and
        # ARROW-NATIVE — the datasource API accepts RecordBatch iterators,
        # so segment bytes flow parquet -> Arrow -> Spark with no
        # per-row Python materialization (the same batch-transfer lane as
        # pandas_udf; yielding tuples instead measured row-at-a-time)
        import pyarrow as pa
        import pyarrow.parquet as pq

        def ddl_arrow(t: str):
            # inverse of _arrow_to_ddl for the supported scalar set —
            # defined inline: this method runs cloudpickled on executors
            m = {"bigint": pa.int64(), "int": pa.int32(),
                 "double": pa.float64(), "float": pa.float32(),
                 "string": pa.string(), "boolean": pa.bool_(),
                 "timestamp": pa.timestamp("us"), "binary": pa.binary()}
            if t.startswith("array<"):
                return pa.list_(ddl_arrow(t[6:-1]))
            return m[t]

        if not partition.seg_dir:
            return
        for root, _, files in os.walk(partition.seg_dir):
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue
                fp = os.path.join(root, f)
                # schema-evolution tolerance: an old segment file may
                # predate a later-committed column — read what it has and
                # splice typed NULLs for the rest, in declared order
                have = set(pq.read_schema(fp).names)
                avail = [c for c in partition.columns if c in have]
                tbl = pq.read_table(fp, columns=avail)
                for c in partition.columns:
                    if c not in tbl.column_names:
                        tbl = tbl.append_column(
                            c, pa.nulls(tbl.num_rows,
                                        type=ddl_arrow(partition.types[c]))
                        )
                yield from tbl.select(partition.columns).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; manifests are immutable


class VersionedCDCDataSource(DataSource):
    """format name: versioned_cdc"""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdc"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options["path"]
        # derive the schema from the head manifest — metadata only
        import json
        import re

        snap = os.path.join(path, "_snapshots")
        rx = re.compile(r"^v(\d{8})\.json$")
        versions = sorted(
            int(m.group(1)) for m in map(rx.match, os.listdir(snap)) if m
        )
        with open(os.path.join(snap, f"v{versions[-1]:08d}.json")) as f:
            m = json.load(f)
        # prefer the manifest's recorded UNION schema (col_types tracks
        # every committed column, so an evolved column appended after
        # older segments is still in the stream's schema; a single file's
        # footer could miss it)
        if m.get("col_types"):
            return ", ".join(
                f"{c} {t}" for c, t in m["col_types"].items()
            )
        segs = (m["segments"] if m.get("segments") is not None
                else sorted(s for ss in m["buckets"].values() for s in ss))
        for seg in segs:
            d = os.path.join(path, seg)
            for root, _, files in os.walk(d):
                for fn in sorted(files):
                    if fn.endswith(".parquet"):
                        sch = pq.read_schema(os.path.join(root, fn))
                        return ", ".join(_arrow_to_ddl(f) for f in sch)
        raise ValueError(f"versioned_cdc: no parquet files under {path}")

    def streamReader(self, schema: StructType) -> VersionedCDCStreamReader:
        return VersionedCDCStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(VersionedCDCDataSource)
