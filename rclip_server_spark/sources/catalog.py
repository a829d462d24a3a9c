"""Parquet table catalog over the driver fixtures.

The reference eagerly loads its whole SQLite table into one in-memory matrix
at startup (rclip_server.py:59-66, 201-228). The Spark-native equivalent is a
lazy parquet scan per table: columnar at rest, filter/projection pushdown for
free, and nothing is materialized until an action runs. Callers that want the
reference's "warm resident matrix" behavior call ``.persist()`` on the
embeddings DataFrame themselves.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # the events fixture stores TIMESTAMP(NANOS), which Spark cannot read
        # natively; this runtime conf makes it readable as long on ANY session
        # (the caller may not have gone through session.get_spark)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) read via nanosAsLong: truncate to micros,
            # exactly what the DuckDB oracle does to TIMESTAMP_NS. Integer
            # DIV, not `/`: float division of ~1.7e18 ns exceeds double's
            # exact-integer range and is off by ±1 µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Spark 4.1 ignores nanosAsLong and reads TIMESTAMP(NANOS) as
            # TIMESTAMP_NTZ (micros, nanos truncated). The session timezone
            # is pinned to UTC, so the cast to TIMESTAMP is exact and matches
            # the DuckDB oracle's TIMESTAMP_NS semantics.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_words_table(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """Optional-table load sniff (reference rclip_server.py:68-69: the words
    DB is opened iff the file exists): load ``words.parquet`` when the
    fixture provides one, else derive the table from the document corpus
    (pipelines.build_words_table — tokenize, frequency floor, distributed
    embed). Either branch returns (word string, vector array<double>)."""
    path = os.path.join(sf_dir, "words.parquet")
    if os.path.exists(path):
        return spark.read.parquet(path).select("word", "vector")
    from ..pipelines import build_words_table

    return build_words_table(spark, load_table(spark, sf_dir, "documents"), dim=dim)


def project_dynamic(df: DataFrame, base: tuple[str, ...],
                    optional: tuple[str, ...]) -> DataFrame:
    """B2 dynamic column projection (reference rclip_server.py:213-225): the
    loader sniffs which optional columns exist and projects accordingly —
    fixed core + optional columns discovered at scan time."""
    cols = list(base) + [c for c in optional if c in df.columns]
    return df.select(*cols)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def table_row_count(path: str) -> int:
    """EXACT row count from parquet FOOTER metadata — zero Spark jobs, zero
    data reads: every parquet file footer records its row count, so the
    total is a sum over file metadata (pyarrow reads only the footers).
    This is how a planner should answer "how big is this table" for cost
    decisions — e.g. the lsh_knn_join scale guard's n_left/n_right, or
    broadcast-side selection — without re-executing the scan. Works on a
    single .parquet file or a directory tree of them. At 100 TB the cost
    is one footer read per file (catalog/manifest-cached in a real
    deployment; the manifest-log layout could store it at commit time)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def column_footer_counts(path: str, col: str) -> tuple[int, int | None]:
    """(total rows, total NULL count) for ONE column of a parquet file or
    directory — from footer metadata only: zero Spark jobs, zero data
    reads. Spark's parquet writer records a null count per column chunk
    by default, so validation arithmetic that only needs row/null/
    distinct-set cardinalities (e.g. the MERGE duplicate-key guard) can
    ride the files a statement writes anyway instead of paying its own
    counting job. A file that lacks the column entirely (schema
    evolution) contributes its full row count as NULLs — exactly what a
    reader would materialize. Returns ``(rows, None)`` when any chunk
    carries no null-count statistic, so callers can fall back to a
    counting job rather than trust incomplete metadata."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        targets = [path]
    else:
        targets = [os.path.join(root, f)
                   for root, _, files in os.walk(path)
                   for f in files if f.endswith(".parquet")]
    rows, nulls = 0, 0
    for fp in targets:
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        rows += md.num_rows
        idx = pf.schema_arrow.get_field_index(col)
        if idx < 0:
            nulls += md.num_rows
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_null_count:
                return rows, None
            nulls += st.null_count
    return rows, nulls
