"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads, one JVM);
the configs below are chosen so the same code scales to a real cluster:
AQE re-plans shuffles at runtime (skew join, partition coalescing), Arrow is
on for the pandas-UDF scoring path, and the session timezone is pinned to UTC
so results hash-match the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "rclip_server_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to the core count: the fixtures are small
    enough that 200 partitions (Spark's default) would be pure scheduling
    overhead, and on a real cluster AQE coalesces post-shuffle partitions to
    the right size anyway.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in the catalog (micros, like the
        # DuckDB oracle's ts::TIMESTAMP truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Compression codecs as env knobs (r15, guide §2.3/§6). Local
        # defaults keep Spark's own defaults (lz4 shuffle, snappy parquet)
        # so the driver's bench stays comparable round-over-round; at
        # sf0.1 every shuffle in the headline set is KB-MB-sized, so a
        # codec delta is unmeasurable here (A/B table in
        # OPTIMIZATION_r15.md). At 100 TB set SPARK_GRAFT_IO_CODEC=zstd
        # and SPARK_GRAFT_PARQUET_CODEC=zstd: markedly better ratio for a
        # bit more CPU on network/disk-bound shuffles and scans.
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
        .config("spark.sql.parquet.compression.codec",
                os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
