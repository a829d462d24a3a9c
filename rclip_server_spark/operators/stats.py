"""Element-wise vector statistics (reference A7/A8).

The reference folds np.minimum/np.maximum over all rows on the driver
(rclip_server.py:63-65). Spark-native: posexplode to (dim, value) and one
hash aggregation — a single partial-agg shuffle of 64 rows per partition,
which is scale-free (output is dim rows regardless of N)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_minmax(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension min/max/range over all vectors → (dim, min_x, max_x, range_x)."""
    return (
        df.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("min_x"),
            F.max(F.col("x").cast("double")).alias("max_x"),
        )
        .withColumn("range_x", F.col("max_x") - F.col("min_x"))
    )


def minmax_normalize(df: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """(x - min) / range per dimension (reference A8, rclip_server.py:267-268),
    for every row.

    Zero-shuffle plan: the per-dimension stats are at most ``dim`` rows, so
    they are computed once (feature_minmax — its only shuffle moves dim-sized
    partials) and collected to the driver, then applied as LITERAL arrays via
    functions.vector.minmax_scale — the main table is touched by a single
    map-only pass. The previous posexplode→join→re-assemble plan shuffled the
    full dataset twice; at 100 TB that is the difference between a scan and a
    catastrophe."""
    from ..functions import vector as V

    stats = feature_minmax(df, vec_col).orderBy("dim").collect()
    if not stats:
        return df.select(id_col, F.col(vec_col).alias("normalized")).limit(0)
    mins = [r["min_x"] for r in stats]
    ranges = [r["range_x"] for r in stats]
    return df.select(
        F.col(id_col),
        V.minmax_scale(F.col(vec_col), V.vec_lit(mins), V.vec_lit(ranges)).alias("normalized"),
    )
