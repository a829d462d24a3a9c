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
    for every row. The per-dim stats (64 rows) are broadcast back onto the
    long form — both joins are on `dim`, and the stats side is tiny."""
    stats = feature_minmax(df, vec_col)
    long = df.select(id_col, F.posexplode(vec_col).alias("dim", "x"))
    normed = long.join(F.broadcast(stats), "dim").select(
        id_col,
        "dim",
        ((F.col("x").cast("double") - F.col("min_x")) / F.col("range_x")).alias("nx"),
    )
    return (
        normed.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "nx"))).alias("pairs"))
        .select(id_col, F.transform("pairs", lambda p: p["nx"]).alias("normalized"))
    )
