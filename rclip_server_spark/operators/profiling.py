"""Data-quality profiling and constraint checks (deequ-style).

A 100 TB pipeline trusts its inputs only after profiling them; the
reference's equivalent is ad-hoc (index_wikimedia.py:91 relies on a SQLite
UNIQUE constraint to catch duplicate filepaths, rclip_server.py:210 trusts
NULL-means-live). Here the checks are explicit, distributed, and cheap:

* ``profile_table`` — one metric row per column: count / nulls / exact
  distinct / min / max, emitted in long format so any table profiles into
  the same schema. Each column's aggregate is a separate partial-agg pass
  unioned together — Spark runs the scans in one job, shares the file
  listing, and every aggregation combines map-side (distinct is the only
  exchange, keyed on the profiled column itself).
* ``uniqueness_violations`` — key groups occurring more than once (the
  UNIQUE constraint as a query: one hash-agg, HAVING count > 1).
* ``referential_violations`` — child keys absent from the parent (the FK
  constraint as a LEFT ANTI join; the parent's key column broadcasts when
  small, and the anti join short-circuits per partition otherwise).

All outputs are exact integers/strings, so every check is
DuckDB-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct, min_str,
    max_str) per requested column. min/max are rendered as strings so one
    schema covers numeric and string columns alike (rendering is
    engine-stable for integers and strings; profile floats via their
    dedicated stats operators instead)."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def row_fingerprint(cols: list[str], sep: str = "\x1f", null: str = "\x00") -> F.Column:
    """md5 over the separator-joined, null-sentineled string casts of
    ``cols`` — a 16-byte row digest both engines compute identically.
    Keep float columns out (string rendering differs across engines);
    integer/string/date casts are engine-stable."""
    return F.md5(
        F.concat_ws(sep, *[F.coalesce(F.col(c).cast("string"), F.lit(null)) for c in cols])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per key
    that was ``added`` / ``removed`` / ``changed``, unchanged keys dropped.

    The 100 TB-shape decision is to fingerprint BEFORE the join: each side
    is projected to (key, md5-of-compared-columns) map-side, so the
    full-outer shuffle moves 16-byte digests instead of document bodies.
    The join itself is the unavoidable cost of CDC — one co-partitioned
    exchange per side on the key; with both snapshots bucket-written on
    the key (sources/writer.write_partitioned) it becomes shuffle-free.
    The reference has no incremental story beyond re-INSERTing everything
    (index_wikimedia.py:86-103); this is what replaces a full reload."""
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("__fp_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("__fp_new"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
    )
    return (
        j.select(*key_cols, change.alias("change"))
        .where(F.col("change").isNotNull())
    )


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key tuples violating a UNIQUE(key_cols) constraint, with their
    multiplicities. Empty result == constraint holds."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Distinct child keys with no matching parent row — a foreign-key
    check as a LEFT ANTI join. Empty result == referential integrity
    holds. NULL child keys are excluded (SQL FK semantics: NULL never
    violates)."""
    return (
        child.select(F.col(child_key).alias("orphan_key"))
        .where(F.col("orphan_key").isNotNull())
        .distinct()
        .join(
            parent.select(F.col(parent_key).alias("orphan_key")).distinct(),
            "orphan_key",
            "left_anti",
        )
    )
