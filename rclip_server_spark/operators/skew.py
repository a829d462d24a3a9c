"""Skew-resilient aggregation: salted two-phase groupBy.

A single hot key (one language dominating `documents`, one returnflag
dominating `lineitem`) turns a groupBy shuffle into one straggler reducer at
100 TB. The classic fix: append a random salt to the key so the hot group
splits across `salt_buckets` reducers, partially aggregate, then re-aggregate
the per-salt partials on the true key. Works for any DECOMPOSABLE aggregate
(count, sum, min, max); results are identical to the plain groupBy — the
contract registers both against one oracle to prove it.

AQE's skew-join handling covers JOIN skew at runtime; aggregation skew still
wants the salt because the partial-agg shape is decided at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation over ``keys``.

    ``aggs`` maps output column name → (input column expression, combiner)
    where combiner ∈ {'sum', 'count', 'min', 'max'}: phase 1 applies it per
    (keys + salt), phase 2 re-combines partials per keys ('count' partials
    re-combine with sum).
    """
    salted = df.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))

    phase1 = [
        {
            "sum": F.sum,
            "count": lambda c: F.count(c),
            "min": F.min,
            "max": F.max,
        }[how](col).alias(name)
        for name, (col, how) in aggs.items()
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*phase1)

    phase2 = [
        {
            "sum": F.sum,
            "count": F.sum,  # counts re-combine additively
            "min": F.min,
            "max": F.max,
        }[how](name).alias(name)
        for name, (_, how) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-resilient equi-join: salt the big side, REPLICATE the small side.

    A hot join key sends all its rows to one reducer in a shuffle join; AQE's
    skew-join split handles it at runtime, but only after the skewed shuffle
    files exist and only for sort-merge joins. The plan-time fix: the big
    side gets a uniform salt in [0, salt_buckets); the small side is
    replicated once per salt value (explode of a literal sequence — rows × 
    salt_buckets, fine for a dimension table); the join key becomes
    (key, salt), so the hot key's rows spread across ``salt_buckets``
    reducers. Result set is EXACTLY the plain join's (the contract row
    proves it against the unsalted oracle).

    Trade-off worth stating at 100 TB: replication multiplies the small side
    shuffle by salt_buckets — use for skewed JOINS where the small side is
    dim-sized but too big (or too mid-plan) to broadcast outright."""
    salted_big = big.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
