"""Time-ordered join operators Spark lacks as built-ins: as-of join and
banded (range) self-join. Neither exists in the reference (its only join is
an implicit point lookup, rclip_server.py:230) — these are the §F /
north-star extensions a training-data event pipeline needs.

Scale shapes (the whole point):

* ``asof_join`` is **not a join at all** in the physical plan — it is one
  hash-partition shuffle on the key plus a per-partition sort (a window).
  Tagging both sides and running ``last(..., ignorenulls)`` over the
  time-ordered union gives every left row its most recent right match in
  O(n log n) per partition, with no inequality-join fallback to
  BroadcastNestedLoop. This survives 100 TB as long as a single key's
  history fits a partition (the same contract Spark's own window has).
* ``band_self_join`` buckets time into ``band``-width bins and equi-joins
  on (key, bin), exploding the LEFT side to the two bins a match can live
  in. Catalyst plans a plain shuffled hash join on (key, bucket) — never a
  cartesian product — and each qualifying pair is produced exactly once
  because the right row's bucket matches exactly one of the left's two
  exploded bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US_PER_UNIT = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def duration_us(spec: str) -> int:
    """'5 minutes' -> 300000000 (micros). Mirrors Spark interval strings."""
    qty, unit = spec.split()
    return int(qty) * _US_PER_UNIT[unit.lower()]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    tolerance: str | None = None,
    latest_by: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the latest right row with
    ``right.ts <= left.ts`` for the same key (DuckDB ``ASOF LEFT JOIN``
    semantics; ties at equal ts DO match).

    ``right`` must be unique per (key, ts) — pre-aggregate it if not, OR
    pass ``latest_by``: a right payload column (unique and NON-NULL per
    (key, ts), e.g. an event id) selecting the WHOLE row with the maximum
    ``latest_by`` among equal-ts duplicates. The dedupe then rides the
    window's existing sort — duplicates order by ``latest_by`` ascending
    so the running ``last()`` keeps the max row — instead of a separate
    pre-aggregation, whose groupBy((key, ts)) exchange is a SECOND
    shuffle of the right side on top of the window's own (the union
    forgets the agg's partitioning); one Exchange fewer (r14 opt).
    Equivalence notes: with a single right payload column this returns
    exactly ``groupBy(key, ts).agg(max(latest_by))``; with additional
    payload columns it keeps the full winning ROW, where the max() form
    would have collapsed them. NULLs in ``latest_by`` sort FIRST under
    ascending order, so a NULL row loses to any non-null sibling and an
    all-NULL duplicate group has no deterministic winner — keep the
    column non-null (matching the max()-ignores-NULLs intuition). Right
    payload columns come back prefixed ``r_``, plus ``gap_us`` =
    left.ts − matched right.ts in micros (NULL when unmatched or beyond
    ``tolerance``).
    """
    rpay = [c for c in right.columns if c not in (on, ts)]
    r_struct = F.struct(
        F.unix_micros(F.col(ts)).alias("__rts_us"), *[F.col(c) for c in rpay]
    )
    struct_t = right.select(r_struct.alias("__r")).schema[0].dataType

    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_t).alias("__r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(l_tag.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    ).select(*[F.col(c) for c in l_tag.columns])

    # right (side 0) sorts before left (side 1) at equal ts, so an equal-ts
    # right row is visible to the left row's running last(). With
    # latest_by, equal-ts right duplicates additionally order by that
    # column ascending, so the running last() lands on the max — left
    # rows carry a NULL struct there and are ignorenulls-skipped, so
    # their relative order stays irrelevant.
    order = [F.col(ts).asc(), F.col("__side").asc()]
    if latest_by is not None:
        if latest_by not in rpay:
            raise ValueError(
                f"latest_by column {latest_by!r} must be a right payload "
                f"column (one of {rpay})")
        order.append(F.col("__r").getField(latest_by).asc())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tag.unionByName(r_tag).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )

    out = matched.where(F.col("__side") == 1)
    gap: Column = F.unix_micros(F.col(ts)) - F.col("__m.__rts_us")
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(gap <= F.lit(duration_us(tolerance)), F.col("__m")),
        )
        gap = F.unix_micros(F.col(ts)) - F.col("__m.__rts_us")
    return out.select(
        *lcols,
        F.col("__m.__rts_us").alias("r_ts_us"),
        *[F.col(f"__m.{c}").alias(f"r_{c}") for c in rpay],
        gap.alias("gap_us"),
    )


def band_self_join(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    band: str = "5 minutes",
) -> DataFrame:
    """All ordered pairs (a, b) with the same key and
    ``a.ts <= b.ts <= a.ts + band`` (equal-ts pairs ordered by id so each
    unordered pair appears once).

    Returns (key, a_id, b_id, gap_us). Plans as an equi-join on
    (key, bucket): the left side explodes to the two band-width buckets a
    match can occupy; the band predicate is then an exact post-filter.
    """
    w_us = duration_us(band)
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts)).alias("__us"),
    )
    a = base.select(
        F.col("__k"),
        F.col("__id").alias("a_id"),
        F.col("__us").alias("a_us"),
        F.explode(
            F.array(F.expr(f"__us DIV {w_us}"), F.expr(f"__us DIV {w_us} + 1"))
        ).alias("__bucket"),
    )
    b = base.select(
        F.col("__k"),
        F.col("__id").alias("b_id"),
        F.col("__us").alias("b_us"),
        F.expr(f"__us DIV {w_us}").alias("__bucket"),
    )
    pairs = a.join(b, ["__k", "__bucket"]).where(
        (F.col("b_us") >= F.col("a_us"))
        & (F.col("b_us") <= F.col("a_us") + F.lit(w_us))
        & (
            (F.col("a_us") < F.col("b_us"))
            | ((F.col("a_us") == F.col("b_us")) & (F.col("a_id") < F.col("b_id")))
        )
    )
    return pairs.select(
        F.col("__k").alias(key),
        "a_id",
        "b_id",
        (F.col("b_us") - F.col("a_us")).alias("gap_us"),
    )


def _gram_explode(df: DataFrame, col: str, alias: str, q: int) -> DataFrame:
    """(string, gram) rows: distinct character q-grams of the lowercased
    column (whole string when shorter than q), row-local explode."""
    t = F.lower(F.col(col))
    grams = F.when(F.length(t) < q, F.array(t)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - q + 1),
                lambda i: t.substr(i, F.lit(q)),
            )
        )
    )
    return df.select(F.col(col).alias(alias), F.explode(grams).alias("g")).distinct()


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    col_l: str,
    col_r: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Entity-resolution fuzzy join: pairs of strings within Levenshtein
    distance ``max_dist``, without the all-pairs compare. Candidates are
    generated by an equi-join on shared character q-grams (any pair within
    edit distance d shares a q-gram whenever min-length > q*(d+1)-1, so for
    short tokens the filter is safe by construction and for long ones it is
    a superset of the true pairs); only candidates pay the O(L^2)
    levenshtein verification.

    Scale shape: explode q-grams (map) → equi-join on the gram (shuffle
    keyed by gram; hot grams are the skew to watch — salt or drop
    ultra-frequent grams at extreme scale) → distinct pair (one exchange)
    → row-local verify. Both engines share levenshtein with identical
    integer semantics, so the row is oracle-exact.
    """
    grams_l = _gram_explode(left, col_l, "sa", q)
    grams_r = _gram_explode(right, col_r, "sb", q)
    cands = grams_l.join(grams_r, "g").select("sa", "sb").distinct()
    return (
        cands.withColumn("dist", F.levenshtein("sa", "sb"))
        .where((F.col("dist") <= max_dist) & (F.col("sa") != F.col("sb")))
        .select("sa", "sb", F.col("dist").cast("long").alias("dist"))
    )


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Hot-key skew mitigation for a shuffle join neither broadcast nor
    AQE's skew-split can save: a handful of keys carrying a large share
    of the BIG side's rows would land entire hot keys in single reducer
    tasks (AQE can split a skewed PARTITION, but a single hot KEY's
    matched pairs still meet in one task's sort-merge buffer).

    The classic fix, expressed declaratively so Catalyst still plans a
    plain equi-join: the big side gets a DETERMINISTIC salt in
    [0, n_salts) hashed from its whole row (no rand() — retries and
    oracle replays must produce identical plans), the small side is
    replicated n_salts times via one explode, and the join runs on
    (key..., salt). Each hot key's rows now spread over ``n_salts``
    reducer tasks; result multiset is exactly the unsalted join's
    (every big row meets every one of its key's small rows exactly
    once — in the one salt replica it carries).

    ``how`` supports inner and left (the big side is the left): each
    big row keeps exactly one salt value, so left-outer null-extension
    semantics survive salting unchanged. Row amplification is
    O(n_salts x |small|) — the small side must be shuffle-sized, not
    broadcast-sized (if it broadcasts, just broadcast; salting is for
    the middle regime). Reference: no analogue (the reference joins
    nothing at scale); standard Spark skew recipe re-expressed.
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    n = int(n_salts)
    if n < 2:
        raise ValueError("n_salts must be >= 2 (1 is a plain join)")
    clash = [c for c in set(big.columns) | set(small.columns)
             if c == "__salt"]
    if clash:
        raise ValueError("salted_join reserves the __salt column name "
                         "— rename it on the input first")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n)])))
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")
