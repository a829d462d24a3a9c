"""Count-Min sketch: bounded-memory frequency estimation over unbounded
key domains (Cormode & Muthukrishnan 2005).

Why it earns a place next to the exact counters (``corpus.token_topk``):
at 100 TB the exact (token, count) table is vocab-sized — fine for words,
hostile for URLs / n-grams / (user, item) pairs whose domains explode.
The CMS is ``depth x width`` cells NO MATTER the domain: a corpus-wide
frequency summary that fits in a broadcast variable, mergeable across
partitions/days/streams by cell-wise addition (counts are linear).

Determinism: the "random" hash family is the salted md5 hash
(``portable_hash32`` with salt ``f"{salt}{d}"``), so the sketch — not just
its estimates — is bit-identical across engines, partitionings, and runs,
and the whole operator is DuckDB-oracle-checkable.

Scale shape: building is one map-side explode (x depth) into a
``(depth, bucket)`` hash-agg whose result is d*w rows regardless of input
size; estimation broadcast-joins the tiny sketch onto the probe keys.
Guarantee: estimate >= true count always (only over-counts on collisions);
with width w the expected overshoot is corpus_size * e / w at depth ln(1/δ).

Reference tie-in: the reference's word pool (rclip_server.py:399-400) holds
every word in RAM; this is the summary you keep when the domain outgrows
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32


def _cell(col, d: int, width: int, salt: str) -> F.Column:
    h = portable_hash32(F.concat_ws("|", F.lit(f"{salt}{d}"), col.cast("string")))
    return F.struct(
        F.lit(d).cast("long").alias("d"), (h % F.lit(width)).cast("long").alias("bucket")
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """(d, bucket, cnt): the sketch table — ``depth * width`` rows total.
    One map-side explode (each input row becomes ``depth`` cell hits) and
    one hash-agg shuffle whose output is sketch-sized, not domain-sized."""
    cells = F.array(*[_cell(F.col(col), d, width, salt) for d in range(depth)])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """(key, est): point-frequency estimates for every probe key —
    min over the key's ``depth`` cells, 0 for never-seen keys. The sketch
    (d*w rows) broadcasts; the probe side never shuffles."""
    cells = F.array(*[_cell(F.col(col), d, width, salt) for d in range(depth)])
    hits = (
        probes.select(F.col(col), F.explode(cells).alias("c"))
        .select(F.col(col), F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    )
    joined = hits.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def hll_shard_sketches(
    df, shard_col, key_col, lg_k: int = 12,
):
    """Per-shard mergeable HLL sketches (Spark's built-in Apache
    DataSketches HllSketch): one binary sketch row per shard. The 100 TB
    pattern this enables: sketch each partition/day/source ONCE at ingest,
    then answer any cross-shard distinct-count by unioning kilobyte
    sketches — no rescan of the data, unlike exact distinct (a full
    shuffle) or approx_count_distinct (which cannot merge across runs)."""
    return df.groupBy(shard_col).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("hll")
    )


def hll_union_estimate(sketches, group_cols=None):
    """Merge shard sketches (optionally per group) and estimate the
    distinct count. Input is the tiny sketch table, not the data."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)
