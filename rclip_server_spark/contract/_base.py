"""The driver contract: every implemented operator as a (Spark query,
DuckDB oracle SQL) pair, keyed by SURVEY.md §2 inventory id.

Design rules that make the oracle hash-match robust:

* **Bit-identical arithmetic where possible.** Dot products / norms are
  generated as left-associative ``0.0 + t1 + t2 + ...`` chains in BOTH
  engines, matching Spark's ``aggregate`` fold order — no rounding needed.
* **Exact integers for big aggregations.** Float SUM order is
  nondeterministic across engines/partitions, so money/value sums are
  per-row rounded to integer cents (identical per-row doubles → identical
  ints in both engines; DuckDB and Spark both round half-away-from-zero)
  and summed as BIGINT — order-independent and exact.
* **Round only group-order-dependent floats** (per-dim SUMs of vector
  components) to 6 dp in both engines.
* **Timestamps as unix micros** (`unix_micros` / `epoch_us`) — tz- and
  render-format-independent BIGINTs.
* **Types aligned**: counts/sizes cast to BIGINT in both engines (DuckDB
  SUM(BIGINT) yields HUGEINT → always CAST; DuckDB casts double→BIGINT by
  ROUNDING while Spark truncates → never bare-cast a double).

Reference semantics citations are in the operator modules; this module only
wires them to the fixtures and generates the twins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..functions import vector as V
from ..functions.hashing import MINHASH_PRIME, minhash_params, minhash_signature, simhash32
from ..operators import ann, dedup, similarity, stats
from ..plans.combinator import resolve_query, seeded_unit_vector
from ..plans.embedder import DeterministicEmbedder
from ..sources.catalog import load_table

EMB_DIM = 64
EMBEDDER = DeterministicEmbedder(EMB_DIM)
FLAGSHIP_QUERY = "zebra -stripes +2spots"
QV_FLAGSHIP = resolve_query(FLAGSHIP_QUERY, EMBEDDER)
QV_ZEBRA = EMBEDDER.embed_text("zebra")

N_MINHASH, N_BANDS, SHINGLE_N = 32, 8, 5
MH_PARAMS = minhash_params(N_MINHASH, seed=42)
PLANES4 = ann.hyperplanes(4, EMB_DIM, seed=42)
PLANES6 = ann.hyperplanes(6, EMB_DIM, seed=42)
_rng = np.random.default_rng(7)
CENTROIDS = _rng.standard_normal((8, EMB_DIM))
CENTROIDS /= np.linalg.norm(CENTROIDS, axis=1, keepdims=True)

PHRASES = [
    ("p0", ["1", "2", "3"]),
    ("p1", ["10", "20"]),
    ("p2", ["5", "7", "11", "13"]),
    ("p3", ["42", "99", "123"]),
]
MULTI_QUERY_TERMS = ["cat", "dog", "bird"]

STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in TXT.STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# DuckDB SQL fragment generators (twins of functions/{vector,text,hashing}.py)
# ---------------------------------------------------------------------------


def _f(x) -> str:
    # CAST from string, not a bare literal: DuckDB parses bare float literals
    # as DECIMAL(18,17) which is 1 ulp off the IEEE double Spark gets
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def dot_sql(expr: str, vec) -> str:
    """Left-assoc dot chain == Spark's aggregate(zip_with(...)) fold order."""
    terms = " + ".join(
        f"CAST({expr}[{i + 1}] AS DOUBLE) * {_f(v)}" for i, v in enumerate(vec)
    )
    return f"(0.0 + {terms})"


def dot2_sql(e1: str, e2: str) -> str:
    """Dot of two array COLUMNS, same left-assoc fold as functions.vector.dot."""
    terms = " + ".join(
        f"CAST({e1}[{i + 1}] AS DOUBLE) * CAST({e2}[{i + 1}] AS DOUBLE)"
        for i in range(EMB_DIM)
    )
    return f"(0.0 + {terms})"


def vec_array_sql(vec) -> str:
    return "[" + ", ".join(_f(v) for v in vec) + "]"


def normsq_sql(expr: str) -> str:
    terms = " + ".join(
        f"CAST({expr}[{i + 1}] AS DOUBLE) * CAST({expr}[{i + 1}] AS DOUBLE)"
        for i in range(EMB_DIM)
    )
    return f"(0.0 + {terms})"


def hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokens_sql(expr: str) -> str:
    t = f"trim(lower({expr}))"
    return (
        f"(CASE WHEN length({t}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split_regex({t}, '\\s+') END)"
    )


def char_shingles_sql(expr: str, n: int = SHINGLE_N) -> str:
    t = f"lower({expr})"
    return (
        f"list_transform(range(1, greatest(length({t}) - {n} + 2, 1)), "
        f"i -> substr({t}, CAST(i AS INT), {n}))"
    )


def word_ngrams_sql(toks: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n} + 2, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' '))"
    )


def minhash_sig_exprs(hashed: str) -> list[str]:
    """One list-min expression per family member, over a hashed-shingle list."""
    return [
        f"list_min(list_transform({hashed}, h -> (h * {a} + {b}) % {MINHASH_PRIME}))"
        for (a, b) in MH_PARAMS
    ]


def simhash_sql(toks: str) -> str:
    hashed = f"list_transform({toks}, tok -> {hash32_sql('tok')})"
    bits = []
    for i in range(32):
        contrib = (
            f"CAST(coalesce(list_aggregate(list_transform({hashed}, "
            f"h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END), 'sum'), 0) AS BIGINT)"
        )
        bits.append(f"(CASE WHEN {contrib} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return "(" + " + ".join(bits) + ")"


def bucket_sql(expr: str, planes) -> str:
    bits = [
        f"(CASE WHEN {dot_sql(expr, p)} >= 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


def cents(expr: str) -> str:
    """Exact integer cents from a double — round() is half-away-from-zero in
    both engines; never bare-cast (DuckDB rounds, Spark truncates)."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def cents_col(c) -> F.Column:
    return F.round(c * F.lit(100.0)).cast("long")


def _utc(spark: SparkSession) -> None:
    """Timestamp queries must render/extract in UTC to match the tz-naive
    DuckDB oracle — the driver's session may not be configured."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The words-table role (reference RS:292-308), derived from embeddings:
    word = vec_id as string — lets phrase composition be oracle-checked
    entirely in SQL (document-text embeddings are not SQL-expressible)."""
    return _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("word"), F.col("embedding").alias("vector")
    )


WORDS_SQL = "(SELECT CAST(vec_id AS VARCHAR) AS word, embedding AS vector FROM embeddings)"

_QUERIES: dict = {}
_ORACLES: dict = {}


def _register(name: str, fn, sql: str | None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


