"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ..functions.localrel import values_df
from ._base import _f, _register, _t, _words_df  # noqa: F401

# ===========================================================================
# A. vector / similarity operators
# ===========================================================================

_register(
    "a1_a2_flagship_topk",
    lambda spark, sf: similarity.topk_similar(_t(spark, sf, "embeddings"), QV_FLAGSHIP, k=12),
    f"""
    SELECT vec_id, {dot_sql('embedding', QV_FLAGSHIP)} AS score
    FROM embeddings ORDER BY score DESC, vec_id LIMIT 12
    """,
)

_register(
    "a1_scores_full_scan",
    lambda spark, sf: similarity.with_score(
        _t(spark, sf, "embeddings"), QV_ZEBRA
    ).select("vec_id", "score"),
    f"SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score FROM embeddings",
)

_register(
    "a2_topk_k50",
    lambda spark, sf: similarity.topk_similar(_t(spark, sf, "embeddings"), QV_ZEBRA, k=50),
    f"""
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM embeddings ORDER BY score DESC, vec_id LIMIT 50
    """,
)

_register(
    "a4_l2_normalize",
    lambda spark, sf: _t(spark, sf, "embeddings").select(
        "vec_id", F.posexplode(V.l2_normalize("embedding")).alias("dim", "val")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "val"),
    f"""
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) / sqrt({normsq_sql('embedding')}) AS val
    FROM embeddings
    """,
)

_register(
    "a6_point_lookup",
    lambda spark, sf: _t(spark, sf, "embeddings")
    .where(F.col("vec_id") == 42)
    .select("vec_id", "label", F.element_at("embedding", 1).cast("double").alias("e0")),
    "SELECT vec_id, label, CAST(embedding[1] AS DOUBLE) AS e0 FROM embeddings WHERE vec_id = 42",
)

_register(
    "a7_feature_minmax",
    lambda spark, sf: stats.feature_minmax(_t(spark, sf, "embeddings")).select(
        F.col("dim").cast("long").alias("dim"), "min_x", "max_x", "range_x"
    ),
    """
    SELECT CAST(i - 1 AS BIGINT) AS dim, min(x) AS min_x, max(x) AS max_x,
           max(x) - min(x) AS range_x
    FROM (SELECT generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
    GROUP BY i
    """,
)

_register(
    "a8_minmax_normalize",
    lambda spark, sf: stats.minmax_normalize(_t(spark, sf, "embeddings"))
    .select("vec_id", F.posexplode("normalized").alias("dim", "nx"))
    .select("vec_id", F.col("dim").cast("long").alias("dim"), "nx"),
    """
    WITH s AS (
      SELECT i, min(x) AS mn, max(x) AS mx, max(x) - min(x) AS rg
      FROM (SELECT generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
      GROUP BY i)
    SELECT e.vec_id, CAST(s.i - 1 AS BIGINT) AS dim,
           (CAST(e.embedding[CAST(s.i AS INT)] AS DOUBLE) - s.mn) / s.rg AS nx
    FROM embeddings e CROSS JOIN s
    """,
)


def _a9_query(spark: SparkSession, sf: str) -> DataFrame:
    vec = seeded_unit_vector(42, EMB_DIM)
    rows = [(int(i), float(v)) for i, v in enumerate(vec)]
    return values_df(spark, rows, "dim bigint, val double")


_register(
    "a9_seeded_random_vector",
    _a9_query,
    # golden VALUES: the reference algorithm (stdlib random.gauss, seed 42,
    # rclip_server.py:164-174) hand-evaluated at generation time
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"(CAST({i} AS BIGINT), {_f(v)})"
        for i, v in enumerate(seeded_unit_vector(42, EMB_DIM))
    )
    + ") t(dim, val)",
)

_register(
    "a10_random_row",
    lambda spark, sf: _t(spark, sf, "embeddings")
    .orderBy(F.rand(42))
    .limit(1)
    .select("vec_id", "label"),
    None,  # Spark rand() stream is engine-specific; rows-only check
)

_register(
    "a11_best_words",
    lambda spark, sf: similarity.best_words(_words_df(spark, sf), QV_ZEBRA, k=50),
    f"""
    SELECT word, {dot_sql('vector', QV_ZEBRA)} AS score
    FROM {WORDS_SQL} w ORDER BY score DESC, word LIMIT 50
    """,
)


def _phrases_df(spark: SparkSession):
    return values_df(
        spark, [(pid, ws) for pid, ws in PHRASES],
        "phrase_id string, words array<string>"
    )


_PHRASE_MEMBERS_SQL = (
    "(SELECT * FROM (VALUES "
    + ", ".join(f"('{pid}', '{w}')" for pid, ws in PHRASES for w in ws)
    + ") t(phrase_id, word))"
)

_PHRASE_SUMS_SQL = f"""
  WITH mem AS (
    SELECT p.phrase_id, w.vector
    FROM {_PHRASE_MEMBERS_SQL} p JOIN {WORDS_SQL} w USING (word)),
  sums AS (
    SELECT phrase_id, i, SUM(CAST(x AS DOUBLE)) AS s
    FROM (SELECT phrase_id, generate_subscripts(vector, 1) AS i,
                 unnest(vector) AS x FROM mem)
    GROUP BY phrase_id, i),
  norms AS (
    SELECT phrase_id, sqrt(SUM(s * s)) AS nrm FROM sums GROUP BY phrase_id)
"""

_register(
    "a12_phrase_embedding",
    lambda spark, sf: similarity.phrase_embedding_df(
        _words_df(spark, sf), _phrases_df(spark)
    )
    .select("phrase_id", F.posexplode("vector").alias("dim", "val"))
    .select(
        "phrase_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("val", 6).alias("val"),
    ),
    _PHRASE_SUMS_SQL
    + """
    SELECT s.phrase_id, CAST(s.i - 1 AS BIGINT) AS dim, round(s.s / n.nrm, 6) AS val
    FROM sums s JOIN norms n USING (phrase_id)
    """,
)

_register(
    "a13_phrase_approx_score",
    lambda spark, sf: similarity.with_score(
        similarity.phrase_embedding_df(_words_df(spark, sf), _phrases_df(spark)),
        QV_ZEBRA,
        vec_col="vector",
    ).select("phrase_id", F.round("score", 6).alias("score")),
    _PHRASE_SUMS_SQL
    + f"""
    , vecs AS (
      SELECT s.phrase_id, s.i, s.s / n.nrm AS v
      FROM sums s JOIN norms n USING (phrase_id))
    SELECT phrase_id,
           round(SUM(v * ({vec_array_sql(QV_ZEBRA)})[CAST(i AS INT)]), 6) AS score
    FROM vecs GROUP BY phrase_id
    """,
)

_register(
    "a14_best_phrases",
    lambda spark, sf: similarity.best_phrases(
        _words_df(spark, sf),
        QV_ZEBRA,
        top_words=30,
        n_samples_per_len=50,
        k=40,
    ),
    None,  # candidate sampling is driver-side seeded RNG; rows-only check
)

_register(
    "ann_multi_query_topk",
    lambda spark, sf: ann.brute_force_topk_multi(
        _t(spark, sf, "embeddings"),
        values_df(
            spark,
            [(t, [float(x) for x in EMBEDDER.embed_text(t)]) for t in MULTI_QUERY_TERMS],
            "query_id string, query_vec array<double>",
        ),
        k=10,
    ).select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")),
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"""(SELECT '{t}' AS query_id, vec_id,
            {dot_sql('embedding', EMBEDDER.embed_text(t))} AS score,
            row_number() OVER (ORDER BY {dot_sql('embedding', EMBEDDER.embed_text(t))} DESC, vec_id) AS rank
            FROM embeddings QUALIFY rank <= 10)"""
        for t in MULTI_QUERY_TERMS
    )
    + ")",
)


def _lsh_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    return ann.lsh_topk(_t(spark, sf, "embeddings"), QV_ZEBRA, k=10, n_planes=4, seed=42)


_QB4 = int(sum((1 << i) for i, p in enumerate(PLANES4) if float(p @ QV_ZEBRA) >= 0))

_register(
    "ann_lsh_topk",
    _lsh_topk_query,
    f"""
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM embeddings
    WHERE {bucket_sql('embedding', PLANES4)} = {_QB4}
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)

_register(
    "ann_hyperplane_near_dup",
    lambda spark, sf: ann.hyperplane_lsh_near_dup(
        # threshold 0.4 matches the oracle (lowered with the multiset row:
        # 0.5 finds zero pairs in the near-orthogonal sf0.01 fixture)
        _t(spark, sf, "embeddings"), threshold=0.4, n_planes=6, seed=42, dim=EMB_DIM
    ),
    f"""
    WITH b AS (SELECT vec_id AS id, embedding AS v,
                      {bucket_sql('embedding', PLANES6)} AS bucket FROM embeddings)
    SELECT id_a, id_b, cosine FROM (
      SELECT a.id AS id_a, c.id AS id_b, {dot2_sql('a.v', 'c.v')} AS cosine
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.id < c.id)
    WHERE cosine >= 0.4
    """,
)


def _ivf_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    return ann.ivf_topk(_t(spark, sf, "embeddings"), QV_ZEBRA, CENTROIDS, k=10, n_probe=2)


_IVF_ORDER = [int(i) for i in np.argsort(-(CENTROIDS @ QV_ZEBRA))[:2]]

_IVF_DOTS = ", ".join(
    f"{dot_sql('embedding', c)} AS d{i}" for i, c in enumerate(CENTROIDS)
)
_IVF_G = "greatest(" + ", ".join(f"d{i}" for i in range(len(CENTROIDS))) + ")"
# descending index order = Spark greatest-of-structs tie-break (larger cell id)
_IVF_CASE = (
    "CASE "
    + " ".join(
        f"WHEN d{i} = {_IVF_G} THEN {i}" for i in range(len(CENTROIDS) - 1, -1, -1)
    )
    + " END"
)

_register(
    "ann_ivf_topk",
    _ivf_topk_query,
    f"""
    WITH d AS (SELECT vec_id, embedding, {_IVF_DOTS} FROM embeddings),
    assigned AS (SELECT vec_id, embedding, {_IVF_CASE} AS cell FROM d)
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM assigned WHERE cell IN ({', '.join(str(i) for i in _IVF_ORDER)})
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)

