"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _f, _register, _t, _utc, _words_df  # noqa: F401
from ._dedup_text import _TOKS  # noqa: F401
from ._vector import _QB4, _phrases_df  # noqa: F401

# ===========================================================================
# TF-IDF + remaining inventory rows (A13 exact-vs-approx, B2 projection)
# ===========================================================================

from ..operators import text_analysis as TA


_register(
    "text_tfidf",
    lambda spark, sf: TA.tfidf(_t(spark, sf, "documents")).select(
        "doc_id", "token", F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"), F.round("tfidf", 6).alias("tfidf"),
    ),
    f"""
    WITH toks AS (SELECT doc_id AS id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, token),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM (SELECT DISTINCT id, token FROM toks) GROUP BY token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT tf.id AS doc_id, tf.token, tf.tf, dfreq.df,
           round(CAST(tf.tf AS DOUBLE) * ln(n_docs / CAST(dfreq.df AS DOUBLE)), 6) AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    """,
)

_register(
    "text_tfidf_top_terms",
    lambda spark, sf: TA.top_terms_per_doc(_t(spark, sf, "documents"), k=3).select(
        "doc_id", "token", F.round("tfidf", 6).alias("tfidf"), "rnk"
    ),
    f"""
    WITH toks AS (SELECT doc_id AS id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, token),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM (SELECT DISTINCT id, token FROM toks) GROUP BY token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.id AS doc_id, tf.token,
             CAST(tf.tf AS DOUBLE) * ln(n_docs / CAST(dfreq.df AS DOUBLE)) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n)
    SELECT doc_id, token, round(tfidf, 6) AS tfidf,
           row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
    FROM scored QUALIFY rnk <= 3
    """,
)

_register(
    "a13_exact_vs_approx_phrase",
    # exact side model-encodes on the driver (embedder; not SQL-expressible)
    lambda spark, sf: similarity.phrase_scores_exact_vs_approx(
        _words_df(spark, sf),
        _phrases_df(spark),
        QV_ZEBRA,
        EMBEDDER,
    ).select(
        "phrase_id",
        F.round("approx_score", 6).alias("approx_score"),
        F.round("exact_score", 6).alias("exact_score"),
    ),
    None,
)

_register(
    "b2_dynamic_projection",
    lambda spark, sf: __import__(
        "rclip_server_spark.sources.catalog", fromlist=["project_dynamic"]
    ).project_dynamic(
        _t(spark, sf, "documents"),
        base=("doc_id", "text"),
        optional=("lang", "nonexistent_col", "source"),
    ).select("doc_id", "lang", "source"),
    "SELECT doc_id, lang, source FROM documents",
)

# ===========================================================================
# join-strategy pair: broadcast vs shuffle (sort-merge) on the same query —
# results identical, physical plans deliberately different
# ===========================================================================


def _rel_shuffle_join(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    joined = li.hint("merge").join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents_col(F.col("l_extendedprice"))).alias("sum_price_cents"),
    )


_register(
    "rel_join_sortmerge_agg",
    _rel_shuffle_join,
    f"""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM({cents('l_extendedprice')}) AS BIGINT) AS sum_price_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)

def _rel_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    # GROUPING SETS has no DataFrame-API form; the SQL frontend IS the
    # idiomatic Spark path here (same Catalyst plan as rollup/cube)
    _t(spark, sf, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n
        FROM _orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


_register(
    "rel_grouping_sets",
    _rel_grouping_sets,
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)

_register(
    "rel_array_map_functions",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id",
        F.array_max(F.transform(TXT.tokens(F.col("text")), lambda t: F.length(t)))
        .cast("long")
        .alias("max_tok_len"),
        # joined to a string: the driver's canonicalizer can't hash list
        # cells (tokens are whitespace-split so ' ' is collision-free)
        F.array_join(
            F.sort_array(F.slice(TXT.tokens(F.col("text")), 1, 3)), " "
        ).alias("first3_sorted"),
        F.array_contains(TXT.tokens(F.col("text")), "the").alias("has_the"),
    ),
    f"""
    SELECT doc_id,
           CAST(list_max(list_transform({_TOKS}, t -> length(t))) AS BIGINT) AS max_tok_len,
           array_to_string(list_sort(list_slice({_TOKS}, 1, 3)), ' ') AS first3_sorted,
           list_contains({_TOKS}, 'the') AS has_the
    FROM documents
    """,
)

# ===========================================================================
# ANN depth: multi-probe LSH (oracle-checked) + trained-IVF probe (iterative
# k-means training -> rows-only per the contract's non-SQL-expressible rule)
# ===========================================================================

_MP_PROBES = sorted(
    {_QB4} | {_QB4 ^ (1 << i) for i in range(4)}
)

_register(
    "ann_lsh_topk_multiprobe",
    lambda spark, sf: ann.lsh_topk_multiprobe(
        _t(spark, sf, "embeddings"), QV_ZEBRA, k=10, n_planes=4, n_probe_bits=1, seed=42
    ),
    f"""
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM embeddings
    WHERE {bucket_sql('embedding', PLANES4)} IN ({', '.join(str(b) for b in _MP_PROBES)})
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)


def _ivf_trained_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    centroids = ann.ivf_train_kmeans(emb, k=8, iters=3)
    return ann.ivf_topk(emb, QV_ZEBRA, centroids, k=10, n_probe=2)


_register("ann_ivf_trained_topk", _ivf_trained_query, None)

# ===========================================================================
# skew-resilient aggregation: salted two-phase == plain groupBy (same oracle)
# ===========================================================================

from ..operators import skew as SK


def _salted_agg_query(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return SK.salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": (F.lit(1), "count"),
            "sum_qty_cents": (cents_col(F.col("l_quantity")), "sum"),
            "max_price_cents": (cents_col(F.col("l_extendedprice")), "max"),
        },
        salt_buckets=16,
    ).select("l_returnflag", F.col("n").cast("long").alias("n"),
             "sum_qty_cents", "max_price_cents")


_register(
    "rel_salted_skew_agg",
    _salted_agg_query,
    f"""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM({cents('l_quantity')}) AS BIGINT) AS sum_qty_cents,
           max({cents('l_extendedprice')}) AS max_price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)

_register(
    "rel_outer_join",
    # left outer: customers keep their row even with zero orders (null side
    # aggregated as zero) — the missing how= variant of the join family
    lambda spark, sf: _t(spark, sf, "customer")
    .join(
        _t(spark, sf, "orders"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_outer",
    )
    .groupBy("c_custkey")
    .agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.sum(cents_col(F.col("o_totalprice"))), F.lit(0)).alias("sum_cents"),
    ),
    f"""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(SUM({cents('o_totalprice')}), 0) AS BIGINT) AS sum_cents
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)

# ===========================================================================
# reverse lookup over a REAL text corpus (words table derived via the
# distributed embedder -> rows-only; the embeddings-as-words variants above
# carry the oracle-checked semantics)
# ===========================================================================

from .. import pipelines as PIPE


def _similar_words_corpus(spark: SparkSession, sf: str) -> DataFrame:
    return PIPE.similar_words_from_corpus(
        spark, _t(spark, sf, "documents"), "zebra -stripes", EMBEDDER, k=25
    )


_register("a11_similar_words_from_corpus", _similar_words_corpus, None)

# ===========================================================================
# SimHash Hamming-banded near-dup (exact recall for hamming < chunks by
# pigeonhole; the oracle verifies ALL pairs by popcount — same result set)
# ===========================================================================

_register(
    "dedup_simhash_near_dup",
    lambda spark, sf: dedup.simhash_near_dup(
        _t(spark, sf, "documents"), max_hamming=3, chunks=4
    ),
    f"""
    WITH fp AS (SELECT doc_id AS id, {simhash_sql(_TOKS)} AS sh FROM documents)
    SELECT a.id AS id_a, c.id AS id_b,
           CAST(bit_count(xor(a.sh, c.sh)) AS INT) AS hamming
    FROM fp a JOIN fp c ON a.id < c.id
    WHERE bit_count(xor(a.sh, c.sh)) <= 3
    """,
)

# ===========================================================================
# int8 quantization (storage tier) + two-table similarity join
# ===========================================================================

_register(
    "vec_quantize_int8_roundtrip",
    lambda spark, sf: _t(spark, sf, "embeddings")
    .select(
        "vec_id",
        F.posexplode(V.quantize_int8("embedding")).alias("dim", "q"),
    )
    .select("vec_id", F.col("dim").cast("long").alias("dim"), "q"),
    """
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * 127.0) AS INT) AS q
    FROM embeddings
    """,
)

_register(
    "vec_quantized_topk",
    # the storage-tier query path: score against DEQUANTIZED embeddings —
    # identical ranking math in both engines over the same int8 values
    lambda spark, sf: similarity.topk_similar(
        _t(spark, sf, "embeddings").select(
            "vec_id",
            V.dequantize_int8(V.quantize_int8("embedding")).alias("embedding"),
        ),
        QV_ZEBRA,
        k=20,
    ),
    f"""
    WITH dq AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0) AS INT) / 127.0) AS embedding
      FROM embeddings)
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM dq ORDER BY score DESC, vec_id LIMIT 20
    """,
)


def _lsh_sim_join_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    left = emb.where(F.col("label") < 5)
    right = emb.where(F.col("label") >= 5)
    return ann.lsh_similarity_join(left, right, threshold=0.3, n_planes=6, dim=EMB_DIM)


_register(
    "ann_lsh_similarity_join",
    _lsh_sim_join_query,
    f"""
    WITH lb AS (SELECT vec_id AS id_a, embedding AS va,
                       {bucket_sql('embedding', PLANES6)} AS bucket
                FROM embeddings WHERE label < 5),
    rb AS (SELECT vec_id AS id_b, embedding AS vb,
                  {bucket_sql('embedding', PLANES6)} AS bucket
           FROM embeddings WHERE label >= 5)
    SELECT id_a, id_b, cosine FROM (
      SELECT id_a, id_b, {dot2_sql('va', 'vb')} AS cosine
      FROM lb JOIN rb USING (bucket))
    WHERE cosine >= 0.3
    """,
)

_register(
    "ann_multi_query_topk_gemm",
    # one-pass GEMM for all queries; scores rounded (GEMM summation order
    # differs from the left-assoc SQL fold by ~1 ulp)
    lambda spark, sf: ann.brute_force_topk_multi_gemm(
        _t(spark, sf, "embeddings"),
        np.stack([EMBEDDER.embed_text(t) for t in MULTI_QUERY_TERMS]),
        MULTI_QUERY_TERMS,
        k=10,
    ).select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank"),
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"""(SELECT '{t}' AS query_id, vec_id,
            round({dot_sql('embedding', EMBEDDER.embed_text(t))}, 6) AS score,
            row_number() OVER (ORDER BY {dot_sql('embedding', EMBEDDER.embed_text(t))} DESC, vec_id) AS rank
            FROM embeddings QUALIFY rank <= 10)"""
        for t in MULTI_QUERY_TERMS
    )
    + ")",
)

_register(
    "ann_hyperplane_near_dup_multiset",
    lambda spark, sf: ann.hyperplane_lsh_near_dup_multiset(
        # threshold 0.4 (was 0.5): the synthetic embeddings are near-
        # orthogonal, and 0.5 yields ZERO pairs at the driver's sf0.01 — a
        # trivially-green oracle cell; 0.4 yields 11 real pairs there
        _t(spark, sf, "embeddings"), threshold=0.4, n_planes=6, n_sets=3, dim=EMB_DIM
    ),
    f"""
    WITH b AS (SELECT vec_id AS id, embedding AS v,
                      {bucket_sql('embedding', PLANES6)} AS b0,
                      {bucket_sql('embedding', ann.hyperplanes(6, EMB_DIM, 43))} AS b1,
                      {bucket_sql('embedding', ann.hyperplanes(6, EMB_DIM, 44))} AS b2
               FROM embeddings)
    SELECT id_a, id_b, cosine FROM (
      SELECT a.id AS id_a, c.id AS id_b, {dot2_sql('a.v', 'c.v')} AS cosine
      FROM b a JOIN b c
        ON a.id < c.id AND (a.b0 = c.b0 OR a.b1 = c.b1 OR a.b2 = c.b2))
    WHERE cosine >= 0.4
    """,
)


def _embed_near_dup_docs(spark: SparkSession, sf: str) -> DataFrame:
    from .. import pipelines as _P

    # embedder output is not SQL-expressible -> rows-only
    return _P.embedding_near_dup_documents(
        spark, _t(spark, sf, "documents"), threshold=0.8
    )


_register("d1_embedding_near_dup_documents", _embed_near_dup_docs, None)


# ===========================================================================
# Time-ordered joins over events (operators/joins.py) — as-of + band join
# ===========================================================================


def _ev_asof(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import joins

    _utc(spark)
    ev = _t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    # equal-ts views dedupe to max(event_id) INSIDE the asof window's
    # sort (latest_by) — same answer as the oracle's GROUP BY views CTE,
    # minus the pre-aggregation's own exchange (r14 opt: 2 Exchanges -> 1)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = joins.asof_join(clicks, views, on="user_id", ts="ts",
                          latest_by="view_event_id")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("r_ts_us").alias("view_ts_us"),
        F.col("r_view_event_id").alias("view_event_id"),
        "gap_us",
    )


_register(
    "ev_asof_click_view",
    _ev_asof,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           epoch_us(v.ts) AS view_ts_us, v.view_event_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)


def _ev_band_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import joins

    _utc(spark)
    return joins.band_self_join(
        _t(spark, sf, "events"), key="user_id", ts="ts", id_col="event_id",
        band="5 minutes",
    )


_register(
    "ev_band_join_pairs",
    _ev_band_join,
    """
    SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) >= epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
     AND (epoch_us(a.ts) < epoch_us(b.ts)
          OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
    """,
)


# ===========================================================================
# Lexical retrieval + hybrid fusion (operators/retrieval.py)
# ===========================================================================

BM25_TERMS = ["vector", "join", "spark"]
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_sql(terms: list[str], where: str = "", topk: int | None = None,
              topk_where: str = "") -> str:
    toks = tokens_sql("text")
    tf_exprs = ", ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    n = "CAST(n_docs AS DOUBLE)"
    avgdl = f"(CAST(sum_dl AS DOUBLE) / {n})"
    score = _f(0.0)
    for i in range(len(terms)):
        tf = f"CAST(tf_{i} AS DOUBLE)"
        dfq = f"CAST(df_{i} AS DOUBLE)"
        idf = f"ln(((({n} - {dfq}) + {_f(0.5)}) / ({dfq} + {_f(0.5)})) + {_f(1.0)})"
        denom = (
            f"({tf} + ({_f(BM25_K1)} * ({_f(1.0 - BM25_B)} + "
            f"({_f(BM25_B)} * (CAST(dl AS DOUBLE) / {avgdl})))))"
        )
        score = f"({score} + ({idf} * (({tf} * {_f(BM25_K1 + 1.0)}) / {denom})))"
    tf_cols = ", ".join(f"tf_{i}" for i in range(len(terms)))
    # ln() differs by 1 ulp between JVM Math.log and DuckDB libm for some
    # inputs -> hash-compared bm25 is rounded to 6 dp in BOTH engines (repo
    # precedent for transcendental-tainted floats); ordering/filtering still
    # uses the raw score.
    body = f"""
    WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
    per_doc AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_exprs} FROM tk),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {df_exprs}
      FROM per_doc)
    SELECT doc_id, dl, {tf_cols}, {score} AS bm25_raw FROM per_doc, stats"""
    if topk is not None:
        return (
            f"SELECT doc_id, round(bm25_raw, 6) AS bm25 FROM ({body}) "
            f"WHERE bm25_raw > {_f(0.0)}{topk_where} "
            f"ORDER BY bm25_raw DESC, doc_id LIMIT {topk}"
        )
    tf_cols_o = ", ".join(f"tf_{i}" for i in range(len(terms)))
    return (
        f"SELECT doc_id, dl, {tf_cols_o}, round(bm25_raw, 6) AS bm25 "
        f"FROM ({body})" + (where or "")
    )


def _bm25_scores(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import retrieval

    out = retrieval.bm25_scores(
        _t(spark, sf, "documents"), BM25_TERMS, k1=BM25_K1, b=BM25_B
    )
    return out.withColumn("bm25", F.round("bm25", 6))


_register("text_bm25_scores", _bm25_scores, _bm25_sql(BM25_TERMS))


def _bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import retrieval

    out = retrieval.bm25_topk(
        _t(spark, sf, "documents"), BM25_TERMS, k=10, k1=BM25_K1, b=BM25_B
    )
    return out.withColumn("bm25", F.round("bm25", 6))


_register("text_bm25_topk", _bm25_topk, _bm25_sql(BM25_TERMS, topk=10))


def _hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import retrieval

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    text_side = (
        retrieval.bm25_scores(docs, BM25_TERMS, k1=BM25_K1, b=BM25_B)
        .where(F.col("bm25") > 0.0)
        .select("doc_id", "bm25")
    )
    vec_side = similarity.with_score(emb, QV_ZEBRA).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    return retrieval.rrf_fusion(text_side, vec_side, k=10, pool=50)


_register(
    "hybrid_rrf_topk",
    _hybrid_rrf,
    f"""
    WITH txt AS ({_bm25_sql(BM25_TERMS, topk=50)}),
    tr AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS t_rank
           FROM txt),
    vec AS (SELECT vec_id AS doc_id, {dot_sql('embedding', QV_ZEBRA)} AS score
            FROM embeddings ORDER BY score DESC, doc_id LIMIT 50),
    vr AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS v_rank
           FROM vec),
    fused AS (
      SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id, t_rank, v_rank,
             (COALESCE({_f(1.0)} / ({_f(60.0)} + CAST(t_rank AS DOUBLE)), {_f(0.0)})
              + COALESCE({_f(1.0)} / ({_f(60.0)} + CAST(v_rank AS DOUBLE)), {_f(0.0)})) AS rrf
      FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
    SELECT doc_id, t_rank, v_rank, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)


# ===========================================================================
# Benchmark-contamination n-gram overlap (operators/text_analysis.py)
# ===========================================================================

BENCH_SOURCES = ("src0", "src1")


def _contamination(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.ngram_contamination(
        _t(spark, sf, "documents"),
        F.col("source").isin(*BENCH_SOURCES),
        n=3,
    )


_BENCH_IN = "('" + "', '".join(BENCH_SOURCES) + "')"

_register(
    "text_ngram_contamination",
    _contamination,
    f"""
    WITH g AS (
      SELECT doc_id, source,
             list_distinct({word_ngrams_sql(tokens_sql('text'), 3)}) AS grams
      FROM documents),
    bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE source IN {_BENCH_IN}),
    cand AS (SELECT doc_id, grams FROM g WHERE source NOT IN {_BENCH_IN}),
    ex AS (SELECT doc_id, unnest(grams) AS gr FROM cand),
    hits AS (
      SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM ex JOIN bench ON ex.gr = bench.gr GROUP BY ex.doc_id),
    out AS (
      SELECT c.doc_id, CAST(len(c.grams) AS BIGINT) AS n_grams,
             COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit
      FROM cand c LEFT JOIN hits h ON c.doc_id = h.doc_id)
    SELECT doc_id, n_grams, n_hit,
           CASE WHEN n_grams = 0 THEN {_f(0.0)}
                ELSE CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) END AS contamination
    FROM out
    """,
)


# ===========================================================================
# Deterministic sampling / split family (operators/sampling.py)
# ===========================================================================

from ..operators import sampling  # noqa: E402


def _samp_hash_sql(salt: str, id_expr: str = "doc_id") -> str:
    """Twin of sampling._row_hash: salted md5-based hash in [0, 2^32).
    concat_ws has identical NULL-skipping semantics in both engines."""
    return hash32_sql(f"concat_ws('|', '{salt}', CAST({id_expr} AS VARCHAR))")


_register(
    "samp_hash_mod",
    lambda spark, sf: sampling.hash_mod_sample(
        _t(spark, sf, "documents"), "doc_id", denom=10, bucket=3
    ).select("doc_id", "lang"),
    f"SELECT doc_id, lang FROM documents WHERE {_samp_hash_sql('')} % 10 = 3",
)

SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_CASE = " ".join(
    f"WHEN {_samp_hash_sql('split')} < {hi} THEN '{name}'"
    for name, hi in sampling.split_bounds(SPLIT_WEIGHTS)[:-1]
)

_register(
    "samp_split_assign",
    lambda spark, sf: sampling.split_assign(
        _t(spark, sf, "documents"), "doc_id", SPLIT_WEIGHTS
    ).select("doc_id", "split"),
    f"""
    SELECT doc_id,
           CASE {_SPLIT_CASE}
                ELSE '{sampling.split_bounds(SPLIT_WEIGHTS)[-1][0]}' END AS split
    FROM documents
    """,
)

STRAT_RATES = {"en": 0.25, "zh": 0.5}
STRAT_DEFAULT = 0.75
_STRAT_CASE = " ".join(
    f"WHEN lang = '{cls}' THEN {int(rate * (1 << 32))}"
    # reversed: sampling.stratified_hash_sample nests WHENs so the LAST dict
    # entry is the outermost test — for distinct class literals any order
    # gives the same result, but mirror exactly anyway
    for cls, rate in reversed(list(STRAT_RATES.items()))
)

_register(
    "samp_stratified",
    lambda spark, sf: sampling.stratified_hash_sample(
        _t(spark, sf, "documents"), "doc_id", "lang", STRAT_RATES, STRAT_DEFAULT
    ).select("doc_id", "lang"),
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_samp_hash_sql('strat')}
          < (CASE {_STRAT_CASE} ELSE {int(STRAT_DEFAULT * (1 << 32))} END)
    """,
)

_register(
    "samp_per_class_cap",
    lambda spark, sf: sampling.per_class_cap(
        _t(spark, sf, "documents"), "lang", n=50, order_col="doc_id"
    ).select("doc_id", "lang"),
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents) WHERE rn <= 50
    """,
)

_register(
    "samp_training_shuffle",
    lambda spark, sf: sampling.training_shuffle(
        _t(spark, sf, "documents"), "doc_id", n_shards=8
    ).select("doc_id", "shard", "pos"),
    f"""
    WITH h AS (SELECT doc_id, {_samp_hash_sql('shuffle')} AS hh FROM documents)
    SELECT doc_id, CAST(hh % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh ASC, doc_id ASC) - 1
                AS BIGINT) AS pos
    FROM h
    """,
)


# ===========================================================================
# One-pass PCA family (operators/stats.py gramian/pca)
# ===========================================================================


def _gramian_rows_only(spark: SparkSession, sf: str) -> DataFrame:
    """Production Gramian: BLAS partials in mapInPandas (UDF ⇒ rows-only per
    the contract rules; exact-vs-numpy parity is pinned in tests/test_pca.py)."""
    return stats.gramian_long(_t(spark, sf, "embeddings")).select(
        "i", "j", F.round("g", 6).alias("g")
    )


_register("vec_gramian", _gramian_rows_only, None)


def _gramian_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Verification-grade Gramian twin: posexplode self-join with per-row
    products fixed to integer picounits (round-then-sum-BIGINT — the cents
    trick at 1e12 scale, exact in both engines; |x|<=1 and N*1e12 << 2^63).
    O(dim^2) row amplification — oracle duty only; the scale path is
    stats.gramian_long."""
    ex = (
        _t(spark, sf, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i", "x"))
        .select("vec_id", "i", F.col("x").cast("double").alias("x"))
    )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.sum(F.round(F.col("a.x") * F.col("b.x") * F.lit(1e12)).cast("long")).alias(
                "g_fix"
            )
        )
        .select(
            "i", "j", (F.col("g_fix").cast("double") / F.lit(1e12)).alias("g")
        )
    )


_register(
    "vec_gramian_exact",
    _gramian_exact,
    """
    WITH ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings)
    SELECT a.i AS i, b.i AS j,
           CAST(CAST(sum(CAST(round(a.x * b.x * CAST(1000000000000 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / CAST(1000000000000 AS DOUBLE) AS g
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)


def _pca_project_rows_only(spark: SparkSession, sf: str) -> DataFrame:
    """Fit on the corpus, project every row (UDF-fitted components ⇒
    rows-only; exact-vs-numpy parity in tests/test_pca.py). Rounded so the
    row-count/schema check is layout-stable."""
    emb = _t(spark, sf, "embeddings")
    comps, mean, _ = stats.pca_fit(emb, n_components=8)
    out = stats.pca_project(emb, comps, mean)
    # flattened to a joined string so the driver's canonicalizer (which
    # can't hash list cells) stays safe if this row rotates into its window
    return out.select(
        "vec_id",
        F.array_join(
            F.transform("pca", lambda x: F.format_string("%.6f", x)), ","
        ).alias("pca"),
    )


_register("vec_pca_project", _pca_project_rows_only, None)


