"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ..functions.localrel import values_df
from ._base import _f, _register, _t, _utc  # noqa: F401
from ._breadth1 import _samp_hash_sql, sampling  # noqa: F401
from ._dedup_text import (  # noqa: F401
    _LANG_CASE,
    _LANG_HITS,
    _MTL,
    _PUNCT_RATIO,
    _STOP_RATIO,
    _TOKS,
)
from ._events_d1 import SW  # noqa: F401
from ._vector import _IVF_CASE, _IVF_DOTS  # noqa: F401

# ===========================================================================
# BPE-style token counting + corpus cleaning composite
# ===========================================================================

_BPE_RE_SQL = TXT.BPE_PRETOKEN_RE.replace("'", "''")

_register(
    "text_bpe_token_count",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id",
        TXT.bpe_token_count(F.col("text")).cast("long").alias("n_bpe"),
        F.element_at(TXT.bpe_pretokens(F.col("text")), 1).alias("first_tok"),
    ),
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS BIGINT) AS n_bpe,
           regexp_extract_all(text, '{_BPE_RE_SQL}')[1] AS first_tok
    FROM documents
    """,
)


# BPE training: the one-pass pair statistics are oracle-exact; the full
# iterative merge loop (driver argmax per step) is rows-only per the
# contract's iterative-algorithm rule, pinned instead by the pure-Python
# reference-parity tests in tests/test_corpus.py.


def _bpe_pair_counts_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import corpus

    wf = corpus.bpe_word_freqs(_t(spark, sf, "documents"))
    return corpus.bpe_pair_counts(wf)


_register(
    "text_bpe_pair_counts",
    _bpe_pair_counts_query,
    f"""
    WITH w AS (SELECT unnest(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS word
               FROM documents),
    wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY word),
    s AS (SELECT freq, regexp_extract_all(word, '(?s).') AS cs FROM wf),
    p AS (SELECT freq,
                 unnest(list_slice(cs, 1, len(cs) - 1)) AS a,
                 unnest(list_slice(cs, 2, len(cs))) AS b
          FROM s WHERE len(cs) >= 2)
    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_freq FROM p GROUP BY a, b
    """,
)


def _bpe_train_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import corpus

    merges, _ = corpus.bpe_train(
        _t(spark, sf, "documents"), n_merges=8, min_pair_freq=2
    )
    return values_df(
        spark, [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, a string, b string"
    )


_register("text_bpe_train_merges", _bpe_train_query, None)


def _clean_corpus_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.clean_corpus(
        _t(spark, sf, "documents"),
        min_tokens=5,
        max_punct_ratio=0.2,
        min_quality=0.3,
        langs=("en", "de", "fr"),
    ).select("doc_id", "n_tokens", "punct_ratio", "quality", "lang_pred")


_register(
    "text_clean_corpus",
    _clean_corpus_query,
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             {_PUNCT_RATIO} AS punct_ratio,
             ((1.0 - least(abs(({_MTL}) - 5.0) / 5.0, 1.0))
              + least(({_STOP_RATIO}) * 10.0, 1.0)
              + (1.0 - least(({_PUNCT_RATIO}) * 5.0, 1.0))) / 3.0 AS quality,
             {', '.join(f'{expr} AS h_{lang}' for lang, expr in _LANG_HITS.items())}
      FROM documents)
    SELECT doc_id, n_tokens, punct_ratio, quality, {_LANG_CASE} AS lang_pred
    FROM m
    WHERE n_tokens >= 5 AND punct_ratio <= {_f(0.2)} AND quality >= {_f(0.3)}
      AND ({_LANG_CASE}) IN ('en', 'de', 'fr')
    """,
)


def _quality_clf_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.classifier_quality_score(
        _t(spark, sf, "documents"), threshold=0.0
    )


def _quality_clf_sql() -> str:
    from ..operators.text_analysis import QUALITY_CLF_BIAS, QUALITY_CLF_WEIGHTS as W

    # left-assoc chain in the same fixed feature order as the Spark column
    score = (
        f"{_f(QUALITY_CLF_BIAS)}"
        f" + {_f(W['log_tokens'])} * ln(1.0 + CAST(len({_TOKS}) AS DOUBLE))"
        f" + {_f(W['mean_token_len'])} * ({_MTL})"
        f" + {_f(W['stopword_ratio'])} * ({_STOP_RATIO})"
        f" + {_f(W['punct_ratio'])} * ({_PUNCT_RATIO})"
    )
    return f"""
    SELECT doc_id,
           CAST(round(({score}) * 1000000.0) AS BIGINT) AS score_micros,
           CAST(round(({score}) * 1000000.0) AS BIGINT) > 0 AS keep
    FROM documents
    """


_register("text_quality_classifier", _quality_clf_query, _quality_clf_sql())


def _cluster_topics_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import corpus

    return corpus.cluster_topic_terms(
        _t(spark, sf, "documents"), _t(spark, sf, "embeddings"), CENTROIDS, k_terms=5
    ).select(
        F.col("ivf_cell").cast("long").alias("ivf_cell"),
        F.col("rank").cast("long").alias("rank"),
        "token",
        F.col("cnt").cast("long").alias("cnt"),
    )


_STOPWORDS_TUPLE = "(" + ", ".join(f"'{w}'" for w in sorted(TXT.STOPWORDS)) + ")"

_register(
    "text_cluster_topics",
    _cluster_topics_query,
    f"""
    WITH d AS (SELECT vec_id, {_IVF_DOTS} FROM embeddings),
    a AS (SELECT vec_id, {_IVF_CASE} AS cell FROM d),
    t AS (SELECT a.cell, unnest({_TOKS}) AS token
          FROM documents JOIN a ON documents.doc_id = a.vec_id),
    c AS (SELECT cell, token, CAST(count(*) AS BIGINT) AS cnt
          FROM t WHERE token NOT IN {_STOPWORDS_TUPLE}
          GROUP BY cell, token),
    r AS (SELECT cell, token, cnt,
                 row_number() OVER (PARTITION BY cell ORDER BY cnt DESC, token ASC) AS rnk
          FROM c)
    SELECT CAST(cell AS BIGINT) AS ivf_cell, CAST(rnk AS BIGINT) AS rank, token, cnt
    FROM r WHERE rnk <= 5
    """,
)


def _pca_coarse_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    """Coarse-to-fine search over the PCA index (runtime-fitted components ⇒
    rows-only; exact-score + recall proof in tests/test_pca.py)."""
    emb = _t(spark, sf, "embeddings")
    comps, mean, _ = stats.pca_fit(emb, n_components=16)
    indexed = stats.pca_project(emb, comps, mean)
    out = ann.pca_coarse_topk(indexed, QV_ZEBRA, comps, mean, k=10, shortlist=100)
    return out.select("vec_id", F.round("score", 6).alias("score"))


_register("ann_pca_coarse_topk", _pca_coarse_topk_query, None)


def _ev_enriched_nation(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming import windows as SW

    return SW.enriched_nation_counts(
        _t(spark, sf, "events"), _t(spark, sf, "customer")
    )


_register(
    "ev_enriched_nation_counts",
    _ev_enriched_nation,
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)


def _video_frames_query(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling plumbing over synthetic binary (text bytes as stand-in
    video payloads; codec boundary is stubbed ⇒ rows-only). Frame bytes are
    hex-encoded so the row check is schema-stable."""
    from ..operators import multimodal

    vids = _t(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    out = multimodal.sample_video_frames(vids, max_frames=4, every_ms=500)
    return out.select("video_id", "frame_idx", "frame_ts_ms", F.hex("frame").alias("frame_hex"))


_register("d2_video_frame_sample", _video_frames_query, None)


def _audio_features_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import multimodal

    clips = _t(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    out = multimodal.audio_features(clips, n_mels=12)
    # joined string (not array) — keeps the driver's canonicalizer safe
    return out.select(
        "doc_id",
        F.array_join(
            F.transform("audio_feats", lambda x: F.format_string("%.6f", x)), ","
        ).alias("audio_feats"),
    )


_register("d2_audio_features", _audio_features_query, None)


def _length_trim_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.length_outlier_filter(
        _t(spark, sf, "documents"), "n_chars", 0.05, 0.95
    ).select("doc_id", "n_chars")


_register(
    "text_length_outlier_trim",
    _length_trim_query,
    """
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars BETWEEN (SELECT quantile_cont(n_chars, 0.05) FROM documents)
                      AND (SELECT quantile_cont(n_chars, 0.95) FROM documents)
    """,
)


def _salted_join_query(spark: SparkSession, sf: str) -> DataFrame:
    """Salted-join result == plain-join result: the oracle is the UNSALTED
    SQL join, proving the salt/replicate rewrite is semantics-preserving."""
    from ..operators import skew

    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    # rename: orders joins customer on o_custkey == c_custkey
    return (
        skew.salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            customer,
            "c_custkey",
            salt_buckets=8,
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents_col(F.col("o_totalprice"))).cast("long").alias("total_cents"),
        )
    )


_register(
    "rel_salted_skew_join",
    _salted_join_query,
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)


# ===========================================================================
# Pivot + per-group percentile (relational substrate widening)
# ===========================================================================

_EVENT_TYPES = ("click", "view", "purchase")


def _pivot_query(spark: SparkSession, sf: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list (the at-scale form: an
    implicit pivot runs an extra distinct scan to discover values)."""
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
        )
    )


_register(
    "rel_pivot_event_counts",
    _pivot_query,
    f"""
    SELECT user_id,
           {', '.join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)

_register(
    "rel_percentile_by_group",
    lambda spark, sf: _t(spark, sf, "documents")
    .groupBy("lang")
    .agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
    ),
    """
    SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
           quantile_cont(n_chars, 0.9) AS p90
    FROM documents GROUP BY lang
    """,
)


# ===========================================================================
# Pure-SQL surface: the engine is equally drivable through spark.sql(...)
# ===========================================================================

_Q3_BODY = """
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           {ts_expr} AS orderdate_us
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
"""


def _sql_q3_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority query submitted as SQL TEXT — the
    same engine surface as the DataFrame rows (identical Catalyst plan), and
    the same determinism rules (cents, unix micros). Proves a reference user
    can drive this engine with plain SQL."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(
        _Q3_BODY.format(ts_expr="unix_micros(CAST(o.o_orderdate AS TIMESTAMP))")
    )


_register(
    "sql_q3_shipping_priority",
    _sql_q3_query,
    _Q3_BODY.format(ts_expr="epoch_us(o.o_orderdate)"),
)


# Q6-style forecasting-revenue scan: the pushdown showcase — every predicate
# reaches the parquet reader (PushedFilters on l_shipdate/l_discount/
# l_quantity), the aggregate is a zero-group partial agg, and the identical
# SQL text runs on both engines (integer cents; no timestamps in the output).
_Q6_BODY = """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST('0.05' AS DOUBLE)
      AND l_discount <= CAST('0.07' AS DOUBLE)
      AND l_quantity < 24
"""


def _sql_q6_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q6_BODY)


_register("sql_q6_forecast_revenue", _sql_q6_query, _Q6_BODY)


# Q14-style promo-revenue share: lineitem x part join where the part side
# broadcasts; the share is derived from the two order-free integer-cents
# sums, so the double division is bit-identical across engines.
_Q14_BODY = """
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(round(CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) * 1000000.0
                 / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE))
             AS BIGINT) AS promo_share_micros
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def _sql_q14_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q14_BODY)


_register("sql_q14_promo_share", _sql_q14_query, _Q14_BODY)


# Q5-style local-supplier-volume: the six-way join classic — region filter
# prunes to one region, nation/region/supplier broadcast, the big
# lineitem x orders join shuffles once on orderkey, and the
# customer-and-supplier-in-same-nation condition rides the join. Integer
# cents keep the revenue sum order-free.
_Q5_BODY = """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
"""


def _sql_q5_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q5_BODY)


_register("sql_q5_local_supplier_volume", _sql_q5_query, _Q5_BODY)


# Q10-style returned-items ranking: which customers returned the most
# revenue — lineitem filtered to returns, one shuffle join to orders,
# broadcast joins to customer/nation, top-20 by revenue with a total
# order (revenue DESC, custkey ASC) so the cut is deterministic.
_Q10_BODY = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey ASC
    LIMIT 20
"""


def _sql_q10_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q10_BODY)


_register("sql_q10_returned_items", _sql_q10_query, _Q10_BODY)


# Q18-style large-volume orders: the HAVING-on-aggregate + semi-join
# pattern — aggregate lineitem per order, keep orders whose total quantity
# clears the threshold, then enrich with customer and order columns. The
# quantity fixture is DOUBLE but holds integers; round-to-bigint keeps the
# sum and threshold order-free and engine-exact.
_Q18_BODY = """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 120
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, big.total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
"""


def _sql_q18_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q18_BODY)


_register("sql_q18_large_orders", _sql_q18_query, _Q18_BODY)


# ===========================================================================
# PII redaction + repetition filter (training-data compliance/cleaning)
# ===========================================================================


def _pii_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.redact_pii(_t(spark, sf, "documents"))


def _pii_sql() -> str:
    from ..operators.text_analysis import PII_PATTERNS

    red = "text"
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{p}', '{repl}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return f"SELECT doc_id, {red} AS redacted, {counts} FROM documents"


_register("text_pii_redaction", _pii_query, _pii_sql())

def _repetition_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.repetition_filter(
        _t(spark, sf, "documents"), max_repetition=0.5
    ).select("doc_id", F.round("repetition", 6).alias("repetition"))


_register(
    "text_repetition_filter",
    _repetition_query,
    f"""
    SELECT doc_id, round(1.0 - CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                             / CAST(len({_TOKS}) AS DOUBLE), 6) AS repetition
    FROM documents
    WHERE 1.0 - CAST(len(list_distinct({_TOKS})) AS DOUBLE)
              / CAST(len({_TOKS}) AS DOUBLE) <= {_f(0.5)}
    """,
)


def _curate_corpus_query(spark: SparkSession, sf: str) -> DataFrame:
    """Full corpus-curation composite (clean → trim → de-spam → redact →
    fuzzy-dedup → split). Contains the iterative connected-components stage
    ⇒ rows-only; every individual stage has its own oracle-exact row, and
    the end-to-end invariants (no residual near-dups, PII gone, split
    totality) are pinned in tests/test_pipelines.py."""
    from .. import pipelines

    return pipelines.curate_corpus(_t(spark, sf, "documents")).select(
        "doc_id", "lang_pred", F.round("quality", 6).alias("quality"), "n_tokens", "split"
    )


_register("pipeline_curate_corpus", _curate_corpus_query, None)


# ===========================================================================
# Document chunking (fixed token windows with stride)
# ===========================================================================

_CHUNK, _STRIDE = 16, 8


def _chunk_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    return text_analysis.chunk_documents(
        _t(spark, sf, "documents"), chunk_tokens=_CHUNK, stride=_STRIDE
    )


_register(
    "text_chunk_documents",
    _chunk_query,
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_STRIDE}) AS BIGINT)))
               AS chunk_idx
      FROM t WHERE len(toks) > 0)
    SELECT doc_id, chunk_idx,
           array_to_string(toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}], ' ')
             AS chunk_text,
           CAST(len(toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}]) AS BIGINT)
             AS n_chunk_tokens
    FROM c
    """,
)


def _pack_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import text_analysis

    chunks = text_analysis.chunk_documents(
        _t(spark, sf, "documents"), chunk_tokens=_CHUNK, stride=_STRIDE
    )
    packed = text_analysis.pack_sequences(chunks, budget_tokens=128, buckets=4)
    # Driver's pandas canonicalizer can't hash list cells — flatten the
    # manifest's doc_ids to a joined string at the contract boundary only
    # (the operator keeps its natural array<bigint> API).
    return packed.withColumn("doc_ids", F.array_join("doc_ids", ","))


_register(
    "text_pack_sequences",
    _pack_query,
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_STRIDE}) AS BIGINT)))
               AS chunk_idx
      FROM t WHERE len(toks) > 0),
    ch AS (
      SELECT doc_id, chunk_idx,
             CAST(len(toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}]) AS BIGINT)
               AS n_chunk_tokens,
             {hash32_sql('CAST(doc_id AS VARCHAR)')} % 4 AS bucket
      FROM c),
    p AS (
      SELECT bucket, doc_id, n_chunk_tokens,
             CAST(floor(COALESCE(sum(n_chunk_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 128.0)
               AS BIGINT) AS seq_id
      FROM ch)
    SELECT bucket, seq_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
           array_to_string(list_sort(list_distinct(list(doc_id))), ',') AS doc_ids
    FROM p GROUP BY bucket, seq_id
    """,
)


def _click_view_join_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming import windows as SW

    ev = _t(spark, sf, "events")
    return SW.click_view_interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "view"),
        max_delay="6 hours",
    )


_register(
    "ev_click_view_interval_join",
    _click_view_join_query,
    """
    SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
           epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL 6 HOUR
    """,
)


# ===========================================================================
# URL canonicalization + per-host rollup (web-crawl hygiene)
# ===========================================================================

# deterministic synthetic URL per doc (the fixtures carry no URL column):
# scheme case, tracking params, and fragments vary with doc_id so the
# canonicalizer has real work on every row class
_URL_EXPR_SPARK = (
    "concat(CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'https://' END, "
    "source, '.Example.com/', lang, '/', CAST(doc_id AS STRING), "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&id=7' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)
_URL_EXPR_DUCK = _URL_EXPR_SPARK.replace(" AS STRING", " AS VARCHAR")


def _url_canon_query(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id",
        TXT.url_host(F.expr(_URL_EXPR_SPARK)).alias("host"),
        TXT.canonical_url(F.expr(_URL_EXPR_SPARK)).alias("canonical"),
    )


_TRACK_SQL = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&?"

_register(
    "text_url_canonicalize",
    _url_canon_query,
    f"""
    WITH raw AS (SELECT doc_id, {_URL_EXPR_DUCK} AS url FROM documents),
    s AS (SELECT doc_id, url,
                 regexp_replace(regexp_replace(regexp_replace(url, '#.*$', ''),
                                '{_TRACK_SQL}', '', 'g'), '[?&]$', '') AS u
          FROM raw)
    SELECT doc_id,
           lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)) AS host,
           CASE WHEN regexp_extract(u, '^([a-zA-Z]+://[^/]*)', 1) = '' THEN u
                ELSE lower(regexp_extract(u, '^([a-zA-Z]+://[^/]*)', 1))
                     || regexp_replace(u, '^[a-zA-Z]+://[^/]*', '') END AS canonical
    FROM s
    """,
)


# ===========================================================================
# corpus-curation family (operators/corpus.py) + SemDeDup (operators/dedup.py)
# ===========================================================================

import math  # noqa: E402

from ..operators import corpus  # noqa: E402

_register(
    "text_token_topk",
    lambda spark, sf: corpus.token_topk(_t(spark, sf, "documents"), k=20),
    f"""
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_TOKS}) AS token FROM documents)
    GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
)


# Count-Min sketch over the token stream: the bounded-memory frequency tier
# (the summary that replaces the exact count table when the key domain —
# URLs, n-grams, pairs — outgrows a vocab). Deterministic md5 hash family
# makes the SKETCH itself oracle-exact, not just its estimates.

_CMS_DEPTH, _CMS_WIDTH = 4, 512


def _cms_cell_sql(d: int, key: str = "token") -> str:
    inner = f"concat_ws('|', 'cms{d}', {key})"
    return f"({hash32_sql(inner)}) % {_CMS_WIDTH}"


_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT CAST({d} AS BIGINT) AS d, CAST({_cms_cell_sql(d)} AS BIGINT) AS bucket "
    f"FROM toks"
    for d in range(_CMS_DEPTH)
)


def _cms_build_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import sketches

    toks = _t(spark, sf, "documents").select(
        F.explode(TXT.tokens(F.col("text"))).alias("token")
    )
    return sketches.cms_build(toks, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH)


_register(
    "sketch_cms_table",
    _cms_build_query,
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
    cells AS ({_CMS_CELLS_SQL})
    SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM cells GROUP BY d, bucket
    """,
)


def _cms_estimate_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import corpus, sketches

    docs = _t(spark, sf, "documents")
    toks = docs.select(F.explode(TXT.tokens(F.col("text"))).alias("token"))
    sketch = sketches.cms_build(toks, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    top = corpus.token_topk(docs, k=20).select("token")
    return sketches.cms_estimate(
        sketch, top, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )


_register(
    "sketch_cms_estimates",
    _cms_estimate_query,
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
    top AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks
            GROUP BY token ORDER BY cnt DESC, token LIMIT 20),
    cells AS ({_CMS_CELLS_SQL}),
    sk AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM cells GROUP BY d, bucket),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT token, CAST({d} AS BIGINT) AS d, "
        f"CAST({_cms_cell_sql(d)} AS BIGINT) AS bucket FROM top"
        for d in range(_CMS_DEPTH)
      )}
    )
    SELECT probes.token, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est
    FROM probes LEFT JOIN sk ON probes.d = sk.d AND probes.bucket = sk.bucket
    GROUP BY probes.token
    """,
)

_QUALITY_SQL = (
    f"((1.0 - least(abs(({_MTL}) - 5.0) / 5.0, 1.0))"
    f" + least(({_STOP_RATIO}) * 10.0, 1.0)"
    f" + (1.0 - least(({_PUNCT_RATIO}) * 5.0, 1.0))) / 3.0"
)

_register(
    "text_source_stats",
    lambda spark, sf: corpus.source_stats(_t(spark, sf, "documents")),
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(round(({_QUALITY_SQL}) * 1000000) AS BIGINT)) AS BIGINT)
             AS quality_micros
    FROM documents GROUP BY source
    """,
)

# bigram twin: range(1, len(t)) is empty for len < 2, matching doc_bigrams
_BIGRAMS_SQL = "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])"

_register(
    "text_bigram_lm_score",
    lambda spark, sf: corpus.bigram_lm_score(_t(spark, sf, "documents"), alpha=1.0),
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bi AS (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bigram FROM base),
    bc AS (SELECT bigram, count(*) AS cb FROM bi GROUP BY bigram),
    uni AS (SELECT unnest(t) AS w FROM base),
    uc AS (SELECT w, count(*) AS cu FROM uni GROUP BY w),
    v AS (SELECT count(*) AS vs FROM uc)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(round(
             ln((cb + {_f(1.0)}) / (cu + {_f(1.0)} * vs)) * 1000000
           ) AS BIGINT)) AS BIGINT) AS lm_micronats
    FROM bi
    JOIN bc USING (bigram)
    JOIN uc ON split_part(bigram, ' ', 1) = uc.w
    CROSS JOIN v
    GROUP BY doc_id
    """,
)

_NCH10 = "((len(t) + 9) // 10)"
_CHUNKS10 = (
    f"list_transform(range(0, {_NCH10}), "
    "i -> array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' '))"
)

_register(
    "text_strip_dup_spans",
    lambda spark, sf: corpus.strip_duplicate_spans(
        _t(spark, sf, "documents"), span=10, min_count=2
    ),
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    chunks AS (SELECT doc_id, unnest(range(0, {_NCH10})) AS pos,
                      unnest({_CHUNKS10}) AS chunk FROM base),
    block AS (SELECT chunk FROM chunks GROUP BY chunk HAVING count(*) >= 2),
    kept AS (SELECT doc_id, pos, chunk FROM chunks
             WHERE NOT EXISTS (SELECT 1 FROM block WHERE block.chunk = chunks.chunk)),
    re AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text
           FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(re.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN re USING (doc_id)
    """,
)

MIX_FACTORS = {"en": 2.5, "zh": 0.25}
MIX_DEFAULT = 1.0


def _mix_case(val_fn) -> str:
    branches = " ".join(
        f"WHEN lang = '{cls}' THEN {val_fn(float(fac))}"
        for cls, fac in MIX_FACTORS.items()
    )
    return f"(CASE {branches} ELSE {val_fn(MIX_DEFAULT)} END)"


_MIX_BASE = _mix_case(lambda fc: int(math.floor(fc)))
_MIX_THR = _mix_case(lambda fc: int((fc - math.floor(fc)) * (1 << 32)))

_register(
    "samp_weighted_mixture",
    lambda spark, sf: corpus.weighted_mixture(
        _t(spark, sf, "documents"), "doc_id", "lang", MIX_FACTORS, MIX_DEFAULT
    ).select("doc_id", "lang", F.col("copy").cast("long").alias("copy")),
    f"""
    WITH n AS (SELECT doc_id, lang,
                      {_MIX_BASE}
                      + (CASE WHEN {_samp_hash_sql('mix')} < {_MIX_THR}
                              THEN 1 ELSE 0 END) AS nc
               FROM documents)
    SELECT doc_id, lang, unnest(range(0, nc)) AS copy FROM n
    """,
)

def _graph_pagerank_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (operators/
    graph.pagerank): the link-graph quality-prior shape for web-corpus
    curation, exercised on the fixture's orders×lineitem edges. Rows-only
    (iterative float propagation per contract rules); exactness vs a
    dense NumPy reference is pinned in tests/test_graph.py."""
    from ..operators import graph

    orders = _t(spark, sf, "orders")
    lineitem = _t(spark, sf, "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("c"), "o_custkey").alias("src"),
        F.concat(F.lit("s"), "l_suppkey").alias("dst"),
    )
    return (
        graph.pagerank(edges, iters=6)
        .select("node", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(50)
    )


_register("graph_pagerank_suppliers", _graph_pagerank_suppliers, None)


_register(
    "samp_temperature_mixture",
    lambda spark, sf: sampling.temperature_mixture_sample(
        _t(spark, sf, "documents"), "doc_id", "lang", target_total=200
    ).select("doc_id", "lang"),
    f"""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_d
               FROM documents GROUP BY lang),
    w AS (SELECT lang, n_d,
                 CAST(floor(sqrt(CAST(n_d AS DOUBLE))) AS BIGINT) AS w_d
          FROM c),
    s AS (SELECT CAST(sum(w_d) AS BIGINT) AS s_w FROM w),
    t AS (SELECT lang,
                 least(CAST(floor(CAST(w_d AS DOUBLE) * 200.0
                        / (CAST(s_w AS DOUBLE) * CAST(n_d AS DOUBLE))
                        * 4294967296.0) AS BIGINT),
                       4294967296) AS thr
          FROM w, s)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN t USING (lang)
    WHERE {_samp_hash_sql('temp')} < t.thr
    """,
)

_register(
    "dedup_semantic_semdedup",
    # threshold 0.4 (not the production-ish 0.95): the synthetic fixture has
    # no true near-dups, and the oracle must exercise the drop path
    lambda spark, sf: dedup.semantic_dedup(
        _t(spark, sf, "embeddings"), CENTROIDS, threshold=0.4
    ).select("vec_id", F.col("ivf_cell").cast("long").alias("ivf_cell")),
    f"""
    WITH d AS (SELECT vec_id, embedding, {_IVF_DOTS} FROM embeddings),
    a AS (SELECT vec_id, embedding, {_IVF_CASE} AS cell FROM d)
    SELECT x.vec_id, CAST(x.cell AS BIGINT) AS ivf_cell
    FROM a x
    WHERE NOT EXISTS (
      SELECT 1 FROM a y
      WHERE y.cell = x.cell AND y.vec_id < x.vec_id
        AND {dot2_sql('x.embedding', 'y.embedding')} >= {_f(0.4)})
    """,
)


