"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ..functions.localrel import values_df
from ._base import _ORACLES, _register, _t, _utc  # noqa: F401
from ._breadth1 import (  # noqa: F401
    SPLIT_WEIGHTS,
    _SPLIT_CASE,
    _samp_hash_sql,
    sampling,
)
from ._breadth3 import EV  # noqa: F401
from ._events_d1 import SW  # noqa: F401
from ._vector import _IVF_CASE, _IVF_DOTS  # noqa: F401

# ===========================================================================
# round-3 additions: SQL-pattern sessionization, fixed-k sampling, RFM
# features, window-function breadth
# ===========================================================================


def _ev_gap_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap sessionization as portable window SQL (events.gap_sessionize) —
    the cross-engine-checkable twin of the native session_window agg."""
    _utc(spark)
    return EV.gap_sessionize(_t(spark, sf, "events"), gap_minutes=30)


_register(
    "ev_gap_sessionize",
    _ev_gap_sessionize,
    """
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(us) AS start_us, MAX(us) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY 1, 2
    """,
)


_register(
    "samp_fixed_k",
    lambda spark, sf: sampling.fixed_k_sample(
        _t(spark, sf, "documents").select("doc_id", "lang"), "doc_id", k=100
    ),
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang, {_samp_hash_sql('resv')} AS h FROM documents
      ORDER BY h, doc_id LIMIT 100)
    """,
)


def _samp_weighted_fixed_k(spark: SparkSession, sf: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): exactly 100 docs weighted by
    text length, with the unbiased subset-sum estimator column. The priority
    key is integer-inputs + one IEEE division, so both engines compute
    bit-identical doubles (see operators/sampling.py docstring)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.greatest(F.length("text"), F.lit(1)).cast("long").alias("weight"),
    )
    return sampling.weighted_fixed_k_sample(docs, "doc_id", "weight", k=100)


_register(
    "samp_weighted_fixed_k",
    _samp_weighted_fixed_k,
    f"""
    WITH b AS (
      SELECT doc_id,
             CAST(greatest(length(text), 1) AS BIGINT) AS weight,
             {_samp_hash_sql('wresv')} + 1 AS h1
      FROM documents),
    q AS (
      SELECT doc_id, weight,
             (CAST(weight AS DOUBLE) * 4294967296.0) / CAST(h1 AS DOUBLE) AS q
      FROM b WHERE weight > 0
      ORDER BY q DESC, doc_id LIMIT 101),
    r AS (
      SELECT doc_id, weight, q,
             row_number() OVER (ORDER BY q DESC, doc_id) AS rn
      FROM q),
    t AS (SELECT coalesce(max(CASE WHEN rn = 101 THEN q END), 0.0) AS tau
          FROM r)
    SELECT doc_id, weight, greatest(CAST(weight AS DOUBLE), tau) AS est_weight
    FROM r, t WHERE rn <= 100
    """,
)


def _bloom_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-pruned EXACT anti-join (operators/sketches.py): the incremental
    -skip pattern when the key set outgrows the broadcast threshold. The
    Bloom routes rows (definitive "no" skips the shuffle; "maybe" is
    re-checked by the real anti-join), so the result — and the oracle — is
    the plain anti-join."""
    from ..operators import sketches

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    urgent = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return sketches.bloom_prune_anti_join(li, urgent, "l_orderkey", "o_orderkey")


_register(
    "rel_bloom_pruned_anti_join",
    _bloom_anti_join,
    """
    SELECT l_orderkey, l_linenumber FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT')
    """,
)


def _hist_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable equi-width histogram sketch (operators/sketches.py): built
    PER SHARD (l_returnflag), merged by cell-wise addition, then quantiled —
    the oracle computes the global histogram directly, so a hash match also
    proves merge == global. Counts are exact integers; interpolation is
    fixed-order double math over them (bit-identical cross-engine)."""
    from ..operators import sketches

    li = _t(spark, sf, "lineitem")
    shards = sketches.histogram_build(
        li, "l_extendedprice", lo=0.0, hi=110000.0, n_bins=64,
        shard_cols=["l_returnflag"],
    )
    merged = sketches.histogram_merge(shards)
    return sketches.histogram_quantiles(
        merged, [0.5, 0.9, 0.99], lo=0.0, hi=110000.0, n_bins=64
    )


_register(
    "sketch_histogram_quantiles",
    _hist_quantiles,
    """
    WITH h AS (
      SELECT CAST(least(63, greatest(0, CAST(floor(
               ((CAST(l_extendedprice AS DOUBLE) - 0.0) * 64.0) / 110000.0
             ) AS INT))) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
    c AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS n
      FROM h),
    p AS (
      SELECT q, bin, cnt, cum, n,
             row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
      FROM c CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q)
      WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
    SELECT q,
           0.0 + CAST(bin AS DOUBLE) * 1718.75
               + ((q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                  / CAST(cnt AS DOUBLE)) * 1718.75 AS est
    FROM p WHERE rn = 1
    """,
)


def _samp_weighted_per_class(spark: SparkSession, sf: str) -> DataFrame:
    """Per-class priority sampling: 20 docs per language, weighted by text
    length, with per-class subset-sum estimators."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang",
        F.greatest(F.length("text"), F.lit(1)).cast("long").alias("weight"),
    )
    return sampling.weighted_per_class_fixed_k(
        docs, "doc_id", "weight", "lang", k=20
    )


_register(
    "samp_weighted_per_class_k",
    _samp_weighted_per_class,
    f"""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(greatest(length(text), 1) AS BIGINT) AS weight,
             {_samp_hash_sql('wresv')} + 1 AS h1
      FROM documents),
    q AS (
      SELECT doc_id, lang, weight,
             (CAST(weight AS DOUBLE) * 4294967296.0) / CAST(h1 AS DOUBLE) AS q
      FROM b WHERE weight > 0),
    r AS (
      SELECT doc_id, lang, weight, q,
             row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id)
               AS rn
      FROM q),
    t AS (
      SELECT lang,
             coalesce(max(CASE WHEN rn = 21 THEN q END), 0.0) AS tau
      FROM r GROUP BY lang)
    SELECT r.lang, doc_id, weight,
           greatest(CAST(weight AS DOUBLE), tau) AS est_weight
    FROM r JOIN t ON r.lang = t.lang WHERE rn <= 20
    """,
)


def _hist_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-drift report between two snapshots (even/odd doc halves
    as proxies): per-bin counts + total-variation distance in integer
    cross-multiplied fixed point (reorder-free, so the sum — not just each
    term — is bit-identical cross-engine)."""
    from ..operators import sketches

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.length("text").cast("double").alias("v")
    )
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    return sketches.histogram_drift(old, new, "v", lo=0.0, hi=1000.0, n_bins=32)


_register(
    "sketch_histogram_drift",
    _hist_drift,
    """
    WITH b AS (
      SELECT doc_id,
             CAST(least(31, greatest(0, CAST(floor(
               ((CAST(length(text) AS DOUBLE) - 0.0) * 32.0) / 1000.0
             ) AS INT))) AS BIGINT) AS bin
      FROM documents WHERE length(text) IS NOT NULL),
    o AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt_old
          FROM b WHERE doc_id % 2 = 0 GROUP BY 1),
    n AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt_new
          FROM b WHERE doc_id % 2 = 1 GROUP BY 1),
    j AS (
      SELECT coalesce(o.bin, n.bin) AS bin,
             coalesce(cnt_old, 0) AS cnt_old,
             coalesce(cnt_new, 0) AS cnt_new
      FROM o FULL JOIN n ON o.bin = n.bin),
    t1 AS (
      SELECT bin, cnt_old, cnt_new,
             sum(cnt_old) OVER () AS n_old, sum(cnt_new) OVER () AS n_new
      FROM j),
    t2 AS (
      SELECT *,
             sum(abs(cnt_old * n_new - cnt_new * n_old)) OVER () AS tv_num
      FROM t1)
    SELECT bin, cnt_old, cnt_new,
           -- DuckDB evaluates sum(BIGINT) OVER () as HUGEINT, which pandas
           -- materializes as float64 and breaks the driver's dtype-sensitive
           -- hash vs Spark's int64; both values fit int64 at any fixture SF.
           CAST(tv_num AS BIGINT) AS tv_num,
           CAST(2 * n_old * n_new AS BIGINT) AS tv_den,
           CAST(tv_num AS DOUBLE) / CAST(2 * n_old * n_new AS DOUBLE)
             AS tv_distance
    FROM t2
    """,
)


def _hist_quantiles_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language text-length quantiles from per-language histogram
    sketches (operators/sketches.histogram_quantiles_by_group) — windows
    run over (langs x bins) sketch rows, never the corpus."""
    from ..operators import sketches

    docs = _t(spark, sf, "documents").select(
        "lang", F.length("text").cast("double").alias("v")
    )
    hist = sketches.histogram_build(docs, "v", 0.0, 1000.0, 32,
                                    shard_cols=["lang"])
    return sketches.histogram_quantiles_by_group(
        hist, [0.5, 0.9], 0.0, 1000.0, 32, group_cols=["lang"]
    )


_register(
    "sketch_histogram_quantiles_by_lang",
    _hist_quantiles_by_lang,
    """
    WITH h AS (
      SELECT lang,
             CAST(least(31, greatest(0, CAST(floor(
               ((CAST(length(text) AS DOUBLE) - 0.0) * 32.0) / 1000.0
             ) AS INT))) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents WHERE length(text) IS NOT NULL GROUP BY 1, 2),
    c AS (
      SELECT lang, bin, cnt,
             sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY lang) AS n
      FROM h),
    p AS (
      SELECT lang, q, bin, cnt, cum, n,
             row_number() OVER (PARTITION BY lang, q ORDER BY bin) AS rn
      FROM c CROSS JOIN (SELECT unnest([0.5, 0.9]) AS q)
      WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
    SELECT lang, q,
           0.0 + CAST(bin AS DOUBLE) * 31.25
               + ((q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                  / CAST(cnt AS DOUBLE)) * 31.25 AS est
    FROM p WHERE rn = 1
    """,
)


def _ev_half_life_popularity(spark: SparkSession, sf: str) -> DataFrame:
    """Recency-weighted popularity per event_type with power-of-two decay
    (operators/events.half_life_popularity): integer-exact, reorder-free,
    mergeable across shards at the same reference time."""
    _utc(spark)
    return EV.half_life_popularity(
        _t(spark, sf, "events"), key_col="event_type", half_life_hours=168
    )


_register(
    "ev_half_life_popularity",
    _ev_half_life_popularity,
    """
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    m AS (SELECT max(epoch_us(ts)) AS corpus_max_us FROM e),
    aged AS (
      SELECT event_type,
             least(30, (corpus_max_us - epoch_us(ts)) // 604800000000)
               AS bucket
      FROM e, m),
    s AS (
      SELECT event_type,
             CAST(sum(CAST(1 AS BIGINT) << CAST(30 - bucket AS INT))
                  AS BIGINT) AS score_scaled
      FROM aged GROUP BY 1)
    SELECT event_type, score_scaled,
           CAST(score_scaled AS DOUBLE) / 1073741824.0 AS score_half_lives
    FROM s
    """,
)


def _lsh_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-table approximate k-NN join (operators/ann.lsh_knn_join):
    per-left-row top-5 right rows among multiprobe LSH candidates, neither
    side broadcast. Split the embeddings table into disjoint halves as the
    two corpora."""
    from ..operators import ann as A

    emb = _t(spark, sf, "embeddings")
    left = emb.where(F.col("vec_id") < 200)
    right = emb.where(F.col("vec_id") >= 200)
    return A.lsh_knn_join(left, right, k=5, n_planes=6, n_probe_bits=1,
                          dim=EMB_DIM)


_register(
    "ann_lsh_knn_join",
    _lsh_knn_join,
    f"""
    WITH l AS (
      SELECT vec_id AS id_a, embedding AS va,
             {bucket_sql('embedding', PLANES6)} AS b0
      FROM embeddings WHERE vec_id < 200),
    lp AS (
      SELECT id_a, va, CAST(xor(b0, m) AS BIGINT) AS bucket
      FROM l CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS m)),
    r AS (
      SELECT vec_id AS id_b, embedding AS vb,
             {bucket_sql('embedding', PLANES6)} AS bucket
      FROM embeddings WHERE vec_id >= 200),
    c AS (
      SELECT id_a, id_b, {dot2_sql('va', 'vb')} AS cosine
      FROM lp JOIN r USING (bucket)),
    ranked AS (
      SELECT id_a, id_b, cosine,
             row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b)
               AS rnk
      FROM c)
    SELECT id_a, id_b, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)


def _ev_windowed_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-day value-distribution monitor (streaming/windows
    .windowed_value_histogram): tumbling window() x histogram bin — the
    ingest-time producer for sketches.histogram_drift. Batch run IS the
    oracle; the streaming parity test drives the same definition through a
    memory sink."""
    _utc(spark)
    from ..streaming import windows as SWm

    return SWm.windowed_value_histogram(
        _t(spark, sf, "events"), value_col="value", size="1 day",
        lo=0.0, hi=500.0, n_bins=20,
    )


_register(
    "ev_windowed_value_histogram",
    _ev_windowed_histogram,
    """
    SELECT epoch_us(date_trunc('day', ts)) AS window_start_us,
           CAST(least(19, greatest(0, CAST(floor(
             ((CAST(value AS DOUBLE) - 0.0) * 20.0) / 500.0
           ) AS INT))) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)


def _pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ-ADC tier (operators/ann.py): codebooks trained on a 2000-row
    sample (seeded, deterministic), corpus encoded to 8 codes/vector, ADC
    shortlist 200, exact re-rank to top-10. Rows-only: the encode/score
    path is a numpy-codebook pandas_udf (not SQL-expressible); recall and
    encode correctness are pinned in tests/test_ann_recall.py."""
    from ..operators import ann as A

    emb = _t(spark, sf, "embeddings")
    import numpy as _np

    sample = _np.array(
        [r.embedding for r in emb.orderBy("vec_id").limit(2000).select("embedding").collect()]
    )
    books = A.pq_train(sample, m_sub=8, k_cent=64, iters=5, seed=42)
    codes = A.pq_encode(emb, books).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    return A.pq_adc_topk(codes, QV_ZEBRA, books, k=10, shortlist=200)


_register(
    "ann_pq_adc_topk",
    _pq_adc_topk,
    None,  # numpy-codebook pandas_udf encode/score path; rows-only check
)


def _ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVFADC (operators/ann.py): IVF cells prune the scan, shared residual
    codebooks shrink the scanned bytes, exact re-rank fixes the order.
    Rows-only (numpy-codebook pandas_udf path); recall floors and
    encode==numpy parity are pinned in tests/test_ann_recall.py."""
    from ..operators import ann as A
    import numpy as _np

    emb = _t(spark, sf, "embeddings")
    cents = A.ivf_train_kmeans(emb, k=8)
    sample = _np.array(
        [r.embedding for r in emb.orderBy("vec_id").limit(2000).select("embedding").collect()]
    )
    books = A.ivf_pq_train(sample, cents, m_sub=8, k_cent=64, iters=5, seed=42)
    idx = A.ivf_pq_encode(emb, cents, books).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    return A.ivf_pq_topk(idx, QV_ZEBRA, cents, books, k=10, n_probe=4,
                         shortlist=200)


_register(
    "ann_ivf_pq_topk",
    _ivf_pq_topk,
    None,  # numpy-codebook pandas_udf path; rows-only check
)


def _ev_rfm(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    return EV.rfm_features(_t(spark, sf, "events"))


_register(
    "ev_rfm_features",
    _ev_rfm,
    f"""
    WITH m AS (SELECT max(epoch_us(ts)) AS corpus_max_us FROM events),
    u AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
                 CAST(count(*) AS BIGINT) AS frequency,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
          FROM events GROUP BY 1)
    SELECT user_id, corpus_max_us - last_us AS recency_us,
           frequency, monetary_cents
    FROM u, m
    """,
)


def _window_rank_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a UNIQUE total order (price,
    orderkey), so every rank function is deterministic; the rank-count
    divisions are the same integer ratios in both engines, hence the
    doubles are bit-identical."""
    from pyspark.sql import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


_register(
    "rel_window_ntile",
    _window_rank_breadth,
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)


# SQL subquery surface: correlated EXISTS (Catalyst rewrites to a semi
# join) and a scalar subquery (broadcast one-row aggregate). Identical SQL
# text runs on both engines.
_EXISTS_BODY = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 50000)
"""

# threshold from an integer-cents sum (order-free BIGINT addition), not
# avg(double) — a partial-agg float sum could differ by ulps between
# engines and flip boundary rows
_SCALAR_SUBQ_BODY = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders
    WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 10 >
          (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) * 18 / count(*) FROM orders)
"""


def _sql_views_query(body: str):
    def q(spark: SparkSession, sf: str) -> DataFrame:
        from ..sources.catalog import register_views

        _utc(spark)
        register_views(spark, sf)
        return spark.sql(body)

    return q


_register("sql_exists_correlated", _sql_views_query(_EXISTS_BODY), _EXISTS_BODY)
_register("sql_scalar_subquery", _sql_views_query(_SCALAR_SUBQ_BODY), _SCALAR_SUBQ_BODY)


def _ev_asof_tol(spark: SparkSession, sf: str) -> DataFrame:
    """asof_join's tolerance branch: matches staler than 15 minutes are
    nulled but the left row survives (operators/joins.py tolerance
    semantics), oracle-mirrored with CASE-masked ASOF JOIN columns."""
    from ..operators import joins

    _utc(spark)
    ev = _t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # latest_by replaces the groupBy((user, ts), max) pre-dedupe — one
    # exchange fewer, same answer (see ev_asof_click_view, r14 opt)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = joins.asof_join(clicks, views, on="user_id", ts="ts",
                          tolerance="15 minutes",
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
    "ev_asof_tolerance",
    _ev_asof_tol,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
    j AS (
      SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
             epoch_us(v.ts) AS vus, v.view_event_id AS vid
      FROM clicks c ASOF LEFT JOIN views v
        ON c.user_id = v.user_id AND v.ts <= c.ts)
    SELECT event_id, user_id, ts_us,
           CASE WHEN ts_us - vus <= 900000000 THEN vus END AS view_ts_us,
           CASE WHEN ts_us - vus <= 900000000 THEN vid END AS view_event_id,
           CASE WHEN ts_us - vus <= 900000000 THEN ts_us - vus END AS gap_us
    FROM j
    """,
)


# Multi-granularity time rollup in ONE pass: hour/day/week buckets via
# GROUPING SETS over date_trunc'd keys — the OLAP hypertable-rollup shape
# (each granularity combines map-side; one shuffle total, not one per
# granularity). SQL text form: identical Catalyst path as the DataFrame
# API, identical text on DuckDB modulo unix_micros/epoch_us.
_TIME_ROLLUP_BODY_SPARK = """
    SELECT unix_micros(date_trunc('hour', ts)) AS h_us,
           unix_micros(date_trunc('day', ts)) AS d_us,
           unix_micros(date_trunc('week', ts)) AS w_us,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY GROUPING SETS ((h_us), (d_us), (w_us))
"""

_TIME_ROLLUP_BODY_DUCK = """
    SELECT epoch_us(date_trunc('hour', ts)) AS h_us,
           epoch_us(date_trunc('day', ts)) AS d_us,
           epoch_us(date_trunc('week', ts)) AS w_us,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY GROUPING SETS ((h_us), (d_us), (w_us))
"""


def _time_rollup_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_TIME_ROLLUP_BODY_SPARK)


_register("ev_time_bucket_rollup", _time_rollup_query, _TIME_ROLLUP_BODY_DUCK)


def _hll_query(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable HLL distinct sketches (rows-only: DuckDB has no
    DataSketches-compatible HLL; the accuracy bound is pinned in
    tests/test_operators.py instead). Sketch per event_type shard, union
    to one estimate — the sketch-once / merge-cheap distinct pattern."""
    from ..operators import sketches

    sk = sketches.hll_shard_sketches(_t(spark, sf, "events"), "event_type", "user_id")
    return sketches.hll_union_estimate(sk).select(
        F.col("approx_distinct").cast("long").alias("approx_distinct")
    )


_register("sketch_hll_distinct", _hll_query, None)


def _ev_dedup_window(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    return EV.dedup_within_window(_t(spark, sf, "events"), minutes=10)


_EV_DEDUP_BUCKET_SQL = """
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
    FROM (SELECT event_id, user_id, event_type, ts,
                 row_number() OVER (
                   PARTITION BY user_id, event_type,
                                CAST(epoch_us(ts) // 600000000 AS BIGINT)
                   ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """

_register("ev_dedup_within_window", _ev_dedup_window, _EV_DEDUP_BUCKET_SQL)


def _ev_dedup_stream_twin(spark: SparkSession, sf: str) -> DataFrame:
    """Batch run of the STREAMING dedup shape (tumbling window + struct-min,
    streaming/windows.dedup_first_in_bucket) — same oracle as the keyed
    row_number() batch form, proving the two physical shapes agree."""
    from ..streaming import windows as SW

    _utc(spark)
    return SW.dedup_first_in_bucket(_t(spark, sf, "events"), minutes=10)


_register("ev_dedup_bucket_stream_twin", _ev_dedup_stream_twin, _EV_DEDUP_BUCKET_SQL)


def _feature_corr(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    from ..operators import stats as ST

    li = _t(spark, sf, "lineitem")
    return ST.exact_corr_pairs(
        li,
        [("l_quantity", "l_extendedprice"),
         ("l_quantity", "l_discount"),
         ("l_extendedprice", "l_discount")],
        scale=100,
    )


_CORR_PAIR_SQL = """
      SELECT '{a}' AS col_a, '{b}' AS col_b,
             round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                   9) AS corr
      FROM (SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(xa) AS sx, sum(xb) AS sy,
                   sum(xa * xa) AS sxx,
                   sum(xb * xb) AS syy,
                   sum(xa * xb) AS sxy
            FROM (SELECT CAST(round({a} * 100) AS DECIMAL(18,0)) AS xa,
                         CAST(round({b} * 100) AS DECIMAL(18,0)) AS xb
                  FROM lineitem))
"""

_register(
    "rel_feature_corr",
    _feature_corr,
    " UNION ALL ".join(
        "(" + _CORR_PAIR_SQL.format(a=a, b=b) + ")"
        for a, b in [("l_quantity", "l_extendedprice"),
                     ("l_quantity", "l_discount"),
                     ("l_extendedprice", "l_discount")]
    ),
)


_CONT_SH = char_shingles_sql("text", 5)

_register(
    "dedup_containment",
    lambda spark, sf: dedup.containment_pairs(
        _t(spark, sf, "documents"), threshold=0.8
    ).select("id_a", "id_b", F.round("containment", 9).alias("containment")),
    f"""
    WITH g AS (SELECT doc_id AS id,
                      list_distinct(list_transform({_CONT_SH},
                                    s -> {hash60_sql('s')})) AS gs
               FROM documents),
    e AS (SELECT id, unnest(gs) AS gram FROM g),
    rare AS (SELECT gram FROM e GROUP BY gram HAVING count(*) <= 20),
    er AS (SELECT e.id, e.gram FROM e JOIN rare USING (gram)),
    c AS (SELECT a.id AS id_a, b.id AS id_b
          FROM er a JOIN er b ON a.gram = b.gram AND a.id < b.id
          GROUP BY 1, 2 HAVING count(*) >= 2),
    v AS (SELECT id_a, id_b,
                 CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
                 / CAST(least(len(ga.gs), len(gb.gs)) AS DOUBLE) AS containment
          FROM c JOIN g ga ON c.id_a = ga.id JOIN g gb ON c.id_b = gb.id)
    SELECT id_a, id_b, round(containment, 9) AS containment
    FROM v WHERE containment >= CAST('0.8' AS DOUBLE)
    """,
)


def _train_quality_lr(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed quality-filter training (rows-only: iterative algorithm
    per contract rules; exactness vs a numpy reference is pinned in
    tests/test_pca.py). Full-batch logistic GD where each pass ships only
    (dim+1)-float partial gradients — stats.train_logistic."""
    from ..operators import stats as ST
    from ..functions import text as TXT

    docs = _t(spark, sf, "documents")
    # No materialization here: train_logistic persists this exact
    # projection for the loop's duration, so the old eager
    # localCheckpoint was a redundant SECOND materialization pass (plus
    # a checkpoint job and block-manager residue that outlives the
    # query). Partitioning — and hence the float partial-sum order —
    # is the parquet scan's file-split layout either way, so the
    # trained weights are bit-identical (r14 opt, guide §1.2/§5).
    feats = docs.select(
        F.log(F.size(TXT.tokens(F.col("text"))) + 1).alias("f_logtok"),
        (F.length("text") / (F.size(TXT.tokens(F.col("text"))) + 1)).alias("f_len"),
        (F.col("doc_id") % 7 == 0).cast("double").alias("label"),
    )
    w, b, losses = ST.train_logistic(
        feats, ["f_logtok", "f_len"], "label", iters=8, lr=0.3
    )
    return values_df(
        spark,
        [(float(w[0]), float(w[1]), float(b), float(losses[-1]))],
        "w_logtok double, w_len double, bias double, final_loss double",
    )


_register("ml_train_quality_lr", _train_quality_lr, None)


_register(
    "samp_split_leakage",
    # the UN-deduped corpus split naively: leakage must be measurable
    lambda spark, sf: sampling.split_leakage_report(
        dedup.minhash_near_dup(_t(spark, sf, "documents"), threshold=0.7)
        .select("id_a", "id_b"),
        sampling.split_assign(
            _t(spark, sf, "documents").select("doc_id"), "doc_id", SPLIT_WEIGHTS
        ),
    ),
    f"""
    WITH s AS (SELECT doc_id, CASE {_SPLIT_CASE} ELSE 'test' END AS split
               FROM documents),
    p AS ({{MINHASH_PAIRS}})
    SELECT least(sa.split, sb.split) AS split_lo,
           greatest(sa.split, sb.split) AS split_hi,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p JOIN s sa ON p.id_a = sa.doc_id JOIN s sb ON p.id_b = sb.doc_id
    GROUP BY 1, 2
    """.replace("{MINHASH_PAIRS}", _ORACLES["dedup_minhash_near_dup"]
                .replace("SELECT id_a, id_b, jaccard", "SELECT id_a, id_b")),
)


_IVF_PICK = ("CASE cell " + " ".join(
    f"WHEN {i} THEN d{i}" for i in range(len(CENTROIDS))) + " END")

_register(
    "ann_ivf_outliers",
    lambda spark, sf: ann.ivf_outliers(
        _t(spark, sf, "embeddings"), CENTROIDS, z=2.0
    ).select("vec_id", F.col("ivf_cell").cast("long").alias("ivf_cell"),
             "nanocos"),
    f"""
    WITH d AS (SELECT vec_id, {_IVF_DOTS} FROM embeddings),
    a AS (SELECT vec_id, {_IVF_CASE} AS cell, * FROM d),
    s AS (SELECT vec_id, cell,
                 CAST(round(({_IVF_PICK}) * 1e9) AS BIGINT) AS nanocos
          FROM a),
    m AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(nanocos) AS BIGINT) AS s1,
                 CAST(sum(nanocos * nanocos) AS BIGINT) AS s2
          FROM s GROUP BY 1)
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS ivf_cell, s.nanocos
    FROM s JOIN m ON s.cell = m.cell
    WHERE (CAST(s1 AS DOUBLE) / n - s.nanocos) > 0
      AND (CAST(s1 AS DOUBLE) / n - s.nanocos)
          * (CAST(s1 AS DOUBLE) / n - s.nanocos)
          > 4.0 * (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
    """,
)


_NEG_HASH = _samp_hash_sql("neg")


def _contrastive_triplets_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import corpus as corpus_ops

    docs = _t(spark, sf, "documents")
    return corpus_ops.contrastive_triplets(
        docs,
        dedup.minhash_near_dup(docs, threshold=0.7).select("id_a", "id_b"),
    )


_register(
    "corpus_contrastive_triplets",
    _contrastive_triplets_query,
    f"""
    WITH h AS (SELECT doc_id AS anchor, {_NEG_HASH} AS hh,
                      CAST({_NEG_HASH} // 16777216 AS BIGINT) AS bucket
               FROM documents),
    n AS (SELECT anchor,
                 lead(anchor) OVER (PARTITION BY bucket ORDER BY hh, anchor)
                   AS negative
          FROM h),
    p AS ({{PAIRS}})
    SELECT p.id_a AS anchor, p.id_b AS positive, n.negative
    FROM p JOIN n ON p.id_a = n.anchor
    WHERE n.negative IS NOT NULL AND n.negative <> p.id_b
    """.replace("{PAIRS}", _ORACLES["dedup_minhash_near_dup"]
                .replace("SELECT id_a, id_b, jaccard", "SELECT id_a, id_b")),
)


