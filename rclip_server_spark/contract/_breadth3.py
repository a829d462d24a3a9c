"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _register, _t, _utc  # noqa: F401
from ._breadth1 import TA  # noqa: F401
from ._dedup_text import (  # noqa: F401
    _BAND_EQ,
    _HASHED_SHINGLES,
    _MH_MIN_MATCHES,
    _SHINGLES,
    _SIG_LIST,
    _SIG_MATCHES,
    _TOKS,
)
from ._scans_rel import _W  # noqa: F401

# ===========================================================================
# event analytics (operators/events.py): funnel + cohort retention
# ===========================================================================

from ..operators import events as EV  # noqa: E402

FUNNEL_STEPS = ["view", "click", "purchase"]


def _ev_funnel(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    return EV.funnel(_t(spark, sf, "events"), FUNNEL_STEPS)


_register(
    "ev_funnel_counts",
    _ev_funnel,
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
           CAST(count(*) AS BIGINT) AS n_users FROM s0
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
    """,
)


def _ev_retention(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    return EV.cohort_retention(_t(spark, sf, "events"))


_register(
    "ev_cohort_retention",
    _ev_retention,
    """
    WITH first AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    cohorts AS (SELECT user_id, date_trunc('week', first_ts) AS cohort_w FROM first),
    active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS bucket_w FROM events)
    SELECT epoch_us(cohort_w) AS cohort_us, epoch_us(bucket_w) AS bucket_us,
           CAST(count(*) AS BIGINT) AS n_users
    FROM active JOIN cohorts USING (user_id)
    GROUP BY cohort_w, bucket_w
    """,
)


def _ev_transitions(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    return EV.event_transitions(_t(spark, sf, "events"))


_register(
    "ev_transition_matrix",
    _ev_transitions,
    """
    WITH x AS (SELECT event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_type
               FROM events)
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
    FROM x WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)


def _agg_merge_query(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance: the stored aggregate of orders before
    1997-01-01 merged with the aggregate of the later delta — the oracle
    computes the SAME totals directly from the full table, proving the
    merge is exact without rescanning the base."""
    from ..sources import writer as W

    _utc(spark)
    orders = _t(spark, sf, "orders")
    split = F.lit("1997-01-01").cast("timestamp")
    cents = cents_col(F.col("o_totalprice"))

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("total_cents")
        )

    base = _agg(orders.where(F.col("o_orderdate") < split))
    delta = _agg(orders.where(F.col("o_orderdate") >= split))
    return W.merge_agg_delta(base, delta, ["o_orderstatus"], ["n", "total_cents"])


_register(
    "rel_incremental_agg_merge",
    _agg_merge_query,
    f"""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders GROUP BY o_orderstatus
    """,
)


def _zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """Twin of sources.writer.zorder_value — the same literal shift chain."""
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return " | ".join(terms)


def _zorder_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources import writer as W

    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        W.zorder_value(F.col("l_partkey"), F.col("l_suppkey")).alias("z"),
    )


_register(
    "rel_zorder_key",
    _zorder_query,
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_zorder_sql('l_partkey', 'l_suppkey')} AS BIGINT) AS z
    FROM lineitem
    """,
)


# ===========================================================================
# binary-quantization ANN tier (ann.binary_hamming_topk)
# ===========================================================================


def binary_words_sql(expr: str, dim: int) -> list[str]:
    """Per-word packed sign-bit expressions — twin of vector.binarize_words."""
    words = []
    for w in range(0, dim, 32):
        bits = " + ".join(
            f"(CASE WHEN {expr}[{w + i + 1}] >= 0 THEN CAST({1 << i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(min(32, dim - w))
        )
        words.append(f"({bits})")
    return words


_QWORDS = []
for _w in range(0, EMB_DIM, 32):
    _word = 0
    for _i in range(min(32, EMB_DIM - _w)):
        if QV_ZEBRA[_w + _i] >= 0:
            _word |= 1 << _i
    _QWORDS.append(_word)

_BW = binary_words_sql("embedding", EMB_DIM)
_HAMMING_SQL = " + ".join(
    f"bit_count(xor({bw}, CAST({qw} AS BIGINT)))" for bw, qw in zip(_BW, _QWORDS)
)

_register(
    "ann_binary_hamming_topk",
    lambda spark, sf: ann.binary_hamming_topk(
        _t(spark, sf, "embeddings"), QV_ZEBRA, k=10, shortlist=200, dim=EMB_DIM
    ),
    f"""
    WITH h AS (SELECT vec_id, embedding, ({_HAMMING_SQL}) AS hamming
               FROM embeddings),
    shortlist AS (SELECT vec_id, embedding FROM h
                  ORDER BY hamming, vec_id LIMIT 200)
    SELECT vec_id, {dot_sql('embedding', QV_ZEBRA)} AS score
    FROM shortlist ORDER BY score DESC, vec_id LIMIT 10
    """,
)


# ===========================================================================
# more-like-this (inverted-index TF-IDF cosine) + n-gram repetition
# ===========================================================================

_TFIDF_CTES = f"""
    toks AS (SELECT doc_id AS id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, token),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM (SELECT DISTINCT id, token FROM toks) GROUP BY token),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (SELECT tf.id, tf.token,
                 CAST(tf.tf AS DOUBLE) * ln(n_docs / CAST(dfreq.df AS DOUBLE)) AS tfidf
          FROM tf JOIN dfreq USING (token) CROSS JOIN nn)
"""

MLT_QUERY_DOC = 7

_register(
    "text_more_like_this",
    lambda spark, sf: __import__(
        "rclip_server_spark.operators.retrieval", fromlist=["more_like_this"]
    ).more_like_this(_t(spark, sf, "documents"), MLT_QUERY_DOC, k=10),
    f"""
    WITH {_TFIDF_CTES},
    norms AS (SELECT id, CAST(SUM(CAST(round(tfidf * tfidf * 1e6) AS BIGINT)) AS BIGINT) AS n_u
              FROM w GROUP BY id),
    qvec AS (SELECT token, tfidf AS q_tfidf FROM w WHERE id = {MLT_QUERY_DOC}),
    qn AS (SELECT n_u AS qn_u FROM norms WHERE id = {MLT_QUERY_DOC}),
    dots AS (SELECT id, CAST(SUM(CAST(round(w.tfidf * qvec.q_tfidf * 1e6) AS BIGINT)) AS BIGINT) AS dot_u
             FROM w JOIN qvec USING (token) WHERE id != {MLT_QUERY_DOC} GROUP BY id)
    SELECT dots.id AS doc_id,
           CAST(dot_u AS DOUBLE) / (sqrt(CAST(norms.n_u AS DOUBLE)) * sqrt(CAST(qn_u AS DOUBLE))) AS cosine
    FROM dots JOIN norms ON dots.id = norms.id CROSS JOIN qn
    ORDER BY cosine DESC, doc_id LIMIT 10
    """,
)

_NG3 = word_ngrams_sql(_TOKS, 3)

_register(
    "text_ngram_repetition",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id",
        TA.ngram_repetition_ratio(F.col("text"), 3).alias("rep3"),
    ),
    f"""
    SELECT doc_id,
           CASE WHEN len({_NG3}) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct({_NG3})) AS DOUBLE)
                           / CAST(len({_NG3}) AS DOUBLE) END AS rep3
    FROM documents
    """,
)


# ===========================================================================
# time-RANGE rolling window (7-day per-user rolling sum over events)
# ===========================================================================

_7D_US = 7 * 86400 * 1000000


def _ev_rolling_7d(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame over event TIME (not row count): each event's window is
    [t - 7d, t] regardless of how many events fall in it — the frame the
    ROWS-based rows cannot express. Ordered by unix micros so the frame
    bound is an exact integer offset in both engines."""
    _utc(spark)
    ev = _t(spark, sf, "events")
    w = (
        _W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_7D_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents_col(F.col("value"))).over(w).alias("rolling_cents"),
    )


_register(
    "ev_rolling_7d_value",
    _ev_rolling_7d,
    f"""
    SELECT event_id, user_id,
           CAST(SUM({cents('value')}) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_cents
    FROM events
    """,
)


# ===========================================================================
# data-quality profiling / constraint checks (operators/profiling.py)
# ===========================================================================

from ..operators import profiling  # noqa: E402


def _profile_cols_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


_PROFILE_COLS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]

_register(
    "rel_profile_lineitem",
    lambda spark, sf: profiling.profile_table(
        _t(spark, sf, "lineitem"), _PROFILE_COLS
    ),
    _profile_cols_sql("lineitem", _PROFILE_COLS),
)

_register(
    "rel_uniqueness_check",
    # (l_orderkey, l_linenumber) is lineitem's natural PK — expect 0 rows;
    # l_orderkey alone has real multiplicities, so check BOTH: the PK row
    # proves emptiness, the single-column row exercises the violation path
    lambda spark, sf: profiling.uniqueness_violations(
        _t(spark, sf, "lineitem"), ["l_orderkey"]
    ).select("l_orderkey", F.col("n").cast("long").alias("n")),
    """
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
)

_register(
    "rel_fk_violations",
    # lineitem.l_orderkey -> orders.o_orderkey plus a synthetic orphan set
    # (keys shifted past the domain) so the check demonstrably fires
    lambda spark, sf: profiling.referential_violations(
        _t(spark, sf, "lineitem").select(
            F.when(F.col("l_linenumber") == 7, F.col("l_orderkey") + 1000000000)
            .otherwise(F.col("l_orderkey"))
            .alias("l_orderkey")
        ),
        _t(spark, sf, "orders"),
        "l_orderkey",
        "o_orderkey",
    ),
    """
    SELECT DISTINCT CASE WHEN l_linenumber = 7 THEN l_orderkey + 1000000000
                         ELSE l_orderkey END AS orphan_key
    FROM lineitem
    WHERE CASE WHEN l_linenumber = 7 THEN l_orderkey + 1000000000
               ELSE l_orderkey END NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
      AND l_orderkey IS NOT NULL
    """,
)


# ===========================================================================
# snapshot diff (CDC): added / removed / changed between two table versions
# ===========================================================================


def _snapshot_diff_query(spark: SparkSession, sf: str) -> DataFrame:
    """Two synthetic snapshots of documents from one fixture: the "old"
    snapshot drops doc_id % 7 == 0, the "new" snapshot drops doc_id % 5 == 0
    and rewrites every doc_id % 11 == 0 text — yielding all three change
    classes deterministically."""
    docs = _t(spark, sf, "documents")
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    )
    return profiling.snapshot_diff(old, new, ["doc_id"], ["text", "lang", "source"])


_register(
    "rel_snapshot_diff",
    _snapshot_diff_query,
    """
    WITH o AS (
      SELECT doc_id, md5(concat_ws(chr(31),
               coalesce(text, chr(0)), coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS fp
      FROM documents WHERE doc_id % 7 <> 0),
    n AS (
      SELECT doc_id, md5(concat_ws(chr(31),
               coalesce(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END, chr(0)),
               coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS fp
      FROM documents WHERE doc_id % 5 <> 0)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed' END AS change
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    WHERE CASE WHEN o.fp IS NULL THEN 'added'
               WHEN n.fp IS NULL THEN 'removed'
               WHEN o.fp <> n.fp THEN 'changed' END IS NOT NULL
    """,
)


# ===========================================================================
# incremental ingestion dedup: batch vs corpus MinHash near-dup
# ===========================================================================

_register(
    "dedup_minhash_incremental",
    # split the fixture: batch = doc_id % 10 == 0 arriving against the rest
    lambda spark, sf: dedup.minhash_near_dup_incremental(
        _t(spark, sf, "documents").where(F.col("doc_id") % 10 != 0),
        _t(spark, sf, "documents").where(F.col("doc_id") % 10 == 0),
        threshold=0.7,
    ),
    f"""
    WITH h AS (SELECT doc_id AS id,
                      list_distinct(list_transform({_SHINGLES}, s -> {hash60_sql('s')})) AS gs,
                      {_HASHED_SHINGLES} AS hs FROM documents),
    s AS (SELECT id, gs, {_SIG_LIST} AS sig FROM h),
    cand AS (
      SELECT a.id AS corpus_id, c.id AS batch_id, a.gs AS gs_a, c.gs AS gs_b
      FROM (SELECT * FROM s WHERE id % 10 != 0) a
      JOIN (SELECT * FROM s WHERE id % 10 = 0) c
        ON ({_BAND_EQ}) AND {_SIG_MATCHES} >= {_MH_MIN_MATCHES})
    SELECT corpus_id, batch_id, jaccard FROM (
      SELECT corpus_id, batch_id,
             CAST(len(list_intersect(gs_a, gs_b)) AS DOUBLE)
             / CAST(len(gs_a) + len(gs_b) - len(list_intersect(gs_a, gs_b)) AS DOUBLE) AS jaccard
      FROM cand)
    WHERE jaccard >= 0.7
    """,
)


# ===========================================================================
# relational surface: unpivot (melt) + null-safe join
# ===========================================================================

_register(
    "rel_unpivot_metrics",
    # wide -> long: one (metric, cents) row per measure column via stack();
    # integer cents keep the doubles order-free
    lambda spark, sf: _t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'extendedprice', cast(round(l_extendedprice * 100) as bigint),"
            " 'discount', cast(round(l_discount * 100) as bigint),"
            " 'tax', cast(round(l_tax * 100) as bigint)) AS (metric, cents)"
        ),
    ),
    """
    SELECT l_orderkey, l_linenumber, metric, cents FROM (
      SELECT l_orderkey, l_linenumber,
             'extendedprice' AS metric,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount',
             CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax',
             CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
    """,
)


def _rel_nullsafe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys MATCH each other — the
    semantics a naive ON a = b silently drops. Derived nullable key on both
    sides so the NULL-matches-NULL path is exercised."""
    n = _t(spark, sf, "nation")
    left = n.select(
        F.when(F.col("n_regionkey") == 0, None).otherwise(F.col("n_regionkey")).alias("k"),
        F.col("n_nationkey").alias("l_id"),
    )
    right = n.select(
        F.when(F.col("n_regionkey") == 0, None).otherwise(F.col("n_regionkey")).alias("k"),
        F.col("n_nationkey").alias("r_id"),
    )
    return (
        left.join(right, left["k"].eqNullSafe(right["k"]))
        .select(left["k"].alias("k"), "l_id", "r_id")
    )


_register(
    "rel_nullsafe_join",
    _rel_nullsafe_join,
    """
    WITH l AS (SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS k,
                      n_nationkey AS l_id FROM nation),
    r AS (SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS k,
                 n_nationkey AS r_id FROM nation)
    SELECT l.k, l_id, r_id FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)


# ===========================================================================
# fuzzy string join (entity resolution): q-gram prefilter + levenshtein
# ===========================================================================

from ..operators import joins as J  # noqa: E402

# left: the distinct token vocabulary; right: tokens with a deterministic
# char-2/3 transposition typo (only tokens long enough to transpose)
_VOCAB_SQL = f"(SELECT DISTINCT token AS w FROM (SELECT unnest({_TOKS}) AS token FROM documents))"
_TYPO_SQL = (
    "(SELECT DISTINCT concat(substr(w, 1, 1), substr(w, 3, 1), substr(w, 2, 1), substr(w, 4)) AS w2 "
    f"FROM {_VOCAB_SQL} WHERE length(w) >= 4)"
)


def _fuzzy_join_query(spark: SparkSession, sf: str) -> DataFrame:
    vocab = (
        _t(spark, sf, "documents")
        .select(F.explode(TXT.tokens(F.col("text"))).alias("w"))
        .distinct()
    )
    typos = (
        vocab.where(F.length("w") >= 4)
        .select(
            F.concat(
                F.substring("w", 1, 1),
                F.substring("w", 3, 1),
                F.substring("w", 2, 1),
                F.expr("substr(w, 4)"),
            ).alias("w2")
        )
        .distinct()
    )
    return J.fuzzy_string_join(vocab, typos, "w", "w2", max_dist=2, q=2)


_register(
    "rel_fuzzy_string_join",
    _fuzzy_join_query,
    f"""
    WITH l AS {_VOCAB_SQL}, r AS {_TYPO_SQL},
    gl AS (SELECT DISTINCT w AS sa, unnest(CASE WHEN length(lower(w)) < 2 THEN [lower(w)]
               ELSE list_distinct(list_transform(range(1, length(lower(w))),
                                  i -> substr(lower(w), CAST(i AS INT), 2))) END) AS g
           FROM l),
    gr AS (SELECT DISTINCT w2 AS sb, unnest(CASE WHEN length(lower(w2)) < 2 THEN [lower(w2)]
               ELSE list_distinct(list_transform(range(1, length(lower(w2))),
                                  i -> substr(lower(w2), CAST(i AS INT), 2))) END) AS g
           FROM r),
    cand AS (SELECT DISTINCT sa, sb FROM gl JOIN gr USING (g))
    SELECT sa, sb, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(sa, sb) <= 2 AND sa != sb
    """,
)


# ===========================================================================
# z-score anomaly detection over events (exact integer moments)
# ===========================================================================


def _ev_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type z-score outliers: |value - mean| > 3*stddev, with the
    moments computed from ORDER-FREE integer sums (cents and squared cents
    as BIGINT) so mean/std — and therefore the flag — are bit-identical
    across engines and partitionings. Population std (the /n form) in both.
    Squared cents stay far inside int64 (1e8 per row x 2e5 rows ~ 2e13)."""
    _utc(spark)
    ev = _t(spark, sf, "events")
    c = cents_col(F.col("value"))
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    joined = ev.join(F.broadcast(m), "event_type")
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = F.col("s2").cast("double") / F.col("n").cast("double") - mean * mean
    dev = F.abs(c.cast("double") - mean)
    return joined.where(dev * dev > F.lit(9.0) * var).select(
        "event_id", "event_type", c.alias("value_cents")
    )


def _ev_asof_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of streaming.stateful.streaming_asof_last_view (the
    applyInPandasWithState as-of operator): same function, batch runtime.
    Equal-ts views dedupe to max(event_id) inside the operator's asof
    window (latest_by — the streaming path's own tie-break), so the
    matched view id is deterministic cross-engine without a separate
    pre-aggregation exchange (r14 opt)."""
    from ..streaming import stateful as ST

    _utc(spark)
    ev = _t(spark, sf, "events")
    return ST.streaming_asof_last_view(
        ev.where(F.col("event_type").isin("click", "view")).select(
            "user_id", "event_id", "event_type", "ts"
        )
    )


_register(
    "ev_asof_attribution",
    _ev_asof_attribution,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, ts, max(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS click_us,
           v.view_id, epoch_us(v.ts) AS view_us,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)


_register(
    "ev_zscore_outliers",
    _ev_zscore,
    f"""
    WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM({cents('value')}) AS BIGINT) AS s1,
                      CAST(SUM({cents('value')} * {cents('value')}) AS BIGINT) AS s2
               FROM events GROUP BY event_type)
    SELECT event_id, events.event_type, {cents('value')} AS value_cents
    FROM events JOIN m ON events.event_type = m.event_type
    WHERE abs({cents('value')} - CAST(s1 AS DOUBLE) / n)
          * abs({cents('value')} - CAST(s1 AS DOUBLE) / n)
          > 9.0 * (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
    """,
)


