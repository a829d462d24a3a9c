"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _register, _t, _utc  # noqa: F401
from ._scans_rel import _W  # noqa: F401

# ===========================================================================
# events: batch twins of the streaming operators (streaming/windows.py) —
# the same transformation functions run as Structured Streams; these batch
# runs ARE the oracle for the streaming tests (SURVEY.md §5.5)
# ===========================================================================

from ..streaming import windows as SW


def _ev_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    out = SW.tumbling_counts(_t(spark, sf, "events"), size="1 day")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value_cents",
    )


_register(
    "ev_tumbling_daily",
    _ev_tumbling,
    f"""
    SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM({cents('value')}) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY 1, 2
    """,
)


def _ev_sliding(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    out = SW.sliding_counts(_t(spark, sf, "events"), size="1 day", slide="12 hours")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"), "event_type", "n_events"
    )


_register(
    "ev_sliding_12h",
    _ev_sliding,
    """
    WITH w1 AS (
      SELECT CAST(floor(epoch_us(ts) / 43200000000) * 43200000000 AS BIGINT) AS window_start_us,
             event_type FROM events),
    both_w AS (
      SELECT window_start_us, event_type FROM w1
      UNION ALL
      SELECT window_start_us - 43200000000, event_type FROM w1)
    SELECT window_start_us, event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM both_w GROUP BY 1, 2
    """,
)


def _ev_sessions(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    out = SW.session_windows(_t(spark, sf, "events"), gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "first_event_id",
    )


_register(
    "ev_session_windows",
    _ev_sessions,
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM ordered)
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           min(event_id) AS first_event_id
    FROM numbered GROUP BY user_id, session_no
    """,
)


def _ev_first_per_key(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    ev = _t(spark, sf, "events")
    w = _W.partitionBy("user_id", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


_register(
    "ev_first_event_per_key",
    _ev_first_per_key,
    """
    SELECT user_id, event_type, event_id FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
)

# ===========================================================================
# D1: distributed embedding (pandas-UDF path; not SQL-expressible → rows-only)
# ===========================================================================


def _d1_embed(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import multimodal

    de = multimodal.embed_documents(_t(spark, sf, "documents"))
    return de.select(
        "doc_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            6,
        ).alias("emb_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


_register("d1_embed_documents_distributed", _d1_embed, None)


