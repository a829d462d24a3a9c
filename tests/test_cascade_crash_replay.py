"""Cascade-refresh stream under a REAL mid-cascade crash
(streaming/sink.py:start_view_cascade_refresh_stream): the cascade
advances views bottom-up, so a crash between nodes leaves SOME views
at the new cursor and some behind — the worst restart state. A
restarted stream on the same checkpoint must replay the pending wake
and converge the whole chain exactly-once: already-advanced nodes
no-op on their cursors (no double-apply), the stranded node catches
up, and the final state equals a from-scratch recompute of the
composition."""

import os

import pytest
from pyspark.sql import functions as F

from rclip_server_spark.sources import matview as MV
from rclip_server_spark.sources import versioned as V
from rclip_server_spark.streaming import sink


def _t1_fn(df):
    return df.select("event_id", (F.col("cents") * 2).alias("c2"))


def _t2_fn(df):
    return df.select("event_id", (F.col("c2") + 1).alias("c3"))


def test_cascade_stream_crash_mid_chain_then_converge(
        spark, events, tmp_path):
    base = str(tmp_path / "base")
    t1 = str(tmp_path / "t1")
    t2 = str(tmp_path / "t2")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "crash_on")

    ev = events.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    V.create(spark, base, ev.where(F.col("event_id") % 2 == 0))
    MV.create_transform_view(spark, base, t1, key="event_id",
                             transform=_t1_fn, name="cas_t1")
    MV.create_transform_view(spark, t1, t2, key="event_id",
                             transform=_t2_fn, name="cas_t2")

    def _t2_crashing(df):
        if os.path.exists(marker):
            raise RuntimeError("injected crash mid-cascade (after t1)")
        return _t2_fn(df)

    open(marker, "w").close()
    # sync validation at start runs a zero-interval cascade: the
    # crashing fn is not invoked (fresh cursors fast-return), so the
    # stream starts cleanly and dies on the FIRST real wake, after t1
    # has already committed its refresh — the mid-cascade state
    q = sink.start_view_cascade_refresh_stream(
        spark, t2, checkpoint_dir=ckpt,
        transforms={t1: (_t1_fn, "cas_t1"),
                    t2: (_t2_crashing, "cas_t2")})
    batch = ev.where(F.col("event_id") % 2 == 1)
    try:
        V.append(spark, base, batch)
        with pytest.raises(Exception):
            q.processAllAvailable()
    finally:
        q.stop()
    assert q.exception() is not None
    assert "injected crash" in str(q.exception())
    # mid-cascade: t1 advanced to the new base head, t2 stranded behind
    assert MV.describe_view(t1)["fresh"]
    assert not MV.describe_view(t2)["fresh"]
    t1_commits = len(V.history(t1))

    os.remove(marker)
    q2 = sink.start_view_cascade_refresh_stream(
        spark, t2, checkpoint_dir=ckpt,
        transforms={t1: (_t1_fn, "cas_t1"), t2: (_t2_fn, "cas_t2")})
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert q2.exception() is None

    # converged exactly-once: t1 was NOT re-applied (the replayed wake
    # no-ops on its cursor)...
    assert len(V.history(t1)) == t1_commits
    assert MV.describe_view(t1)["fresh"]
    assert MV.describe_view(t2)["fresh"]
    # ...and the chain state equals the from-scratch composition
    got = sorted(tuple(r) for r in V.read(spark, t2)
                 .select("event_id", "c3").collect())
    want = sorted(tuple(r) for r in _t2_fn(_t1_fn(ev))
                  .collect())
    assert got == want
