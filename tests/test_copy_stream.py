"""COPY STREAM (continuous file ingest through the exactly-once
versioned sink): incremental file pickup, restart-resume identity,
bucketed routing, and the one-identity-per-table guard. Parity
oracle: the union of the files fed in."""

import os

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V
from rclip_server_spark.streaming import sink


def _rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


@pytest.fixture()
def cat(tmp_path):
    return S.Catalog(str(tmp_path / "cat"))


@pytest.fixture()
def seed(events):
    return events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))


def _drop_files(df, dst, n):
    """Write df as ndjson part files into dst/<n>/ then move them up —
    the file source sees whole files appear atomically."""
    stage = os.path.join(dst, f".stage{n}")
    df.coalesce(1).write.json(stage)
    for f in os.listdir(stage):
        if f.endswith(".json"):
            os.rename(os.path.join(stage, f),
                      os.path.join(dst, f"batch{n}-{f}"))
    import shutil

    shutil.rmtree(stage)


def test_copy_stream_incremental_pickup(spark, seed, cat, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    S.execute(spark, "CREATE TABLE ti (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id', "
                     "buckets=4)", cat)
    _drop_files(seed.where(F.col("event_id") % 3 == 0), src, 0)
    r = S.execute(spark, f"START COPY STREAM FROM '{src}' INTO ti "
                         f"OPTIONS (format='ndjson')", cat)
    assert r["status"] == "copy_stream_started"
    q = S._STREAMS[S._copy_stream_key(cat, "ti")]
    try:
        q.processAllAvailable()
        got1 = S.execute(spark, "SELECT * FROM ti", cat)
        assert _rows(got1) == _rows(seed.where(F.col("event_id") % 3
                                               == 0))
        # a second wave of files lands: only the new ones are read
        _drop_files(seed.where(F.col("event_id") % 3 == 1), src, 1)
        q.processAllAvailable()
        got2 = S.execute(spark, "SELECT * FROM ti", cat)
        assert _rows(got2) == _rows(seed.where(F.col("event_id") % 3
                                               != 2))
    finally:
        S.execute(spark, "STOP COPY STREAM ON ti", cat)
    # the ingest landed BUCKETED (per-bucket segments, key-equi DML)
    path = cat.get("ti")["path"]
    m = V._manifest(path, V.current_version(path))
    assert m.get("buckets")
    # exactly-once: each micro-batch recorded its batch id
    assert V.committed_batch_ids(path)


def test_copy_stream_restart_resumes_not_reingests(spark, seed, cat,
                                                   tmp_path):
    src = str(tmp_path / "landing2")
    os.makedirs(src)
    S.execute(spark, "CREATE TABLE tr (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    first = seed.where(F.col("event_id") % 2 == 0)
    _drop_files(first, src, 0)
    S.execute(spark, f"START COPY STREAM FROM '{src}' INTO tr "
                     f"OPTIONS (format='ndjson')", cat)
    q = S._STREAMS[S._copy_stream_key(cat, "tr")]
    q.processAllAvailable()
    S.execute(spark, "STOP COPY STREAM ON tr", cat)
    n1 = S.execute(spark, "SELECT * FROM tr", cat).count()
    assert n1 == first.count()
    # restart from the SAME source: resumes the file index — nothing
    # re-ingested; new files still flow
    r = S.execute(spark, f"START COPY STREAM FROM '{src}' INTO tr "
                         f"OPTIONS (format='ndjson')", cat)
    assert r["resumed"] is True
    q2 = S._STREAMS[S._copy_stream_key(cat, "tr")]
    try:
        q2.processAllAvailable()
        assert S.execute(spark, "SELECT * FROM tr", cat).count() == n1
        _drop_files(seed.where(F.col("event_id") % 2 == 1), src, 1)
        q2.processAllAvailable()
        assert _rows(S.execute(spark, "SELECT * FROM tr", cat)) == \
            _rows(seed)
    finally:
        S.execute(spark, "STOP COPY STREAM ON tr", cat)


def test_copy_stream_identity_and_drop_guards(spark, seed, cat,
                                              tmp_path):
    src_a = str(tmp_path / "a")
    src_b = str(tmp_path / "b")
    os.makedirs(src_a)
    os.makedirs(src_b)
    S.execute(spark, "CREATE TABLE tg (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    _drop_files(seed.limit(10), src_a, 0)
    S.execute(spark, f"START COPY STREAM FROM '{src_a}' INTO tg "
                     f"OPTIONS (format='ndjson')", cat)
    q = S._STREAMS[S._copy_stream_key(cat, "tg")]
    q.processAllAvailable()
    # live stream blocks a second one AND blocks DROP
    with pytest.raises(S.SqlError):
        S.execute(spark, f"START COPY STREAM FROM '{src_b}' INTO tg "
                         f"OPTIONS (format='ndjson')", cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, "DROP TABLE tg", cat)
    S.execute(spark, "STOP COPY STREAM ON tg", cat)
    # stopped, but the identity persists: a DIFFERENT source refused
    with pytest.raises(S.SqlError) as ei:
        S.execute(spark, f"START COPY STREAM FROM '{src_b}' INTO tg "
                         f"OPTIONS (format='ndjson')", cat)
    assert "ingest identity" in str(ei.value)
    # views are not copy targets
    with pytest.raises(S.SqlError):
        S.execute(spark, f"START COPY STREAM FROM '{src_a}' INTO "
                         f"nosuch", cat)
    # DROP reaps the identity with the table
    ckroot = S._copy_ckpt_root(cat, "tg")
    assert os.path.isdir(ckroot)
    S.execute(spark, "DROP TABLE tg", cat)
    assert not os.path.isdir(ckroot)


def test_show_streams_lists_both_kinds(spark, seed, cat, tmp_path):
    src = str(tmp_path / "ss_landing")
    os.makedirs(src)
    S.execute(spark, "CREATE TABLE ts (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    seed.limit(20).createOrReplaceTempView("seed_ss")
    S.execute(spark, "CREATE TABLE tsv OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_ss", cat)
    S.execute(spark, "CREATE MATERIALIZED VIEW ssv AS SELECT "
                     "event_type, COUNT(*) AS n FROM tsv "
                     "GROUP BY event_type", cat)
    assert S.execute(spark, "SHOW STREAMS", cat) == []
    S.execute(spark, f"START COPY STREAM FROM '{src}' INTO ts "
                     f"OPTIONS (format='ndjson')", cat)
    S.execute(spark, "START REFRESH STREAM ON VIEW ssv", cat)
    try:
        got = S.execute(spark, "SHOW STREAMS", cat)
        assert [(r["name"], r["type"]) for r in got] == \
            [("ssv", "refresh"), ("ts", "copy")]
    finally:
        S.execute(spark, "STOP COPY STREAM ON ts", cat)
        S.execute(spark, "STOP REFRESH STREAM ON VIEW ssv", cat)
    assert S.execute(spark, "SHOW STREAMS", cat) == []
