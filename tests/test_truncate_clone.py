"""TRUNCATE TABLE (versioned.truncate + the SQL verb): the reversible
empty-the-table commit on both layouts. Parity oracle: set algebra on
the source frame; reversibility oracle: RESTORE returns the exact
pre-truncate state. (Reference B18 full reload, rclip_server.py:393-401,
completed at manifest altitude — clone tests join this file later.)"""

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V


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


def test_truncate_flat_roundtrip(spark, seed, cat):
    seed.createOrReplaceTempView("seed_tr1")
    S.execute(spark, "CREATE TABLE ttr OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_tr1", cat)
    before = _rows(S.execute(spark, "SELECT * FROM ttr", cat))
    assert before
    r = S.execute(spark, "TRUNCATE TABLE ttr", cat)
    assert r["status"] == "truncated" and r["version"] == 2
    got = S.execute(spark, "SELECT * FROM ttr", cat)
    assert got.count() == 0
    # schema survives the empty state (same columns, same order)
    assert got.columns == ["event_id", "event_type", "cents"]
    # the commit is labeled in the audit trail
    hist = S.execute(spark, "DESCRIBE HISTORY ttr", cat)
    assert [h["op"] for h in hist][-1] == "truncate"
    # old versions stay readable + RESTORE undoes it exactly
    old = S.execute(spark, "SELECT * FROM ttr VERSION AS OF 1", cat)
    assert _rows(old) == before
    S.execute(spark, "RESTORE TABLE ttr TO VERSION AS OF 1", cat)
    assert _rows(S.execute(spark, "SELECT * FROM ttr", cat)) == before


def test_truncate_then_insert_flat(spark, seed, cat):
    seed.createOrReplaceTempView("seed_tr2")
    S.execute(spark, "CREATE TABLE tti OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_tr2 WHERE event_id % 2 = 0",
              cat)
    S.execute(spark, "TRUNCATE TABLE tti", cat)
    S.execute(spark, "INSERT INTO tti SELECT * FROM seed_tr2 "
                     "WHERE event_id % 2 = 1", cat)
    got = S.execute(spark, "SELECT * FROM tti", cat)
    assert _rows(got) == _rows(seed.where(F.col("event_id") % 2 == 1))


def test_truncate_materializes_pending_delete_vectors(spark, seed, cat):
    seed.createOrReplaceTempView("seed_tr3")
    S.execute(spark, "CREATE TABLE tdv OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_tr3", cat)
    S.execute(spark, "DELETE FROM tdv WHERE event_id % 5 = 0", cat)
    S.execute(spark, "TRUNCATE TABLE tdv", cat)
    # a later insert of the once-deleted residue class is visible:
    # truncate cleared the vectors along with the rows
    S.execute(spark, "INSERT INTO tdv SELECT * FROM seed_tr3 "
                     "WHERE event_id % 5 = 0", cat)
    got = S.execute(spark, "SELECT * FROM tdv", cat)
    assert _rows(got) == _rows(seed.where(F.col("event_id") % 5 == 0))


def test_truncate_bucketed_keeps_layout(spark, seed, cat):
    seed.createOrReplaceTempView("seed_tr4")
    S.execute(spark, "CREATE TABLE tbk OPTIONS (key='event_id', "
                     "buckets=8) AS SELECT * FROM seed_tr4", cat)
    S.execute(spark, "TRUNCATE TABLE tbk", cat)
    path = cat.get("tbk")["path"]
    m = V._manifest(path, V.current_version(path))
    assert m["bucket_key"] == "event_id" and m["n_buckets"] == 8
    assert m["buckets"] == {}
    assert S.execute(spark, "SELECT * FROM tbk", cat).count() == 0
    # post-truncate DML rides the bucketed path unchanged
    S.execute(spark, "INSERT INTO tbk SELECT * FROM seed_tr4 "
                     "WHERE event_id % 3 = 0", cat)
    S.execute(spark, (
        "MERGE INTO tbk USING (SELECT event_id, event_type, "
        "cents + 7 AS cents FROM seed_tr4 WHERE event_id % 6 = 0) "
        "ON tbk.event_id = event_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"), cat)
    want = seed.where((F.col("event_id") % 3 == 0)
                      & (F.col("event_id") % 6 != 0)).unionByName(
        seed.where(F.col("event_id") % 6 == 0)
            .withColumn("cents", F.col("cents") + 7))
    got = S.execute(spark, "SELECT * FROM tbk", cat)
    assert _rows(got) == _rows(want)


def test_truncate_guards(spark, seed, cat):
    seed.createOrReplaceTempView("seed_tr5")
    S.execute(spark, "CREATE TABLE tg OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_tr5", cat)
    S.execute(spark, (
        "CREATE MATERIALIZED VIEW tgv AS SELECT event_type, "
        "COUNT(*) AS n FROM tg GROUP BY event_type"), cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, "TRUNCATE TABLE tgv", cat)  # a view, not a table
    with pytest.raises(S.SqlError):
        S.execute(spark, "TRUNCATE TABLE tg KEEP 2", cat)  # trailing
    with pytest.raises(S.SqlError):
        S.execute(spark, "TRUNCATE TABLE nosuch", cat)
