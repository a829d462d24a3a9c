"""ANALYZE TABLE / DESCRIBE STATS (versioned.analyze sidecars):
one-pass table statistics with exact-NDV parity against direct
aggregation, staleness marking, and vacuum retention."""

import os

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V


@pytest.fixture()
def cat(tmp_path):
    return S.Catalog(str(tmp_path / "cat"))


@pytest.fixture()
def seed(events):
    return events.select(
        "event_id", "event_type", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))


def test_analyze_exact_matches_direct_agg(spark, seed, cat):
    seed.createOrReplaceTempView("seed_an1")
    S.execute(spark, "CREATE TABLE an1 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_an1", cat)
    r = S.execute(spark, "ANALYZE TABLE an1 EXACT", cat)
    want = seed.agg(
        F.count(F.lit(1)), F.countDistinct("event_type"),
        F.min("event_type"), F.max("event_type"),
        F.countDistinct("cents"), F.min("cents"), F.max("cents"),
    ).collect()[0]
    assert r["row_count"] == want[0]
    et = r["columns"]["event_type"]
    assert (et["ndv"], et["min"], et["max"]) == tuple(want[1:4])
    assert et["nulls"] == 0
    ce = r["columns"]["cents"]
    assert (ce["ndv"], ce["min"], ce["max"]) == tuple(want[4:7])
    # DESCRIBE STATS serves the sidecar, not-stale at the same head
    d = S.execute(spark, "DESCRIBE STATS an1", cat)
    assert d["stale"] is False and d["columns"] == r["columns"]


def test_analyze_staleness_and_columns_subset(spark, seed, cat):
    seed.createOrReplaceTempView("seed_an2")
    S.execute(spark, "CREATE TABLE an2 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_an2", cat)
    r = S.execute(spark, "ANALYZE TABLE an2 COLUMNS (cents) EXACT",
                  cat)
    assert list(r["columns"]) == ["cents"]
    S.execute(spark, "DELETE FROM an2 WHERE event_id % 2 = 0", cat)
    d = S.execute(spark, "DESCRIBE STATS an2", cat)
    assert d["stale"] is True  # data changed since the analyze
    # re-analyze reflects the delete-filtered state
    r2 = S.execute(spark, "ANALYZE TABLE an2 EXACT", cat)
    assert r2["row_count"] == seed.where(
        F.col("event_id") % 2 == 1).count()
    with pytest.raises(S.SqlError):
        S.execute(spark, "ANALYZE TABLE an2 COLUMNS (nope)", cat)


def test_analyze_bucketed_and_approx(spark, seed, cat):
    seed.createOrReplaceTempView("seed_an3")
    S.execute(spark, "CREATE TABLE an3 OPTIONS (key='event_id', "
                     "buckets=4) AS SELECT * FROM seed_an3", cat)
    r = S.execute(spark, "ANALYZE TABLE an3", cat)  # approx ndv
    exact = seed.select("user_id").distinct().count()
    got = r["columns"]["user_id"]["ndv"]
    assert abs(got - exact) / exact < 0.15  # HLL default error ~2-5%
    assert r["row_count"] == seed.count()


def test_analyze_never_run_and_vacuum_retention(spark, seed, cat):
    seed.limit(100).createOrReplaceTempView("seed_an4")
    S.execute(spark, "CREATE TABLE an4 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_an4", cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, "DESCRIBE STATS an4", cat)
    S.execute(spark, "ANALYZE TABLE an4 EXACT", cat)
    # churn + vacuum: the latest sidecar survives and stays servable
    S.execute(spark, "DELETE FROM an4 WHERE event_id % 3 = 0", cat)
    S.execute(spark, "OPTIMIZE an4", cat)
    S.execute(spark, "ANALYZE TABLE an4 EXACT", cat)
    S.execute(spark, "DELETE FROM an4 WHERE event_id % 5 = 0", cat)
    S.execute(spark, "VACUUM an4 KEEP 1", cat)
    path = cat.get("an4")["path"]
    sidecars = sorted(os.listdir(os.path.join(path, "_stats")))
    assert sidecars == ["v3.json"]  # v1's reaped, latest kept
    d = S.execute(spark, "DESCRIBE STATS an4", cat)
    assert d["analyzed_version"] == 3 and d["stale"] is True
