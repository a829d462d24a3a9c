"""CHECK constraints (versioned.add/drop_constraint + ALTER TABLE
... CONSTRAINT): existing-data validation at ADD, inline write-job
enforcement on every later batch (INSERT / UPDATE / MERGE / COPY /
overwrite, both layouts), NULL-passes semantics, and carry-through
commits."""

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
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))


def _mk(spark, seed, cat, name, extra_opts=""):
    seed.createOrReplaceTempView(f"seed_{name}")
    S.execute(spark, f"CREATE TABLE {name} OPTIONS (key='event_id'"
                     f"{extra_opts}) AS SELECT * FROM seed_{name}", cat)


def test_add_validates_existing_and_insert_enforced(spark, seed, cat):
    _mk(spark, seed, cat, "ck1")
    # existing data violates -> refused with the violation count
    with pytest.raises(S.SqlError) as ei:
        S.execute(spark, "ALTER TABLE ck1 ADD CONSTRAINT pos "
                         "CHECK (cents > 100000000)", cat)
    assert "violate" in str(ei.value)
    r = S.execute(spark, "ALTER TABLE ck1 ADD CONSTRAINT pos "
                         "CHECK (cents >= 0)", cat)
    assert r["added_constraint"] == {"pos": "cents >= 0"}
    d = S.execute(spark, "DESCRIBE ck1", cat)
    assert d["constraints"] == {"pos": "cents >= 0"}
    # a violating INSERT fails IN the write job and commits nothing
    v_before = V.current_version(cat.get("ck1")["path"])
    with pytest.raises(Exception) as ei:
        S.execute(spark, "INSERT INTO ck1 VALUES (9999999, 'x', -5)",
                  cat)
    assert "pos" in str(ei.value)
    assert V.current_version(cat.get("ck1")["path"]) == v_before
    # a clean INSERT passes
    S.execute(spark, "INSERT INTO ck1 VALUES (9999999, 'x', 5)", cat)
    got = S.execute(spark, "SELECT cents FROM ck1 WHERE "
                           "event_id = 9999999", cat)
    assert got.collect()[0][0] == 5


def test_update_merge_overwrite_enforced_bucketed(spark, seed, cat):
    _mk(spark, seed, cat, "ck2", ", buckets=4")
    S.execute(spark, "ALTER TABLE ck2 ADD CONSTRAINT cap "
                     "CHECK (cents >= 0)", cat)
    with pytest.raises(Exception):
        S.execute(spark, "UPDATE ck2 SET cents = -999999 "
                         "WHERE event_id % 2 = 0", cat)
    with pytest.raises(Exception):
        S.execute(spark, (
            "MERGE INTO ck2 USING (SELECT event_id, event_type, "
            "cents - 9999999 AS cents FROM seed_ck2) "
            "ON ck2.event_id = event_id "
            "WHEN MATCHED THEN UPDATE SET *"), cat)
    with pytest.raises(Exception):
        S.execute(spark, "INSERT OVERWRITE ck2 SELECT event_id, "
                         "event_type, cents - 9999999 AS cents "
                         "FROM seed_ck2", cat)
    # nothing above committed; clean DML still flows
    S.execute(spark, "UPDATE ck2 SET cents = 1 WHERE event_id % 2 = 0",
              cat)
    n = S.execute(spark, "SELECT count(*) AS n FROM ck2 WHERE "
                         "cents = 1", cat).collect()[0]["n"]
    assert n == seed.where(F.col("event_id") % 2 == 0).count()


def test_null_passes_and_drop_constraint(spark, seed, cat):
    _mk(spark, seed, cat, "ck3")
    S.execute(spark, "ALTER TABLE ck3 ADD CONSTRAINT et "
                     "CHECK (length(event_type) > 1)", cat)
    # NULL predicate = unknown = satisfied (SQL CHECK semantics)
    S.execute(spark, "INSERT INTO ck3 VALUES (8888888, NULL, 7)", cat)
    assert S.execute(spark, "SELECT * FROM ck3 WHERE event_id = "
                            "8888888", cat).count() == 1
    # duplicate name refused; drop then re-add allowed
    with pytest.raises(S.SqlError):
        S.execute(spark, "ALTER TABLE ck3 ADD CONSTRAINT et "
                         "CHECK (1 = 1)", cat)
    S.execute(spark, "ALTER TABLE ck3 DROP CONSTRAINT et", cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, "ALTER TABLE ck3 DROP CONSTRAINT et", cat)
    S.execute(spark, "INSERT INTO ck3 VALUES (8888889, 'z', 7)", cat)


def test_constraints_survive_unrelated_commits(spark, seed, cat):
    _mk(spark, seed, cat, "ck4")
    S.execute(spark, "ALTER TABLE ck4 ADD CONSTRAINT pos "
                     "CHECK (cents >= 0)", cat)
    # churn: DML + OPTIMIZE + ZORDER + ANALYZE all carry the app
    # namespace forward
    S.execute(spark, "DELETE FROM ck4 WHERE event_id % 5 = 0", cat)
    S.execute(spark, "OPTIMIZE ck4", cat)
    S.execute(spark, "ANALYZE TABLE ck4", cat)
    assert S.execute(spark, "DESCRIBE ck4", cat)["constraints"] == \
        {"pos": "cents >= 0"}
    with pytest.raises(Exception):
        S.execute(spark, "INSERT INTO ck4 VALUES (1, 'a', -1)", cat)
    # bad expression refused cleanly
    with pytest.raises(S.SqlError):
        S.execute(spark, "ALTER TABLE ck4 ADD CONSTRAINT bad "
                         "CHECK (no_such_col > 0)", cat)
