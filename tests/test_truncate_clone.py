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


# ===========================================================================
# Shallow CLONE (versioned.clone + CREATE TABLE c CLONE t)
# ===========================================================================


def _seg_dirs(path):
    return sorted(d for d in os.listdir(path)
                  if d.startswith(("seg-", "del-")))


import os  # noqa: E402


def test_clone_flat_zero_copy_and_divergence(spark, seed, cat):
    seed.createOrReplaceTempView("seed_cl1")
    S.execute(spark, "CREATE TABLE src1 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl1", cat)
    # pending delete vector at clone time must carry over WITH scope
    S.execute(spark, "DELETE FROM src1 WHERE event_id % 7 = 0", cat)
    r = S.execute(spark, "CREATE TABLE cl1 CLONE src1", cat)
    assert r["status"] == "created" and r["cloned_from"] == "src1"
    want = seed.where(F.col("event_id") % 7 != 0)
    assert _rows(S.execute(spark, "SELECT * FROM cl1", cat)) == \
        _rows(want)
    # ZERO data copied: the clone directory owns no segments
    assert _seg_dirs(cat.get("cl1")["path"]) == []
    # writes diverge both ways
    S.execute(spark, "DELETE FROM cl1 WHERE event_id % 2 = 0", cat)
    S.execute(spark, "UPDATE src1 SET cents = cents + 1 "
                     "WHERE event_id % 2 = 1", cat)
    assert _rows(S.execute(spark, "SELECT * FROM cl1", cat)) == \
        _rows(want.where(F.col("event_id") % 2 == 1))
    assert _rows(S.execute(spark, "SELECT * FROM src1", cat)) == _rows(
        want.withColumn("cents", F.when(F.col("event_id") % 2 == 1,
                                        F.col("cents") + 1)
                        .otherwise(F.col("cents"))))


def test_clone_version_as_of(spark, seed, cat):
    seed.createOrReplaceTempView("seed_cl2")
    S.execute(spark, "CREATE TABLE src2 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl2", cat)
    S.execute(spark, "DELETE FROM src2 WHERE event_id % 3 = 0", cat)
    S.execute(spark, "CREATE TABLE cl2 CLONE src2 VERSION AS OF 1",
              cat)
    assert _rows(S.execute(spark, "SELECT * FROM cl2", cat)) == \
        _rows(seed)


def test_clone_bucketed_keeps_layout_and_dml(spark, seed, cat):
    seed.createOrReplaceTempView("seed_cl3")
    S.execute(spark, "CREATE TABLE src3 OPTIONS (key='event_id', "
                     "buckets=8) AS SELECT * FROM seed_cl3", cat)
    S.execute(spark, "CREATE TABLE cl3 CLONE src3", cat)
    p = cat.get("cl3")["path"]
    m = V._manifest(p, V.current_version(p))
    assert m["bucket_key"] == "event_id" and m["n_buckets"] == 8
    # bucketed conditional DML rides the clone unchanged
    S.execute(spark, (
        "MERGE INTO cl3 t USING (SELECT event_id, event_type, "
        "cents * 2 AS c2 FROM seed_cl3 WHERE event_id % 4 = 0) AS s "
        "ON t.event_id = s.event_id "
        "WHEN MATCHED THEN UPDATE SET cents = s.c2"), cat)
    want = seed.withColumn(
        "cents", F.when(F.col("event_id") % 4 == 0,
                        F.col("cents") * 2).otherwise(F.col("cents")))
    assert _rows(S.execute(spark, "SELECT * FROM cl3", cat)) == \
        _rows(want)
    # the source never saw the merge
    assert _rows(S.execute(spark, "SELECT * FROM src3", cat)) == \
        _rows(seed)


def test_clone_survives_source_vacuum(spark, seed, cat):
    seed.createOrReplaceTempView("seed_cl4")
    S.execute(spark, "CREATE TABLE src4 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl4", cat)
    S.execute(spark, "CREATE TABLE cl4 CLONE src4", cat)
    # source rewrites + aggressive vacuum: the clone's pinned segments
    # must survive even though no kept SOURCE manifest references them
    S.execute(spark, "UPDATE src4 SET cents = 0 WHERE event_id % 2 = 0",
              cat)
    S.execute(spark, "OPTIMIZE src4", cat)
    S.execute(spark, "VACUUM src4 KEEP 1", cat)
    assert _rows(S.execute(spark, "SELECT * FROM cl4", cat)) == \
        _rows(seed)
    # drop the clone -> the ref dies -> the next vacuum reaps the
    # formerly pinned segments
    src_path = cat.get("src4")["path"]
    pinned_before = V._clone_pinned_segments(src_path)
    assert pinned_before  # the clone really was pinning something
    S.execute(spark, "DROP TABLE cl4", cat)
    V.vacuum(src_path, keep_last=1)
    assert V._clone_pinned_segments(src_path) == set()
    for s in pinned_before:
        assert not os.path.isdir(os.path.join(src_path, s))
    # the source itself is intact
    got = S.execute(spark, "SELECT * FROM src4", cat)
    assert got.count() == seed.count()


def test_clone_blocks_source_drop(spark, seed, cat):
    seed.limit(50).createOrReplaceTempView("seed_cl5")
    S.execute(spark, "CREATE TABLE src5 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl5", cat)
    S.execute(spark, "CREATE TABLE cl5 CLONE src5", cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, "DROP TABLE src5", cat)
    S.execute(spark, "DROP TABLE cl5", cat)
    S.execute(spark, "DROP TABLE src5", cat)  # now allowed


def test_clone_materializes_via_optimize(spark, seed, cat):
    seed.createOrReplaceTempView("seed_cl6")
    S.execute(spark, "CREATE TABLE src6 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl6", cat)
    S.execute(spark, "CREATE TABLE cl6 CLONE src6", cat)
    S.execute(spark, "OPTIMIZE cl6", cat)  # materialize: local segments
    assert _seg_dirs(cat.get("cl6")["path"])
    # once the clone's HISTORY drops the foreign refs, the source's
    # vacuum reclaims: vacuum the clone (drops the v1 manifest), then
    # vacuum the source
    src_path = cat.get("src6")["path"]
    S.execute(spark, "VACUUM cl6 KEEP 1", cat)
    assert V._clone_pinned_segments(src_path) == set()
    S.execute(spark, "TRUNCATE TABLE src6", cat)
    S.execute(spark, "VACUUM src6 KEEP 1", cat)
    # clone unaffected by the source's truncate + vacuum
    assert _rows(S.execute(spark, "SELECT * FROM cl6", cat)) == \
        _rows(seed)


def test_clone_guards(spark, seed, cat):
    seed.limit(20).createOrReplaceTempView("seed_cl7")
    S.execute(spark, "CREATE TABLE src7 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl7", cat)
    S.execute(spark, "CREATE MATERIALIZED VIEW v7 AS SELECT "
                     "event_type, COUNT(*) AS n FROM src7 "
                     "GROUP BY event_type", cat)
    with pytest.raises(S.SqlError):  # clone of a view
        S.execute(spark, "CREATE TABLE c CLONE v7", cat)
    with pytest.raises(S.SqlError):  # duplicate name
        S.execute(spark, "CREATE TABLE src7 CLONE src7", cat)
    with pytest.raises(S.SqlError):  # trailing tokens
        S.execute(spark, "CREATE TABLE c CLONE src7 EXTRA", cat)
    with pytest.raises(S.SqlError):  # bad version
        S.execute(spark, "CREATE TABLE c CLONE src7 VERSION AS OF 99",
                  cat)


def test_clone_carries_check_constraints(spark, seed, cat):
    """ADVICE r11: Delta CLONE copies table constraints — a clone of a
    constrained table must reject violating inserts, not silently
    bypass enforcement."""
    seed.limit(30).createOrReplaceTempView("seed_cl8")
    S.execute(spark, "CREATE TABLE src8 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl8", cat)
    S.execute(spark, "ALTER TABLE src8 ADD CONSTRAINT pos_cents "
                     "CHECK (cents >= 0)", cat)
    S.execute(spark, "CREATE TABLE cl8 CLONE src8", cat)
    with pytest.raises(Exception) as ex:
        S.execute(spark, "INSERT INTO cl8 VALUES "
                         "(999001, 'bad', -5)", cat)
    assert "pos_cents" in str(ex.value)
    # non-violating inserts still land
    S.execute(spark, "INSERT INTO cl8 VALUES (999002, 'ok', 7)", cat)
    got = S.execute(spark, "SELECT cents FROM cl8 WHERE "
                           "event_id = 999002", cat)
    assert [r["cents"] for r in got.collect()] == [7]
    # DESCRIBE shows the carried constraint
    d = S.execute(spark, "DESCRIBE cl8", cat)
    assert d["constraints"] == {"pos_cents": "cents >= 0"}


def test_clone_refuses_existing_destination(spark, seed, cat,
                                            tmp_path):
    """ADVICE r11: clone() claims the destination ROOT exclusively —
    a pre-existing directory must refuse up front, and a failed clone
    must never rmtree a directory it didn't create."""
    import os

    seed.limit(10).createOrReplaceTempView("seed_cl9")
    S.execute(spark, "CREATE TABLE src9 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl9", cat)
    src_path = cat.get("src9")["path"]
    dst = str(tmp_path / "precious")
    os.makedirs(dst)
    keep = os.path.join(dst, "user_data.txt")
    with open(keep, "w") as f:
        f.write("do not delete")
    with pytest.raises(FileExistsError):
        V.clone(src_path, dst)
    assert os.path.exists(keep)  # pre-existing contents untouched


def test_drop_allowed_after_clone_localized(spark, seed, cat):
    """ADVICE r11: the DROP guard walks clone manifests (vacuum's
    liveness rule) — a clone fully localized by OPTIMIZE + VACUUM no
    longer references the source's segments and releases the block."""
    seed.limit(40).createOrReplaceTempView("seed_cl10")
    S.execute(spark, "CREATE TABLE src10 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cl10", cat)
    S.execute(spark, "CREATE TABLE cl10 CLONE src10", cat)
    with pytest.raises(S.SqlError):  # still shares segments
        S.execute(spark, "DROP TABLE src10", cat)
    S.execute(spark, "OPTIMIZE cl10", cat)   # local segments
    with pytest.raises(S.SqlError):  # v1 manifest still names them
        S.execute(spark, "DROP TABLE src10", cat)
    S.execute(spark, "VACUUM cl10 KEEP 1", cat)  # drop old manifests
    S.execute(spark, "DROP TABLE src10", cat)    # now allowed
    # the localized clone still reads fine
    assert S.execute(spark, "SELECT COUNT(*) AS n FROM cl10",
                     cat).first()["n"] == 40
