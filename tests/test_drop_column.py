"""versioned.drop_column (metadata-only logical drop) and its SQL
surface: read projection, commit carry, drift guard on re-add, time
travel, RESTORE resurrection, OPTIMIZE materialization, guards."""

import os

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V


@pytest.fixture()
def tbl(spark, events, tmp_path):
    path = str(tmp_path / "t")
    df = events.limit(200).select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    V.create(spark, path, df)
    return path, df


def test_drop_column_metadata_only(spark, tbl):
    path, df = tbl
    v1 = V.current_version(path)
    v2 = V.drop_column(spark, path, "cents")
    assert v2 == v1 + 1
    # O(1): no new data segment was written
    assert V.history(path)[-1]["op"] == "drop-column"
    got = V.read(spark, path)
    assert "cents" not in got.columns
    assert got.count() == 200
    # time travel below the drop still shows the column
    assert "cents" in V.read(spark, path, v1).columns


def test_drop_column_survives_appends_and_deletes(spark, tbl):
    path, df = tbl
    V.drop_column(spark, path, "cents")
    V.append(spark, path, df.drop("cents").limit(10).withColumn(
        "event_id", F.col("event_id") + 10_000_000))
    V.delete_rows(spark, path,
                  df.select("event_id").limit(5), "event_id")
    got = V.read(spark, path)
    assert "cents" not in got.columns  # carry on append AND delete
    assert got.count() == 205
    # re-adding the dropped name is refused (silent black hole)
    with pytest.raises(V.SchemaDriftError, match="dropped"):
        V.append(spark, path, df.limit(1))


def test_drop_column_restore_resurrects(spark, tbl):
    path, df = tbl
    v1 = V.current_version(path)
    V.drop_column(spark, path, "cents")
    V.restore(spark, path, v1)
    got = V.read(spark, path)
    assert "cents" in got.columns
    # and the table accepts the column again after the restore
    V.append(spark, path, df.limit(1).withColumn(
        "event_id", F.col("event_id") + 20_000_000))


def test_drop_column_compact_materializes(spark, tbl):
    path, df = tbl
    V.drop_column(spark, path, "cents")
    V.compact(spark, path)
    m = V._manifest(path, V.current_version(path))
    assert "hidden_cols" not in m or not m["hidden_cols"]
    assert "cents" not in m.get("col_types", {})
    # physically gone: raw segment read has no cents column
    seg = m["segments"][0]
    raw = spark.read.parquet(os.path.join(path, seg))
    assert "cents" not in raw.columns


def test_drop_column_guards(spark, tbl):
    path, df = tbl
    with pytest.raises(ValueError, match="no column"):
        V.drop_column(spark, path, "nope")
    V.delete_rows(spark, path, df.select("event_id").limit(3),
                  "event_id")
    with pytest.raises(ValueError, match="delete vectors key"):
        V.drop_column(spark, path, "event_id")
    V.compact(spark, path)  # materialize; key droppable again at V-layer
    V.drop_column(spark, path, "event_id")
    assert "event_id" not in V.read(spark, path).columns


def test_sql_alter_drop_column(spark, events, tmp_path):
    cat = S.Catalog(str(tmp_path / "cat"))
    events.limit(50).select(
        "event_id", "user_id", "event_type").createOrReplaceTempView(
        "dc_seed")
    S.execute(spark, "CREATE TABLE dct OPTIONS (key='event_id') AS "
                     "SELECT * FROM dc_seed", cat)
    out = S.execute(spark, "ALTER TABLE dct DROP COLUMN user_id", cat)
    assert out["status"] == "altered" and out["dropped"] == "user_id"
    got = S.execute(spark, "SELECT * FROM dct", cat)
    assert set(got.columns) == {"event_id", "event_type"}
    d = S.execute(spark, "DESCRIBE dct", cat)
    assert "user_id" not in d["col_types"]
    # INSERT aligns to the post-drop schema
    S.execute(spark, "INSERT INTO dct VALUES (991, 'x')", cat)
    with pytest.raises(S.SqlError, match="row-identity"):
        S.execute(spark, "ALTER TABLE dct DROP COLUMN event_id", cat)
    # dependent view blocks the drop
    S.execute(spark, ("CREATE MATERIALIZED VIEW dcv AS SELECT "
                      "event_type, COUNT(*) AS n FROM dct "
                      "GROUP BY event_type"), cat)
    with pytest.raises(S.SqlError, match="dcv"):
        S.execute(spark, "ALTER TABLE dct DROP COLUMN event_type", cat)
