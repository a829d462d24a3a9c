"""COPY FROM / COPY TO (sql frontend): distributed file ingest into
versioned tables (schemaful csv/ndjson scan + append commit, layout
dispatched) and export (optional Hive partition layout). Parity
oracle: the frame that produced the file."""

import os

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S


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


def test_copy_from_csv_flat(spark, seed, cat, tmp_path):
    src = str(tmp_path / "in_csv")
    seed.write.option("header", "true").csv(src)
    S.execute(spark, "CREATE TABLE c1 (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    r = S.execute(spark, f"COPY c1 FROM '{src}' OPTIONS "
                         f"(format='csv', header=true)", cat)
    assert r["status"] == "copied" and r["format"] == "csv"
    got = S.execute(spark, "SELECT * FROM c1", cat)
    assert _rows(got) == _rows(seed)


def test_copy_from_ndjson_bucketed(spark, seed, cat, tmp_path):
    src = str(tmp_path / "in_json")
    seed.write.json(src)
    S.execute(spark, "CREATE TABLE c2 (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id', "
                     "buckets=4)", cat)
    S.execute(spark, f"COPY c2 FROM '{src}' OPTIONS "
                     f"(format='ndjson')", cat)
    got = S.execute(spark, "SELECT * FROM c2", cat)
    assert _rows(got) == _rows(seed)
    # the ingest landed bucketed: post-copy key-equi DML stays O(matched)
    S.execute(spark, "DELETE FROM c2 WHERE event_id % 2 = 0", cat)
    assert _rows(S.execute(spark, "SELECT * FROM c2", cat)) == \
        _rows(seed.where(F.col("event_id") % 2 == 1))


def test_copy_from_parquet_drift_guard(spark, seed, cat, tmp_path):
    src = str(tmp_path / "in_pq")
    seed.withColumn("cents", F.col("cents").cast("string")) \
        .write.parquet(src)
    S.execute(spark, "CREATE TABLE c3 (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, f"COPY c3 FROM '{src}'", cat)


def test_copy_to_partitioned_parquet(spark, seed, cat, tmp_path):
    seed.createOrReplaceTempView("seed_cp1")
    S.execute(spark, "CREATE TABLE c4 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cp1", cat)
    dst = str(tmp_path / "out_pq")
    r = S.execute(spark, f"COPY c4 TO '{dst}' OPTIONS "
                         f"(partition_by='event_type')", cat)
    assert r["partition_by"] == ["event_type"]
    # Hive-style layout: one directory per partition value
    assert any(d.startswith("event_type=") for d in os.listdir(dst))
    back = spark.read.parquet(dst).select("event_id", "event_type",
                                          "cents")
    assert _rows(back) == _rows(seed)


def test_copy_query_to_csv_roundtrip(spark, seed, cat, tmp_path):
    seed.createOrReplaceTempView("seed_cp2")
    S.execute(spark, "CREATE TABLE c5 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cp2", cat)
    dst = str(tmp_path / "out_csv")
    S.execute(spark, f"COPY (SELECT event_id, cents FROM c5 WHERE "
                     f"event_id % 3 = 0) TO '{dst}' OPTIONS "
                     f"(format='csv', header=true)", cat)
    back = spark.read.schema("event_id bigint, cents bigint") \
        .option("header", "true").csv(dst)
    assert _rows(back) == _rows(
        seed.where(F.col("event_id") % 3 == 0).select("event_id",
                                                      "cents"))


def test_copy_to_refuses_clobber_unless_overwrite(spark, seed, cat,
                                                  tmp_path):
    seed.limit(5).createOrReplaceTempView("seed_cp3")
    S.execute(spark, "CREATE TABLE c6 AS SELECT * FROM seed_cp3", cat)
    dst = str(tmp_path / "out_once")
    S.execute(spark, f"COPY c6 TO '{dst}'", cat)
    with pytest.raises(S.SqlError):
        S.execute(spark, f"COPY c6 TO '{dst}'", cat)
    S.execute(spark, f"COPY c6 TO '{dst}' OPTIONS (overwrite=true)",
              cat)
    assert spark.read.parquet(dst).count() == 5


def test_copy_guards(spark, seed, cat, tmp_path):
    seed.limit(5).createOrReplaceTempView("seed_cp4")
    S.execute(spark, "CREATE TABLE c7 OPTIONS (key='event_id') AS "
                     "SELECT * FROM seed_cp4", cat)
    S.execute(spark, "CREATE MATERIALIZED VIEW c7v AS SELECT "
                     "event_type, COUNT(*) AS n FROM c7 GROUP BY "
                     "event_type", cat)
    src = str(tmp_path / "guard_pq")
    seed.limit(5).write.parquet(src)
    with pytest.raises(S.SqlError):  # COPY FROM into a view
        S.execute(spark, f"COPY c7v FROM '{src}'", cat)
    with pytest.raises(S.SqlError):  # unknown format
        S.execute(spark, f"COPY c7 FROM '{src}' OPTIONS "
                         f"(format='orc2')", cat)
    with pytest.raises(S.SqlError):  # query source only exports
        S.execute(spark, f"COPY (SELECT * FROM c7) FROM '{src}'", cat)
    with pytest.raises(S.SqlError):  # bad partition column
        S.execute(spark, f"COPY c7 TO '{tmp_path / 'x'}' OPTIONS "
                         f"(partition_by='nope')", cat)
    with pytest.raises(S.SqlError):  # unquoted path
        S.execute(spark, "COPY c7 TO outdir", cat)


def test_copy_from_malformed_csv_fails_load(spark, seed, cat,
                                            tmp_path):
    """ADVICE r11: 'a malformed value fails the load, not a later
    query' must be literal — FAILFAST, not PERMISSIVE null-ing (NULLs
    would even pass CHECK constraints under unknown-is-satisfied)."""
    src = str(tmp_path / "bad_csv")
    os.makedirs(src)
    with open(os.path.join(src, "part-0.csv"), "w") as f:
        f.write("event_id,event_type,cents\n"
                "1,click,100\n"
                "2,view,NOT_A_NUMBER\n")
    S.execute(spark, "CREATE TABLE cbad (event_id BIGINT, event_type "
                     "STRING, cents BIGINT) OPTIONS (key='event_id')",
              cat)
    with pytest.raises(Exception) as ex:
        S.execute(spark, f"COPY cbad FROM '{src}' OPTIONS "
                         f"(format='csv', header=true)", cat)
    assert "Malformed" in str(ex.value) or "FAILFAST" in str(ex.value)
    # nothing committed: the table is still at its empty v1
    assert S.execute(spark, "SELECT COUNT(*) AS n FROM cbad",
                     cat).first()["n"] == 0


def test_copy_stream_malformed_ndjson_fails_batch(spark, seed, cat,
                                                  tmp_path):
    """The continuous-ingest twin of the FAILFAST contract: a
    malformed value fails the micro-batch (stream dies loudly), and
    the exactly-once sink commits nothing for it."""
    import time as _t

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    S.execute(spark, "CREATE TABLE sbad (event_id BIGINT, cents "
                     "BIGINT) OPTIONS (key='event_id')", cat)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write('{"event_id": 1, "cents": "garbage"}\n')
    r = S.execute(spark, f"START COPY STREAM FROM '{src}' INTO sbad "
                         f"OPTIONS (format='ndjson')", cat)
    assert r["status"] == "copy_stream_started"
    from rclip_server_spark.sql._streams import (_STREAMS,
                                                 _copy_stream_key)

    q = _STREAMS[_copy_stream_key(cat, "sbad")]
    # the poisoned batch must kill the query (not silently commit
    # NULLs); surface within a bounded wait
    deadline = _t.time() + 60
    while q.isActive and _t.time() < deadline:
        _t.sleep(0.5)
    assert not q.isActive
    err = q.exception()
    assert err is not None
    assert S.execute(spark, "SELECT COUNT(*) AS n FROM sbad",
                     cat).first()["n"] == 0
    _STREAMS.pop(_copy_stream_key(cat, "sbad"), None)
