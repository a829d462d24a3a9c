"""Zone maps on the BUCKETED layout (round 11): per-segment min/max
recorded at every bucketed commit, manifest-level segment skipping via
read_bucketed_pruned — the second pruning layer on top of bucket
subsetting (bucket hash answers key-equi questions; zone maps answer
RANGE questions, e.g. a time window over a user-bucketed table)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rclip_server_spark.sources import versioned as V


def _mk(spark, path):
    """4-bucket table, two range-disjoint commits: create rows with
    val in [0, 990], append rows with val in [10000, 10990]."""
    lo = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id INT, val INT")
    hi = spark.createDataFrame(
        [(100 + i, 10000 + i * 10) for i in range(100)],
        "id INT, val INT")
    V.create_bucketed(spark, str(path), lo, key="id", n_buckets=4,
                      stat_cols=["val"])
    V.append_bucketed(spark, str(path), hi)
    return str(path), lo, hi


def _survivors(t, ranges):
    m = V._manifest(t, V.current_version(t))
    stats = m.get("seg_stats", {})
    return [s for ss in m["buckets"].values() for s in ss
            if V.zone_survives(stats.get(s, {}), ranges)]


def test_pruned_read_skips_disjoint_segments(spark, tmp_path):
    t, lo, hi = _mk(spark, tmp_path / "t")
    m = V._manifest(t, V.current_version(t))
    total = sum(len(ss) for ss in m["buckets"].values())
    # every segment carries stats
    assert set(m["seg_stats"]) == {s for ss in m["buckets"].values()
                                   for s in ss}
    ranges = {"val": (0, 500)}
    keep = _survivors(t, ranges)
    assert 0 < len(keep) < total  # the hi-batch segments are skipped
    got = sorted(r.id for r in
                 V.read_bucketed_pruned(spark, t, ranges).collect())
    want = sorted(r.id for r in lo.where("val <= 500").collect())
    assert got == want  # no false prune, residual filter exact
    # a range nothing matches: zero-row read with the right schema
    none = V.read_bucketed_pruned(spark, t, {"val": (90000, None)})
    assert none.count() == 0 and none.columns == ["id", "val"]


def test_stats_survive_dml_and_rewrites(spark, tmp_path):
    t, lo, hi = _mk(spark, tmp_path / "t")
    # delete vector: stats carried, pruned read applies the vector
    V.delete_rows(spark, t, [5], "id")
    got = sorted(r.id for r in V.read_bucketed_pruned(
        spark, t, {"val": (0, 500)}).collect())
    assert 5 not in got and got == [i for i in range(51) if i != 5]
    # upsert rewrites touched buckets: fresh stats for new segments
    up = spark.createDataFrame([(3, 70000)], "id INT, val INT")
    V.upsert_bucketed(spark, t, up)
    m = V._manifest(t, V.current_version(t))
    assert set(m["seg_stats"]) >= {s for ss in m["buckets"].values()
                                   for s in ss}
    assert [r.id for r in V.read_bucketed_pruned(
        spark, t, {"val": (60000, None)}).collect()] == [3]
    # compact folds + recomputes; zorder refreshes every segment
    V.compact_bucketed(spark, t, min_segments=2)
    V.cluster_zorder_bucketed(spark, t, "id", "val")
    m = V._manifest(t, V.current_version(t))
    assert set(m["seg_stats"]) == {s for ss in m["buckets"].values()
                                   for s in ss}
    got = sorted(r.id for r in V.read_bucketed_pruned(
        spark, t, {"val": (0, 500)}).collect())
    assert got == [i for i in range(51) if i not in (3, 5)]


def test_convert_to_bucketed_carries_stat_cols(spark, tmp_path):
    flat = str(tmp_path / "flat")
    V.create(spark, flat, spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "id INT, val INT"),
        stat_cols=["val"])
    V.convert_to_bucketed(spark, flat, key="id", n_buckets=4)
    m = V._manifest(flat, V.current_version(flat))
    assert m["stat_cols"] == ["val"]
    assert set(m["seg_stats"]) == {s for ss in m["buckets"].values()
                                   for s in ss}
    got = sorted(r.id for r in V.read_bucketed_pruned(
        spark, flat, {"val": (100, 200)}).collect())
    assert got == [10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20]


def test_stat_col_drop_refused_on_bucketed(spark, tmp_path):
    t, _, _ = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="zone-map"):
        V.drop_column(spark, t, "val")


def test_zorder_by_declared_unwritten_column(spark, tmp_path):
    """Third-review fixes: ZORDER BY a metadata-only added column
    reconciles (NULL z-component) instead of failing resolution, and
    column names resolve case-insensitively like every other verb."""
    t, lo, hi = _mk(spark, tmp_path / "t")
    V.add_column(spark, t, "ts", "bigint")
    v = V.cluster_zorder_bucketed(spark, t, "TS", "VAL")
    assert v > 0
    got = sorted(r.id for r in V.read_bucketed(spark, t).collect())
    assert got == list(range(200))
    with pytest.raises(ValueError, match="no column"):
        V.cluster_zorder_bucketed(spark, t, "nope", "val")


def test_stats_single_job_covers_every_new_segment(spark, tmp_path):
    """Third-review fix: a full-rewrite commit computes ALL new
    segments' stats in one grouped aggregate — verified by the stats
    being present and exact for every bucket after a zorder pass."""
    t, lo, hi = _mk(spark, tmp_path / "t")
    V.cluster_zorder_bucketed(spark, t, "id", "val")
    m = V._manifest(t, V.current_version(t))
    segs = {s for ss in m["buckets"].values() for s in ss}
    assert set(m["seg_stats"]) == segs
    import os as _os
    for s in segs:
        seg = spark.read.parquet(_os.path.join(t, s))
        mn, mx = seg.agg(F.min("val"), F.max("val")).first()
        assert m["seg_stats"][s]["val"]["min"] == mn
        assert m["seg_stats"][s]["val"]["max"] == mx


def test_cdc_stream_survives_add_column(spark, tmp_path):
    """Third-review fix: the Arrow CDC stream source accepts the
    metadata-only add-column commit (it shares versioned.APPEND_OPS
    now) instead of killing the query batch table_changes accepts."""
    from rclip_server_spark.sources import cdc_stream as CS

    assert "add-column" in CS._APPEND_OPS
    assert "append-bucketed" in CS._APPEND_OPS
    assert "create-bucketed" in CS._APPEND_OPS
