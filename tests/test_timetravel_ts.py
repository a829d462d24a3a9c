"""TIMESTAMP AS OF time travel (reads + RESTORE) and VACUUM DRY RUN:
the timestamp resolves against the commit clock DESCRIBE HISTORY
reports (manifest mtime), and the dry run previews exactly what a
real vacuum then deletes."""

import os
import time

import pytest
from pyspark.sql import functions as F

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(tmp_path):
    return S.Catalog(str(tmp_path / "cat"))


def _mk_versions(spark, events, cat, name):
    """v1 = %2==0 slice, v2 = delete %4==0, v3 = insert %2==1 slice;
    manifest mtimes nudged 2s apart so timestamps order strictly."""
    ev = events.select("event_id", "event_type")
    ev.createOrReplaceTempView(f"seed_{name}")
    S.execute(spark, f"CREATE TABLE {name} OPTIONS (key='event_id') "
                     f"AS SELECT * FROM seed_{name} "
                     f"WHERE event_id % 2 = 0", cat)
    S.execute(spark, f"DELETE FROM {name} WHERE event_id % 4 = 0", cat)
    S.execute(spark, f"INSERT INTO {name} SELECT * FROM seed_{name} "
                     f"WHERE event_id % 2 = 1", cat)
    # separate the commit clock deterministically (commits can land
    # within one clock tick) — rewrites committed_at, the clock
    # TIMESTAMP AS OF actually resolves against
    path = cat.get(name)["path"]
    now = time.time()
    for i, v in enumerate(V._manifest_versions(path)):
        V._rewrite_commit_epoch(path, v, now - 100 + i * 10)
    return ev, path


def test_timestamp_as_of_read(spark, events, cat):
    ev, path = _mk_versions(spark, events, cat, "tt1")
    hist = S.execute(spark, "DESCRIBE HISTORY tt1", cat)
    ts2 = hist[1]["timestamp"]  # the post-DELETE commit
    got = S.execute(spark, f"SELECT * FROM tt1 TIMESTAMP AS OF "
                           f"'{ts2}'", cat)
    want = ev.where((F.col("event_id") % 2 == 0)
                    & (F.col("event_id") % 4 != 0))
    assert _rows(got) == _rows(want)
    # before v1 existed -> clean error
    with pytest.raises(S.SqlError):
        S.execute(spark, "SELECT * FROM tt1 TIMESTAMP AS OF "
                         "'1999-01-01T00:00:00+00:00'", cat)
    # a timestamp after the last commit resolves to head
    head = S.execute(spark, "SELECT * FROM tt1 TIMESTAMP AS OF "
                            "'2999-01-01T00:00:00+00:00'", cat)
    assert _rows(head) == _rows(S.execute(spark, "SELECT * FROM tt1",
                                          cat))


def test_restore_to_timestamp(spark, events, cat):
    ev, path = _mk_versions(spark, events, cat, "tt2")
    hist = S.execute(spark, "DESCRIBE HISTORY tt2", cat)
    r = S.execute(spark, f"RESTORE TABLE tt2 TO TIMESTAMP AS OF "
                         f"'{hist[0]['timestamp']}'", cat)
    assert r["restored_to"] == 1
    assert _rows(S.execute(spark, "SELECT * FROM tt2", cat)) == \
        _rows(ev.where(F.col("event_id") % 2 == 0))


def test_vacuum_dry_run_previews_exactly(spark, events, cat):
    _, path = _mk_versions(spark, events, cat, "tt3")
    S.execute(spark, "OPTIMIZE tt3", cat)
    before_manifests = V._manifest_versions(path)
    r = S.execute(spark, "VACUUM tt3 KEEP 1 DRY RUN", cat)
    assert r["status"] == "dry_run"
    preview = sorted(r["segments"])
    assert preview  # the optimize left folded-away segments behind
    # nothing was deleted by the preview
    assert V._manifest_versions(path) == before_manifests
    for s in preview:
        assert os.path.isdir(os.path.join(path, s))
    # the real run deletes exactly the previewed set
    r2 = S.execute(spark, "VACUUM tt3 KEEP 1", cat)
    assert r2["deleted_segments"] == len(preview)
    for s in preview:
        assert not os.path.isdir(os.path.join(path, s))


def test_commit_clock_survives_mtime_loss(spark, events, cat, tmp_path):
    """ADVICE r11: the commit clock lives INSIDE the manifest
    (committed_at), so copying/rsyncing the table directory without
    preserving mtimes cannot rewrite history — TIMESTAMP AS OF
    resolves to the same versions before and after the copy."""
    import shutil

    ev, path = _mk_versions(spark, events, cat, "tt4")
    hist = S.execute(spark, "DESCRIBE HISTORY tt4", cat)
    ts2 = hist[1]["timestamp"]
    want = _rows(S.execute(
        spark, f"SELECT * FROM tt4 TIMESTAMP AS OF '{ts2}'", cat))
    # simulate a metadata-losing copy: fresh mtimes on every manifest
    # (copy=shutil.copy, not copy2), all set to NOW — under the old
    # mtime clock every version would collide at the copy instant
    dst = str(tmp_path / "tt4_copy")
    shutil.copytree(path, dst, copy_function=shutil.copy)
    now = time.time()
    for v in V._manifest_versions(dst):
        os.utime(V._snap_path(dst, v), (now, now))
    assert V.version_at_timestamp(dst, ts2) == \
        V.version_at_timestamp(path, ts2)
    hist2 = V.history(dst)
    assert [h["timestamp"] for h in hist2] == \
        [h["timestamp"] for h in V.history(path)]
    got = V.read(spark, dst, V.version_at_timestamp(dst, ts2))
    assert _rows(got.select("event_id", "event_type")) == want
