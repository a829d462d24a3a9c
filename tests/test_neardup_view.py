"""Maintained near-dup pairs view (sources/neardup_view.py): O(delta)
maintenance must land row-identically on the from-scratch pipeline
(operators/dedup.minhash_near_dup) after every interval shape —
append, delete, update — plus the graph-integration surface
(refresh_view dispatch, describe, cursor-safe vacuum, heal)."""

import pytest
from pyspark.sql import functions as F

from rclip_server_spark.operators import dedup
from rclip_server_spark.sources import matview as M
from rclip_server_spark.sources import neardup_view as ND
from rclip_server_spark.sources import versioned as V

THRESH = 0.6


def _docs(documents):
    return documents.select("doc_id", "text")


def _pairs_of(df):
    return sorted(
        tuple(r) for r in dedup.minhash_near_dup(
            df, threshold=THRESH).collect())


def _view_pairs(spark, vw):
    return sorted(
        tuple(r) for r in
        ND.read_near_dup_pairs_view(spark, vw).collect())


@pytest.fixture()
def nd(spark, documents, tmp_path):
    docs = _docs(documents)
    src = str(tmp_path / "docs")
    vw = str(tmp_path / "pairs")
    V.create(spark, src, docs.where(F.col("doc_id") % 3 != 2))
    ND.create_near_dup_pairs_view(spark, src, vw, key="doc_id",
                                  threshold=THRESH)
    return docs, src, vw


def test_create_matches_full_pipeline(spark, nd):
    docs, src, vw = nd
    assert _view_pairs(spark, vw) == _pairs_of(
        docs.where(F.col("doc_id") % 3 != 2))


def test_append_then_delete_intervals(spark, nd):
    docs, src, vw = nd
    V.append(spark, src, docs.where(F.col("doc_id") % 3 == 2))
    ND.refresh_near_dup_pairs_view(spark, vw, recompute_fraction=None)
    assert _view_pairs(spark, vw) == _pairs_of(docs)
    V.delete_rows(spark, src,
                  docs.where(F.col("doc_id") % 7 == 0).select("doc_id"),
                  "doc_id")
    ND.refresh_near_dup_pairs_view(spark, vw, recompute_fraction=None)
    assert _view_pairs(spark, vw) == _pairs_of(
        docs.where(F.col("doc_id") % 7 != 0))


def test_update_retracts_and_rediscovers(spark, nd):
    docs, src, vw = nd
    # rewrite a slice of docs with OTHER docs' text: their old pairs
    # must retract and their new pairs (to the donors) must appear
    donors = docs.where(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id")).alias("k"), F.col("text").alias("t"))
    victims = docs.where(F.col("doc_id") % 10 == 4).select(
        (F.col("doc_id")).alias("vk")).limit(20)
    upd = (victims.join(donors.limit(20)).limit(20)
           .select(F.col("vk").alias("doc_id"), F.col("t").alias("text")))
    upd = upd.persist()
    V.upsert(spark, src, upd, key="doc_id")
    ND.refresh_near_dup_pairs_view(spark, vw, recompute_fraction=None)
    final = V.read(spark, src)
    assert _view_pairs(spark, vw) == _pairs_of(final)
    upd.unpersist()


def test_refresh_view_dispatch_and_describe(spark, nd):
    docs, src, vw = nd
    V.append(spark, src, docs.where(F.col("doc_id") % 3 == 2))
    M.refresh_view(spark, vw)  # kind-dispatched, no function handle
    d = M.describe_view(vw)
    assert d["view_kind"] == "near_dup"
    assert d["fresh"] and d["sources"][0]["lag"] == 0
    assert M.view_base_tables(vw) == [src]
    assert _view_pairs(spark, vw) == _pairs_of(docs)


def test_noop_interval_keeps_version(spark, nd):
    docs, src, vw = nd
    v0 = V.current_version(vw)
    assert ND.refresh_near_dup_pairs_view(spark, vw) == v0


def test_vacuum_safely_clamps_to_pairs_cursor(spark, nd):
    docs, src, vw = nd
    V.append(spark, src, docs.where(F.col("doc_id") % 3 == 2))
    V.delete_rows(spark, src,
                  docs.where(F.col("doc_id") % 9 == 0).select("doc_id"),
                  "doc_id")
    # clamped vacuum must retain manifests back to the view's cursor
    M.vacuum_source_safely(src, keep_last=1, views=[vw])
    ND.refresh_near_dup_pairs_view(spark, vw, recompute_fraction=None)
    assert _view_pairs(spark, vw) == _pairs_of(
        docs.where(F.col("doc_id") % 9 != 0))


def test_heal_after_unsafe_vacuum(spark, nd):
    docs, src, vw = nd
    V.append(spark, src, docs.where(F.col("doc_id") % 3 == 2))
    V.vacuum(src, keep_last=1)  # reaps the cursor's manifest
    # forced-incremental (None): named failure; the SHIPPED default
    # (cost dispatch): self-heal recompute
    with pytest.raises(RuntimeError):
        ND.refresh_near_dup_pairs_view(spark, vw,
                                       recompute_fraction=None)
    ND.refresh_near_dup_pairs_view(spark, vw)
    assert _view_pairs(spark, vw) == _pairs_of(docs)


def test_pairs_view_under_cascade_stream(spark, nd):
    """Continuous maintenance: the cascade refresh stream dispatches
    the near_dup kind with no function handle (the spec holds the
    algorithm parameters), so a source commit ripples into the pair
    table while the stream runs."""
    import tempfile

    from rclip_server_spark.streaming import sink

    docs, src, vw = nd
    ckpt = tempfile.mkdtemp(prefix="nd_stream_ckpt_")
    q = sink.start_view_cascade_refresh_stream(spark, vw,
                                               checkpoint_dir=ckpt)
    try:
        V.append(spark, src, docs.where(F.col("doc_id") % 3 == 2))
        q.processAllAvailable()
    finally:
        q.stop()
    assert q.exception() is None
    assert M.describe_view(vw)["fresh"]
    assert _view_pairs(spark, vw) == _pairs_of(docs)
