"""Driver-contract smoke + distributed embedding parity (D1/D2)."""

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from rclip_server_spark.operators import multimodal
from rclip_server_spark.plans.embedder import DeterministicEmbedder

E = DeterministicEmbedder(64)


def test_entry_returns_flagship_topk(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 12
    assert set(df.columns) == {"vec_id", "score"}
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_every_oracle_key_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    assert len(oracles) >= 45


def test_embed_text_column_matches_driver_embedder(spark, documents):
    sample = documents.limit(8)
    got = {
        r.doc_id: np.array(r.embedding)
        for r in multimodal.embed_documents(sample).collect()
    }
    for r in sample.collect():
        np.testing.assert_allclose(got[r.doc_id], E.embed_text(r.text), atol=1e-12)


def test_embed_binary_column_deterministic(spark, documents):
    urls = documents.limit(6).select(
        F.concat(F.lit("http://x/"), F.col("doc_id")).alias("url")
    )
    fetched = multimodal.fetch_url_stub(urls)
    embedded = multimodal.embed_binary_column(fetched)
    a = {r.url: list(r.embedding) for r in embedded.collect()}
    b = {r.url: list(r.embedding) for r in embedded.collect()}
    assert a == b
    for v in a.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9


def test_decode_and_thumbnail_plumbing(spark, documents):
    urls = documents.limit(4).select(
        F.concat(F.lit("http://x/"), F.col("doc_id")).alias("url")
    )
    pipe = multimodal.thumbnail_stub(
        multimodal.decode_image_metadata(multimodal.fetch_url_stub(urls))
    )
    for r in pipe.collect():
        assert r.image_meta.width >= 64 and r.image_meta.height >= 64
        assert r.image_meta.format in ("jpeg", "png", "gif")
        assert r.image_meta.n_bytes == 128
        assert len(r.thumbnail) >= 16
