"""The pluggable-embedder seam, proven two ways:

1. In-container (always runs): embed_text_udf_from_factory with the
   DeterministicEmbedder factory must equal the inlined hash-embedder UDF
   row-for-row — the factory/executor-singleton wiring is real, not just
   the hardcoded path.
2. Real model (env-flagged): with RCLIP_SPARK_CLIP=1 and a public CLIP
   backend importable (open_clip / clip / transformers — none is in this
   container), run end-to-end embed -> index -> search with the REAL
   model and check the seam's contract (dim, unit norm, self-similarity
   ranking). This is the VERDICT-r5 item 6 smoke path; it skips cleanly
   otherwise.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rclip_server_spark.operators import multimodal, similarity
from rclip_server_spark.plans import embedder as EMB


def test_factory_udf_matches_inline_hash_embedder(spark):
    """The factory seam and the inlined D1 UDF are the same transform when
    given the same embedder — pins that a real-model swap changes ONLY the
    embedder, not the plumbing. The factory is a LOCAL closure (cloudpickle
    ships it by value): executors don't have the repo on sys.path, the
    documented deployment rule for this seam."""

    def factory():  # self-contained DeterministicEmbedder twin
        import hashlib

        import numpy as _np

        class _E:
            dim = 64

            def embed_texts(self, texts):
                out = _np.empty((len(texts), 64), dtype=_np.float64)
                for i, t in enumerate(texts):
                    seed = int.from_bytes(
                        hashlib.sha256(t.encode("utf-8")).digest()[:8], "big")
                    rng = _np.random.default_rng(seed)
                    v = rng.standard_normal(64)
                    out[i] = v / _np.linalg.norm(v)
                return out

        return _E()

    df = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(40)], "id long, text string"
    )
    via_factory = df.withColumn(
        "e", multimodal.embed_text_udf_from_factory(factory)(F.col("text"))
    )
    via_inline = multimodal.embed_text_column(df, "text", "e", dim=64)
    a = {r.id: r.e for r in via_factory.collect()}
    b = {r.id: r.e for r in via_inline.collect()}
    assert set(a) == set(b)
    for i in a:
        np.testing.assert_allclose(a[i], b[i], atol=1e-12)


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


needs_real_clip = pytest.mark.skipif(
    os.environ.get("RCLIP_SPARK_CLIP") != "1"
    or EMB.real_clip_backend() is None,
    reason="real-CLIP smoke runs only with RCLIP_SPARK_CLIP=1 and an "
    "importable backend (open_clip / clip / transformers)",
)


@needs_real_clip
def test_real_clip_embed_and_search_end_to_end(spark):
    """D2/D3 with a real model: driver-side query embedding + distributed
    document embedding through the factory seam, then cosine top-k — the
    reference's full search lifecycle (rclip_server.py:176-196) with real
    CLIP semantics (a zebra query should rank zebra text first)."""
    repo_root = _REPO_ROOT

    def clip_factory():
        # LOCAL closure (cloudpickle ships by value); explicit sys.path so
        # the package imports on workers — a deployed cluster ships the
        # package via --py-files / pip instead
        import sys as _sys

        if repo_root not in _sys.path:
            _sys.path.insert(0, repo_root)
        from rclip_server_spark.plans.embedder import ClipEmbedder

        return ClipEmbedder(device="cpu")

    emb = clip_factory()
    assert emb.dim >= 64
    v = emb.embed_text("a photo of a zebra")
    assert v.shape == (emb.dim,)
    assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-6)

    docs = spark.createDataFrame(
        [(1, "a striped zebra grazing on the savanna"),
         (2, "a bowl of tomato soup on a table"),
         (3, "a commercial airliner taking off")],
        "id long, text string",
    )
    embedded = docs.withColumn(
        "embedding",
        multimodal.embed_text_udf_from_factory(clip_factory)(F.col("text")),
    )
    top = similarity.topk_similar(
        embedded, v, k=3, id_col="id", vec_col="embedding"
    ).collect()
    assert top[0].id == 1  # the zebra document wins under a real model
    assert all(-1.0 - 1e-6 <= r.score <= 1.0 + 1e-6 for r in top)


def test_clip_embedder_raises_with_instructions_when_unavailable():
    """In this container no backend is importable: the seam must fail
    loudly at construction with swap instructions, never silently fall
    back to the hash embedder."""
    if EMB.real_clip_backend() is not None:
        pytest.skip("a real backend exists here; the raise path is moot")
    with pytest.raises(NotImplementedError, match="open_clip"):
        EMB.ClipEmbedder()
