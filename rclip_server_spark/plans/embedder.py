"""Pluggable text/image embedders (reference: rclip_server.py:176-188, D1/D2).

The reference hardcodes CLIP ViT-B/32 on CPU (rclip_server.py:50-57). Here the
embedder is an interface: production plugs a real model in via the executor-
side lazy-singleton pattern (see operators/multimodal.py for the batched UDF
plumbing); tests and the oracle harness use ``DeterministicEmbedder`` — a
seeded-hash unit vector, dim 64 to match the fixture embeddings — so no model
download is ever needed and every result is reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np


class Embedder(Protocol):
    dim: int

    def embed_text(self, text: str) -> np.ndarray: ...

    def embed_texts(self, texts: list[str]) -> np.ndarray: ...


class DeterministicEmbedder:
    """unit_vector(rng(sha256(text))) — stable across processes and platforms.

    Replaces CLIP in tests (SURVEY.md §5.3). L2-normalized like the
    reference's index-time invariant (index_wikimedia.py:148-150).
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_text(self, text: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim)
        v /= np.linalg.norm(v)
        return v.astype(np.float64)

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        return np.stack([self.embed_text(t) for t in texts])


class ClipEmbedder:
    """Real CLIP embedder (reference D1-D3). The model libraries are not in
    this container, so construction raises; the interface documents how a
    production deployment plugs in (lazy singleton per executor, batch per
    Arrow chunk)."""

    dim = 512

    def __init__(self, model_name: str = "ViT-B/32", device: str = "cpu"):
        raise NotImplementedError(
            "CLIP is not available in this environment; use DeterministicEmbedder. "
            "Production: load the model lazily once per executor inside a "
            "scalar-iterator pandas_udf (see rclip_server.py:176-188 for the "
            "reference semantics: tokenize/encode, then L2-normalize)."
        )


_DEFAULT: DeterministicEmbedder | None = None


def get_default_embedder(dim: int = 64) -> DeterministicEmbedder:
    global _DEFAULT
    if _DEFAULT is None or _DEFAULT.dim != dim:
        _DEFAULT = DeterministicEmbedder(dim)
    return _DEFAULT
