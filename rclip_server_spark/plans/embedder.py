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


def real_clip_backend() -> str | None:
    """Name of the first importable real-CLIP backend, or None. Checked by
    the env-flagged smoke test (tests/test_real_model_smoke.py) and by
    ClipEmbedder construction."""
    for mod, name in (("open_clip", "open_clip"), ("clip", "clip"),
                      ("transformers", "transformers")):
        try:
            __import__(mod)
            __import__("torch")  # every backend encodes through torch —
            # transformers imports fine without it, then dies at model load
            return name
        except ImportError:
            continue
    return None


class ClipEmbedder:
    """Real CLIP text embedder behind the pluggable seam (reference D1-D3:
    rclip_server.py:50-57 model load, 176-181 encode + L2-normalize).

    Construction lazily loads the first available public backend —
    ``open_clip`` (model 'ViT-B-32'), the original ``clip`` package
    ('ViT-B/32'), or HF ``transformers`` ('openai/clip-vit-base-patch32')
    — and raises with instructions when none is importable (none is in
    this container; the seam is exercised by tests/test_real_model_smoke
    when RCLIP_SPARK_CLIP=1 in an environment that has one).

    Deployment shape (D3): construct INSIDE the executor — pass a factory
    to multimodal.embed_text_udf_from_factory so the model loads lazily
    once per Python worker and each Arrow batch is one encode call."""

    def __init__(self, model_name: str | None = None, device: str = "cpu"):
        backend = real_clip_backend()
        if backend is None:
            raise NotImplementedError(
                "no CLIP backend importable (tried open_clip, clip, "
                "transformers); use DeterministicEmbedder here. Production: "
                "install one and construct ClipEmbedder inside the executor "
                "via embed_text_udf_from_factory (lazy singleton per worker, "
                "one encode per Arrow batch — rclip_server.py:176-188)."
            )
        self.device = device
        if backend == "open_clip":
            import open_clip
            import torch

            name = model_name or "ViT-B-32"
            model, _, _ = open_clip.create_model_and_transforms(
                name, pretrained="openai")
            model = model.to(device).eval()
            tok = open_clip.get_tokenizer(name)

            def _encode(texts: list[str]) -> np.ndarray:
                with torch.no_grad():
                    feats = model.encode_text(tok(texts).to(device))
                return feats.cpu().numpy().astype(np.float64)

        elif backend == "clip":
            import clip
            import torch

            model, _ = clip.load(model_name or "ViT-B/32", device=device)
            model.eval()

            def _encode(texts: list[str]) -> np.ndarray:
                with torch.no_grad():
                    toks = clip.tokenize(texts, truncate=True).to(device)
                    feats = model.encode_text(toks)
                return feats.cpu().numpy().astype(np.float64)

        else:  # transformers
            import torch
            from transformers import CLIPModel, CLIPProcessor

            name = model_name or "openai/clip-vit-base-patch32"
            model = CLIPModel.from_pretrained(name).to(device).eval()
            proc = CLIPProcessor.from_pretrained(name)

            def _encode(texts: list[str]) -> np.ndarray:
                with torch.no_grad():
                    inputs = proc(text=texts, return_tensors="pt",
                                  padding=True, truncation=True).to(device)
                    feats = model.get_text_features(**inputs)
                return feats.cpu().numpy().astype(np.float64)

        self._encode = _encode
        self.dim = int(self._encode(["probe"]).shape[1])

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        feats = self._encode(list(texts))
        # index-time invariant: L2-normalize so dot == cosine
        # (index_wikimedia.py:148-150)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        return feats / np.where(norms == 0.0, 1.0, norms)

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]


_DEFAULT: DeterministicEmbedder | None = None


def get_default_embedder(dim: int = 64) -> DeterministicEmbedder:
    global _DEFAULT
    if _DEFAULT is None or _DEFAULT.dim != dim:
        _DEFAULT = DeterministicEmbedder(dim)
    return _DEFAULT
