"""Endpoint-parity layer (reference §2.E): one function per reference HTTP
endpoint, over an indexed images table. A user of the reference's API can
call these 1:1; the HTTP framing (FastAPI routes, Cache-Control headers,
redirects) is deliberately out of engine scope — these return the payloads.

Known reference defects NOT replicated (SURVEY.md §2.E): /info's
AttributeError (RS:483), the dead dedup SQL (RS:237-245), the unreachable
reload inside censor (RS:235).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators import dedup, similarity, stats
from .plans import serving
from .plans.combinator import resolve_query
from .sources import writer


class RclipServerApi:
    """Engine-backed equivalents of the reference server's endpoints.

    ``table_path``: parquet images table (schema writer.IMAGES_SCHEMA);
    ``words_df``: optional (word, vector) DataFrame for reverse lookup;
    ``embedder``: pluggable (DeterministicEmbedder in tests, CLIP in prod);
    ``censorship_key``: guards censor(), like the reference env var (RS:423).
    """

    def __init__(self, spark: SparkSession, table_path: str, embedder,
                 words_df=None, censorship_key: str | None = None):
        self.spark = spark
        self.table_path = table_path
        self.embedder = embedder
        self.words_df = words_df
        self.censorship_key = censorship_key

    # -- helpers ----------------------------------------------------------
    def _live(self):
        return writer.live_rows(self.spark.read.parquet(self.table_path))

    def _resolve(self, q: str):
        df = self._live()
        return resolve_query(
            q,
            self.embedder,
            image_lookup=lambda i: similarity.point_lookup_embedding(
                df, i, id_col="id", vec_col="vector"
            ),
            random_image=lambda: similarity.random_row_embedding(df, vec_col="vector"),
        )

    # -- endpoints --------------------------------------------------------
    def search_api(self, q: str, num: int | None = None) -> list[list]:
        """/search_api → [[image_id, score], ...] top-(num or 12) (RS:386-393)."""
        qv = self._resolve(q)
        if qv is None:
            return []
        top = similarity.topk_similar(
            self._live(), qv, k=num or 12, id_col="id", vec_col="vector"
        )
        return [[r["id"], r["score"]] for r in top.collect()]

    def similar_words(self, q: str) -> dict:
        """/similar_words → {similar_words, similar_phrases} (RS:395-402)."""
        if self.words_df is None:
            raise ValueError("no words table configured")
        qv = self._resolve(q)
        if qv is None:
            return {"similar_words": [], "similar_phrases": []}
        words = similarity.best_words(self.words_df, qv, k=50)
        phrases = similarity.best_phrases(self.words_df, qv, k=100)
        return {
            "similar_words": [[r["word"], r["score"]] for r in words.collect()],
            "similar_phrases": [[r["phrase"], r["score"]] for r in phrases.collect()[:50]],
        }

    def clip_embedding(self, q: str) -> dict:
        """/clip_embedding → the resolved query vector (RS:404-408)."""
        qv = self._resolve(q)
        return {"clip_embedding": [] if qv is None else [float(x) for x in qv]}

    def clip_text_embedding(self, q: str) -> dict:
        """/clip_text_embedding — text-only, skips the grammar (RS:410-414)."""
        return {"clip_embedding": [float(x) for x in self.embedder.embed_text(q)]}

    def visualize_clip_embedding(self, q: str) -> dict:
        """/visualize_clip_embedding → html color grid (RS:416-421): min-max
        normalize against the table's per-dimension stats (A7/A8), render."""
        qv = self._resolve(q)
        if qv is None:
            return {"clip_embedding": ""}
        srows = stats.feature_minmax(self._live(), vec_col="vector").orderBy("dim").collect()
        mins = np.array([r["min_x"] for r in srows])
        ranges = np.array([max(r["range_x"], 1e-12) for r in srows])
        normalized = np.clip((np.asarray(qv) - mins) / ranges, 0.0, 1.0)
        return {"clip_embedding": serving.visualize_embedding(normalized)}

    def censor(self, img_id: int, censorship_key: str) -> dict:
        """/censor/{id} → soft delete, guarded by the key (RS:423-428)."""
        if not self.censorship_key or censorship_key != self.censorship_key:
            raise PermissionError("bad censorship key")
        writer.soft_delete(self.spark, self.table_path, [img_id], id_col="id")
        return {"deleted": img_id}

    def reload(self) -> int:
        """/reload → refresh (RS:430-433); returns live row count like the
        reference's startup log (B10)."""
        return writer.live_rows(
            writer.reload_table(self.spark, self.table_path)
        ).count()

    def img_redirect(self, img_id: int) -> str:
        """/img/{id} → detail url or filepath (RS:440-446)."""
        row = (
            self.spark.read.parquet(self.table_path)
            .where(F.col("id") == img_id)
            .select("wikimedia_descr_url", "filepath")
            .first()
        )
        if row is None:
            raise KeyError(f"image {img_id} not found")
        return row["wikimedia_descr_url"] or row["filepath"]

    def thm_redirect(self, img_id: int, size: int = 600) -> str:
        """/thm/{id}?size → thumb url with size rewrite (RS:448-462);
        img_id == -1 → the loading-placeholder sentinel (RS:452)."""
        if img_id == -1:
            return "placeholder.svg"
        row = (
            self.spark.read.parquet(self.table_path)
            .where(F.col("id") == img_id)
            .select("wikimedia_thumb_url", "filepath")
            .first()
        )
        if row is None:
            raise KeyError(f"image {img_id} not found")
        url = row["wikimedia_thumb_url"] or row["filepath"]
        import re

        return re.sub(r"/600px-", f"/{size}px-", url)

    def info(self, img_id: int) -> dict:
        """/info/{id} — implemented correctly (the reference's handler calls a
        nonexistent method, RS:483; fidelity = intent, not bugs)."""
        row = (
            self.spark.read.parquet(self.table_path)
            .where(F.col("id") == img_id)
            .first()
        )
        if row is None:
            raise KeyError(f"image {img_id} not found")
        return {"id": row["id"], "filepath": row["filepath"], "size": row["size"]}

    def copyright_message(self) -> str:
        """/copyright_message (RS:489-492)."""
        return serving.copyright_message(os.path.basename(self.table_path))

    def dedup(self) -> int:
        """The reference's dedup_sqlite is dead code (RS:237-245); here it
        works: soft-delete every non-min-id exact duplicate vector, return
        the number marked. Scans LIVE rows only — already-censored rows must
        not be re-counted on the next run (idempotence)."""
        marked = dedup.exact_dedup_mark(self._live(), "vector", "id")
        dup_ids = [r["id"] for r in marked.where("is_duplicate").select("id").collect()]
        if dup_ids:
            writer.soft_delete(self.spark, self.table_path, dup_ids, id_col="id")
        return len(dup_ids)
