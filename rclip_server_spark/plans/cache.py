"""Term-embedding cache table (reference A5's lru_cache, cluster-grade).

The reference memoizes term→embedding per process with functools.lru_cache
(rclip_server.py:144). A per-process dict evaporates on restart and is
invisible to other sessions; the cluster equivalent is a tiny persisted
(term, embedding) parquet table consulted before the model is invoked —
reads are broadcast-sized, writes are append-only upserts.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession

from ..functions.localrel import values_df
from ..sources.writer import upsert_parquet


class TermCacheTable:
    """Persistent term→embedding memo. get() misses return None; put()
    upserts (last write wins on the term key)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self):
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def get(self, term: str) -> np.ndarray | None:
        df = self._read()
        if df is None:
            return None
        row = df.where(df.term == term).select("embedding").first()
        return None if row is None else np.asarray(row[0], dtype=np.float64)

    def put(self, term: str, embedding) -> None:
        updates = values_df(
            self.spark,
            [(term, [float(x) for x in embedding])],
            "term string, embedding array<double>",
        )
        upsert_parquet(self.spark, self.path, updates, key="term")

    def as_dict(self) -> dict[str, np.ndarray]:
        """Warm a driver-side dict for resolve_query's _cache hook — one
        broadcast-sized read instead of a lookup per term."""
        df = self._read()
        if df is None:
            return {}
        return {
            r["term"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in df.collect()
        }
