"""Empirical backing for the maintained near-dup pairs view's O(delta)
claim: refreshing after a FIXED-SIZE document batch must cost ~the same
no matter how large the already-indexed corpus is (the probe is
Δ-bands ⋈ band-index, bounded by Δ × band collisions), while the
from-scratch pipeline (minhash_near_dup over the head) grows with the
corpus.

Corpora are 1x/4x/8x id-shifted replicas of the sf-dir documents
fixture; each gets the same ~500-doc batch appended and we time
(a) refresh_near_dup_pairs_view vs (b) the full self-join pipeline on
the new head. Pair-set equality view-vs-recompute is asserted at every
size — the proof is only meaningful if maintenance is exact.

Usage: python tools/neardup_scale_proof.py [sf_dir] [copies ...]
       (defaults: /root/testdata/sf0.1 and 1 4 8)  ->  one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclip_server_spark.operators import dedup
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table
from rclip_server_spark.sources import neardup_view as ND
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
THRESH = 0.7
BATCH_MOD = 10  # ~10% of one replica rides as the fixed append batch


def main() -> None:
    spark = get_spark(app_name="neardup_scale_proof")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch = docs0.where(F.col("doc_id") % BATCH_MOD == 0).select(
        (F.col("doc_id") + F.lit(900_000_000_000)).alias("doc_id"),
        "text")
    tmp = tempfile.mkdtemp(prefix="nd_proof_")
    results = {}
    try:
        for copies in COPIES:
            corpus = docs0
            for i in range(1, copies):
                corpus = corpus.unionByName(docs0.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)))
            src = os.path.join(tmp, f"docs_{copies}x")
            vw = os.path.join(tmp, f"pairs_{copies}x")
            V.create(spark, src, corpus)
            ND.create_near_dup_pairs_view(spark, src, vw, key="doc_id",
                                          threshold=THRESH)
            V.append(spark, src, batch)

            t0 = time.monotonic()
            ND.refresh_near_dup_pairs_view(spark, vw)
            t_refresh = time.monotonic() - t0

            t0 = time.monotonic()
            full = dedup.minhash_near_dup(
                V.read(spark, src), threshold=THRESH)
            n_full = full.count()
            t_recompute = time.monotonic() - t0

            n_view = ND.read_near_dup_pairs_view(spark, vw).count()
            assert n_view == n_full, (copies, n_view, n_full)
            results[f"{copies}x"] = {
                "corpus_rows": corpus.count(),
                "pairs": n_view,
                "refresh_sec": round(t_refresh, 3),
                "recompute_sec": round(t_recompute, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "neardup_view_refresh_flatness",
                      "sf_dir": SF_DIR, "threshold": THRESH,
                      "results": results}))


if __name__ == "__main__":
    main()
