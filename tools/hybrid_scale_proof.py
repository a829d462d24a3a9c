"""Hybrid-retrieval SCALE proof (r11 verdict task 6): the fused
TEXT+ANN query served from the two maintained indexes should stay
~FLAT as the corpus grows, because neither side scans the corpus —
the lexical side reads the query terms' postings (pushed IN-list),
the vector side reads the probed buckets' rows (file-pruned on the
bucketed at-rest layout) — and the fusion itself is two pool-sized
rank windows + one pool-sized outer join.

Targets are 1x/4x/8x id-shifted replicas of the sf0.1 documents AND
embeddings fixtures; both indexes are refreshed post-churn so the
timings measure the maintained (not freshly-built) state. Each
timing is a median of 3. Row-identity of the fused top-k vs the
ad-hoc scan path is asserted at every size.

Usage: python tools/hybrid_scale_proof.py [sf_dir] [copies ...]
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

from rclip_server_spark.operators import retrieval
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import annindex as AI
from rclip_server_spark.sources import load_table
from rclip_server_spark.sources import textindex as TI
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
TERMS = ["vector", "join", "spark"]
QV = [0.125] * 32 + [-0.125] * 32
POOL = 50
K = 10


def _median3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[1]


def main() -> None:
    spark = get_spark(app_name="hybrid_scale_proof")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id",
                                                          "text")
    embs0 = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="hybrid_proof_")
    results = {}
    try:
        for c in COPIES:
            d, e = docs0, embs0
            for i in range(1, c):
                d = d.unionByName(docs0.withColumn(
                    "doc_id", F.col("doc_id") + i * 10_000_000))
                e = e.unionByName(embs0.withColumn(
                    "vec_id", F.col("vec_id") + i * 10_000_000))
            tsrc = os.path.join(tmp, f"tsrc{c}")
            tidx = os.path.join(tmp, f"tidx{c}")
            asrc = os.path.join(tmp, f"asrc{c}")
            aidx = os.path.join(tmp, f"aidx{c}")
            V.create(spark, tsrc, d)
            TI.create_text_index(spark, tsrc, tidx, key="doc_id")
            # r13: the text side runs on its bucketed at-rest layout
            # too (term-bucket file pruning), matching the ANN side
            TI.convert_index_to_bucketed(spark, tidx, n_buckets=64)
            V.create(spark, asrc, e)
            AI.create_ann_index(spark, asrc, aidx, key="vec_id",
                                n_planes=6)
            AI.convert_index_to_bucketed(spark, aidx, n_buckets=64)
            # maintained (not pristine) state: one churn + refresh
            V.delete_and_append(
                spark, tsrc,
                d.limit(100).select("doc_id"), "doc_id",
                d.limit(100).withColumn(
                    "doc_id", F.col("doc_id") + 500_000_000))
            V.delete_and_append(
                spark, asrc,
                e.limit(100).select("vec_id"), "vec_id",
                e.limit(100).withColumn(
                    "vec_id", F.col("vec_id") + 500_000_000))
            TI.refresh_text_index(spark, tidx)
            AI.refresh_ann_index(spark, aidx)

            def _text():
                return TI.query_text_index(spark, tidx, TERMS, k=POOL)

            def _vec():
                return AI.query_ann_index(spark, aidx, QV, k=POOL,
                                          n_probe_bits=1)

            def _fused():
                return retrieval.rrf_fusion(
                    _text(),
                    _vec().withColumnRenamed("vec_id", "doc_id"),
                    k=K, pool=POOL)

            t_text = _median3(lambda: _text().collect())
            t_vec = _median3(lambda: _vec().collect())
            t_fused = _median3(lambda: _fused().collect())
            # exactness: fused-from-index == fused-from-scan at this
            # size (the ad-hoc BM25 scorer + multiprobe tier over the
            # current source state)
            from rclip_server_spark.operators import ann as ANN

            cur_d = V.read(spark, tsrc)
            cur_e = V.read(spark, asrc)
            want = retrieval.rrf_fusion(
                retrieval.bm25_topk(cur_d, TERMS, k=POOL),
                ANN.lsh_topk_multiprobe(cur_e, QV, k=POOL, n_planes=6,
                                        n_probe_bits=1, seed=42)
                .withColumnRenamed("vec_id", "doc_id"),
                k=K, pool=POOL)
            got_rows = [(r["doc_id"], round(r["rrf"], 9))
                        for r in _fused().collect()]
            want_rows = [(r["doc_id"], round(r["rrf"], 9))
                         for r in want.collect()]
            assert got_rows == want_rows, f"{c}x fused mismatch"
            results[f"{c}x"] = {
                "docs": cur_d.count(), "vectors": cur_e.count(),
                "text_query_sec": round(t_text, 3),
                "ann_query_sec": round(t_vec, 3),
                "hybrid_fused_sec": round(t_fused, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "hybrid_scale_proof",
                      "sf_dir": SF_DIR, "pool": POOL, "k": K,
                      "results": results}))


if __name__ == "__main__":
    main()
