"""Scaling-curve measurement: run headline operators on 1x / 2x / 4x
replicas of the sf0.1 tables (union of id-shifted copies, so dedup/join
keys stay distinct) and report wall-clock per scale. Near-linear growth is
the empirical backing for the PLANS.md claims — a super-linear operator
would mean a hidden quadratic or a single-reducer stage.

Usage: python tools/scale_sweep.py [sf_dir]  ->  one JSON line

Round-7 measured (sf0.1 base, t4x/t1x, idle): flagship_topk 0.58,
minhash_near_dup 1.41, simhash_groups 0.90, semdedup 1.06, bm25_topk 0.93,
containment_pairs 2.19, bloom_anti_join 1.17, lsh_knn_join 1.19 (under the
2^n_planes ∝ |right| sizing) — no super-linear operator; matches the
r5/r6 curves within jitter (r6: 0.47/1.43/0.81/1.06/0.91/1.92/1.08/1.12;
r5: 0.45/1.44/0.73/0.76/1.19/1.09/1.21/1.12). containment's 2.19 tracks
its candidate volume (rare-gram pair count grows with df under the fixed
max_df cap), not a plan regression — the same ratio class as r6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from rclip_server_spark.contract import CENTROIDS, EMBEDDER, QV_FLAGSHIP
from rclip_server_spark.operators import ann, dedup, retrieval, similarity, sketches
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def replicate(df: DataFrame, copies: int, id_col: str,
              text_col: str | None = None) -> DataFrame:
    """k distinct-key copies: ids shifted by i * 10^9 per copy. When
    ``text_col`` is given, each copy's text goes through a copy-specific
    letter permutation — otherwise every copy is a TRUE near-duplicate of
    its original and the dedup input grows k^2 near-dup pairs by
    construction (measured: 4x verbatim replicas -> 5.3x minhash time,
    entirely explained by the ~1000x larger true-pair output). Perturbed
    replicas keep the pair count linear, which is what a real 4x-bigger
    corpus looks like."""
    alpha = "etaoinshrdlu"
    out = df
    for i in range(1, copies):
        c = df.withColumn(id_col, F.col(id_col) + F.lit(i * 1_000_000_000))
        if text_col is not None:
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            c = c.withColumn(text_col, F.translate(F.col(text_col), alpha, rot))
        out = out.unionByName(c)
    return out


def main() -> None:
    spark = get_spark(app_name="scale_sweep")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")

    def bench_at(copies: int) -> dict[str, float]:
        docs = replicate(docs0, copies, "doc_id", text_col="text").persist()
        emb = replicate(emb0, copies, "vec_id").persist()
        docs.count()
        n_emb = emb.count()
        knn_left = emb.where(F.col("vec_id") % 17 == 0)
        n_knn_left = knn_left.count()
        # the documented 100 TB sizing discipline: 2^n_planes tracks |right|
        # so per-left-row candidate volume stays CONSTANT as data grows —
        # under it, total k-NN-join work is linear in |left|, which is the
        # claim this sweep verifies (fixed n_planes would be quadratic by
        # construction, a misconfiguration, not an engine property)
        knn_planes = 9 + {1: 0, 2: 1, 4: 2}[copies]
        ops = {
            "flagship_topk": lambda: similarity.topk_similar(
                emb, QV_FLAGSHIP, k=12
            ).collect(),
            "minhash_near_dup": lambda: dedup.minhash_near_dup(
                docs, threshold=0.7
            ).count(),
            "simhash_groups": lambda: dedup.simhash_groups(docs).count(),
            "semdedup": lambda: dedup.semantic_dedup(
                emb, CENTROIDS, threshold=0.4
            ).count(),
            "bm25_topk": lambda: retrieval.bm25_topk(
                docs, ["data", "model", "training"], k=10
            ).collect(),
            # round-4 additions: the inverted-index containment dedup and
            # the tumbling-window dedup twin (partial-agg shuffle shape)
            "containment_pairs": lambda: dedup.containment_pairs(
                docs, threshold=0.8
            ).count(),
            # Bloom-pruned anti-join: fixed ~30% key set; the claim under
            # test is that cost grows with the SCAN (map-side routed),
            # not with pairs — expect ~linear in copies
            "bloom_anti_join": lambda: sketches.bloom_prune_anti_join(
                docs.select("doc_id", "lang"),
                docs.where(F.col("doc_id") % 3 == 0).select("doc_id"),
                "doc_id",
            ).count(),
            # round-5 addition: the cross-table k-NN join (neither side
            # broadcast); with 2^n_planes ∝ |right| the candidate bound —
            # |L|·|R|·probes/2^n_planes — grows only with |L|
            "lsh_knn_join": lambda: ann.lsh_knn_join(
                knn_left, emb, k=5, n_planes=knn_planes, n_probe_bits=1,
                dim=64, n_left=n_knn_left, n_right=n_emb,
            ).count(),
        }
        out = {}
        for name, fn in ops.items():
            fn()  # warm the plan shape
            best = None
            for _ in range(2):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out[name] = round(best, 3)
        docs.unpersist(), emb.unpersist()
        return out

    result = {str(c) + "x": bench_at(c) for c in (1, 2, 4)}
    ratios = {
        name: round(result["4x"][name] / max(result["1x"][name], 1e-9), 2)
        for name in result["1x"]
    }
    print(json.dumps({"sf_dir": SF_DIR, "timings_sec": result,
                      "t4x_over_t1x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
