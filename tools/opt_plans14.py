"""Capture .explain('formatted') for the bench headline queries into
plans/r14/<row>_{before,after}.txt — the r14 optimization round's plan
evidence. Usage:

    python tools/opt_plans14.py before [row ...]
    python tools/opt_plans14.py after  [row ...]

Lakehouse DML rows (MERGE / refresh) are multi-statement and are audited by
tools/explain_audit.py instead; this captures the single-DataFrame rows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclip_server_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="opt_plans14")

    from rclip_server_spark.contract import _QUERIES, EMBEDDER, QV_FLAGSHIP
    from rclip_server_spark.operators import ann as ann_ops
    from rclip_server_spark.operators import dedup, multimodal, similarity
    from rclip_server_spark.sources import load_table
    from rclip_server_spark.sources.catalog import table_row_count
    from rclip_server_spark.streaming import windows as SW

    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")
    n_emb = table_row_count(os.path.join(SF_DIR, "embeddings.parquet"))

    builders = {
        "flagship_topk_sql": lambda: similarity.topk_similar(
            emb, QV_FLAGSHIP, k=12, method="sql"),
        "flagship_topk_gemv": lambda: similarity.topk_similar(
            emb, QV_FLAGSHIP, k=12, method="gemv"),
        "best_words_top50": lambda: similarity.best_words(
            emb.select(F.col("vec_id").cast("string").alias("word"),
                       F.col("embedding").alias("vector")),
            EMBEDDER.embed_text("zebra")),
        "minhash_near_dup_docs": lambda: dedup.minhash_near_dup(
            docs, threshold=0.7),
        "simhash_fingerprints": lambda: dedup.simhash_groups(docs),
        "embed_documents_udf": lambda: multimodal.embed_documents(docs),
        "q1_pricing_summary": lambda: _QUERIES["rel_q1_pricing_summary"](
            spark, SF_DIR),
        "join_broadcast_agg": lambda: _QUERIES["rel_join_broadcast_agg"](
            spark, SF_DIR),
        "window_running_sum": lambda: _QUERIES["rel_window_running_sum"](
            spark, SF_DIR),
        "event_session_windows": lambda: SW.session_windows(events),
        "text_quality_stats": lambda: _QUERIES["text_stats"](spark, SF_DIR),
        "event_funnel": lambda: _QUERIES["ev_funnel_counts"](spark, SF_DIR),
        "sample_weighted_mixture": lambda: _QUERIES["samp_weighted_mixture"](
            spark, SF_DIR),
        "bm25_topk": lambda: _QUERIES["text_bm25_topk"](spark, SF_DIR),
        "semdedup": lambda: _QUERIES["dedup_semantic_semdedup"](
            spark, SF_DIR),
        "asof_click_view": lambda: _QUERIES["ev_asof_click_view"](
            spark, SF_DIR),
        "dedup_containment": lambda: _QUERIES["dedup_containment"](
            spark, SF_DIR),
        "weighted_fixed_k": lambda: _QUERIES["samp_weighted_fixed_k"](
            spark, SF_DIR),
        "hist_quantiles": lambda: _QUERIES["sketch_histogram_quantiles"](
            spark, SF_DIR),
        "lsh_knn_join": lambda: ann_ops.lsh_knn_join(
            emb.where(F.col("vec_id") % 17 == 0), emb, k=5, n_planes=9,
            n_probe_bits=1, dim=64, n_left=n_emb // 17 + 1, n_right=n_emb),
    }

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, build in builders.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"explain failed: {e!r}"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
