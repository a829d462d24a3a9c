"""DuckDB-oracle wall times for the bench.py headline set at sf0.1 — the
single-node baseline the Spark numbers are compared to (BASELINE.md notes
the reference itself publishes no numbers, so the matched-semantics DuckDB
run on the same parquet is the operative baseline).

Each bench headliner maps to the contract row whose oracle_sql() has the
same semantics; rows-only headliners (pandas-UDF embed, LR training) have
no SQL twin and are reported as null. Best-of-2, DuckDB default threading
(all cores — same machine budget the Spark run gets).

Usage: python tools/oracle_timing.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rclip_server_spark.contract import _ORACLES
from tools.check_contract import duck_con

# bench headliner -> contract row carrying the matched-semantics oracle SQL
HEADLINER_ORACLE = {
    "flagship_topk_sql": "a1_a2_flagship_topk",
    "flagship_topk_gemv": "a1_a2_flagship_topk",
    "best_words_top50": "a11_best_words",
    "minhash_near_dup_docs": "dedup_minhash_near_dup",
    "simhash_fingerprints": "dedup_simhash",
    "embed_documents_udf": None,       # pandas-UDF embedder: no SQL twin
    "q1_pricing_summary": "rel_q1_pricing_summary",
    "join_broadcast_agg": "rel_join_broadcast_agg",
    "window_running_sum": "rel_window_running_sum",
    "event_session_windows": "ev_session_windows",
    "text_quality_stats": "text_stats",
    "event_funnel": "ev_funnel_counts",
    "sample_weighted_mixture": "samp_weighted_mixture",
    "bm25_topk": "text_bm25_topk",
    "semdedup": "dedup_semantic_semdedup",
    "asof_click_view": "ev_asof_click_view",
    "dedup_containment": "dedup_containment",
    "train_quality_lr": None,          # iterative training: no SQL twin
    "weighted_fixed_k": "samp_weighted_fixed_k",
    "hist_quantiles": "sketch_histogram_quantiles",
    # late-r11 headliners: the shard export WRITES real shard files +
    # reads them back — the manifest oracle only recomputes the
    # numbers, so there is no matched-work SQL twin; the indexed bm25
    # answers the SAME query the corpus-scan oracle computes (the
    # index-vs-scan claim)
    "export_shards_docs": None,
    "bm25_indexed_topk": "text_bm25_topk",
    "lsh_knn_join": "__knn_bench__",  # bench config differs from the
    # contract row (bigger left side, 9 planes) — a matched-semantics SQL
    # is generated below so the baseline compares the same workload
}


def _knn_bench_sql() -> str:
    """DuckDB twin of bench.py's lsh_knn_join headliner: left = vec_id%17,
    right = full table, 9 hyperplanes, 1-bit multiprobe, top-5 by cosine."""
    from rclip_server_spark.contract import bucket_sql, dot2_sql
    from rclip_server_spark.operators import ann

    planes = ann.hyperplanes(9, 64, seed=42)
    masks = [0] + [1 << i for i in range(9)]
    mask_list = ", ".join(str(m) for m in masks)
    return f"""
    WITH l AS (
      SELECT vec_id AS id_a, embedding AS va,
             {bucket_sql('embedding', planes)} AS b0
      FROM embeddings WHERE vec_id % 17 = 0),
    lp AS (
      SELECT id_a, va, CAST(xor(b0, m) AS BIGINT) AS bucket
      FROM l CROSS JOIN (SELECT unnest([{mask_list}]) AS m)),
    r AS (
      SELECT vec_id AS id_b, embedding AS vb,
             {bucket_sql('embedding', planes)} AS bucket
      FROM embeddings),
    c AS (
      SELECT id_a, id_b, {dot2_sql('va', 'vb')} AS cosine
      FROM lp JOIN r USING (bucket)),
    w AS (
      SELECT id_a, id_b, cosine,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY cosine DESC, id_b ASC) AS rnk
      FROM c)
    SELECT id_a, id_b, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM w WHERE rnk <= 5
    """


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duck_con(sf_dir)
    out: dict[str, float | None] = {}
    for head, row in HEADLINER_ORACLE.items():
        if row is None:
            out[head] = None
            continue
        sql = _knn_bench_sql() if row == "__knn_bench__" else _ORACLES.get(row)
        if sql is None:
            out[head] = None
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            con.sql(sql).fetchall()
            dt = round(time.time() - t0, 3)
            best = dt if best is None or dt < best else best
        out[head] = best
    print(json.dumps({"sf_dir": sf_dir, "oracle_sec": out}))


if __name__ == "__main__":
    main()
