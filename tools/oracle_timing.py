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
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duck_con(sf_dir)
    out: dict[str, float | None] = {}
    for head, row in HEADLINER_ORACLE.items():
        if row is None:
            out[head] = None
            continue
        sql = _ORACLES.get(row)
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
