"""The driver contract, split by family (round 8): every
implemented operator as a (Spark query, DuckDB oracle SQL) pair,
keyed by SURVEY.md SS2 inventory id. The package re-exports the
exact surface the monolithic contract.py exposed (queries /
oracle_sql / _QUERIES / _ORACLES / _PRIORITY plus the fragment
generators); registration order = module import order below,
which preserves the original file order. Design rules live in
_base.py."""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _QUERIES, _ORACLES, _register, _t, _utc, _f  # noqa: F401
from ._base import _words_df  # noqa: F401

# family registries, imported in REGISTRATION ORDER (the driver
# window = first 50 of _PRIORITY, then registration order)
from . import _vector  # noqa: F401,E402
from . import _dedup_text  # noqa: F401,E402
from . import _scans_rel  # noqa: F401,E402
from . import _events_d1  # noqa: F401,E402

# (the _PRIORITY/public-API block sits between the two
# registration waves in the original file; order preserved)
from . import _breadth1  # noqa: F401,E402
from . import _breadth2  # noqa: F401,E402
from . import _breadth3  # noqa: F401,E402
from . import _round3  # noqa: F401,E402
from . import _versioned_rows  # noqa: F401,E402
from . import _tpch7  # noqa: F401,E402


# ===========================================================================
# public driver API
# ===========================================================================


# The external driver verifies only the FIRST 50 registered queries, so the
# registration order is part of the proof surface: this priority list spans
# every operator family (§2 A/B/D rows plus the LLM-pipeline families —
# events, sampling, PCA/Gramian, BPE, BM25/hybrid retrieval, SemDeDup,
# profiling, sketches) so the driver's green rows cover the whole inventory,
# not just whichever family happened to register first. Everything not
# listed follows in source-registration order and stays locally verified by
# tools/check_contract.py.
_PRIORITY = [
    # The driver verifies the FIRST 50 registered rows each round.
    # Round-15 rotation (r14 verdict task 7): rotate back the four
    # displaced green rows that sit directly over r14's riskiest
    # optimization rewrites — sql_merge_upsert (the footer-arithmetic
    # dup-key guard), vt_agg_view_refresh (the one-exchange state
    # merge), ev_asof_attribution (the latest_by as-of dedupe), and
    # dedup_minhash_near_dup (the persisted-longs signature pipeline,
    # reworked again this round) — so the driver re-verifies those
    # paths directly. Displaced: sql_text_search_topk,
    # sql_ann_search_topk, ai_knn_join_indexed, ai_lsh_indexed_topk —
    # the longest-green displaceable rows whose machinery stays
    # covered in-window by their twins (ti_bm25_indexed_topk /
    # ti_postings / sql_knn_join_indexed / hybrid_indexed_rrf and the
    # filtered/batch rows all dispatch through the same probed-read +
    # refresh skeleton). All displaced rows stay replayed locally by
    # tools/check_contract.py.
    # Round-14 rotation (r13 verdict tasks 1/5): (a) the 20 §2-mapped
    # rows + the fenced drift row stay (the judge reads them against
    # SURVEY §2 every round); (b) ii_ivfadc_topk stays — UPGRADED this
    # round from rows-only to hash-exact (explicit deterministic
    # centroids+codebooks; the oracle recomputes codes, ADC scores,
    # the shortlist, and the exact re-rank from shared literals);
    # (c) the 12 index rows whose machinery r14 touched (the unified
    # refresh skeleton matview._refresh_index now drives every
    # text/ANN/IVF refresh; these rows' fixtures all refresh through
    # it) stay; (d) the 4 delete-vector read rows stay — r14 re-keyed
    # the pinned vector read on the new delete_typed manifest marker
    # (ADVICE fix), so every DV-read row runs over changed machinery;
    # (e) sql_bucketed_zorder_roundtrip gets the driver cell it was
    # owed (displaced by the late-r13 ivfadc swap; verdict task 5),
    # plus the oldest-green sweep from the r13 window note's candidate
    # list. Rotated-out rows stay replayed locally by
    # tools/check_contract.py (judge-replayed in full, 249/0 fail,
    # in r13).
    # §2 A-family (vector/similarity)
    "a1_a2_flagship_topk", "a2_topk_k50", "a4_l2_normalize",
    "a6_point_lookup", "a7_feature_minmax", "a8_minmax_normalize",
    "a9_seeded_random_vector", "a11_best_words", "a12_phrase_embedding",
    "a13_phrase_approx_score",
    # §2 B-family (scan/write/predicate) + D1
    "b1_soft_delete_filter", "b2_dynamic_projection",
    "b3_lowercase_predicate", "b4_exact_dup_groups", "b4_exact_dedup_mark",
    "b10_table_counts", "b13_b14_url_ops", "b15_regex_predicates",
    "rel_anti_join_b8", "d1_embed_documents_distributed",
    # --- drift row (r6's red cell; its dtype class is fenced) ---
    "sketch_histogram_drift",
    # --- r14 upgrade: the IVFADC cell, now hash-exact (was the one
    # no-oracle retrieval row; verdict task 1) ---
    "ii_ivfadc_topk",
    # --- index rows whose machinery r14 touched: every refresh now
    # dispatches through matview._refresh_index (text/ANN/IVF), and
    # every serving read sits over the delete_typed-keyed vector read
    "ii_ivf_indexed_topk", "sql_knn_join_indexed",
    "sql_hybrid_search_rrf",
    "ti_postings", "ti_bm25_indexed_topk", "ti_phrase_topk",
    "hybrid_indexed_rrf",
    # --- r15 rotation: the rows sitting over r14's riskiest rewrites
    "sql_merge_upsert", "vt_agg_view_refresh",
    "ev_asof_attribution", "dedup_minhash_near_dup",
    # --- delete-vector read rows over the r14 delete_typed machinery
    "vt_delete_vector_read", "sql_select_window_over_dv",
    "sql_select_grouping_sets_over_dv", "vt_bucketed_pruned_read",
    # --- owed cell (verdict task 5) ---
    "sql_bucketed_zorder_roundtrip",
    # --- NEW r14 rows (filtered vector search: payload include_cols +
    # predicate inside the probed scan, operator + SQL + IVF twins;
    # batched multi-query serving's oracle row) — all hash-exact ---
    "ai_filtered_topk", "sql_ann_filtered_topk", "ii_filtered_topk",
    "ti_filtered_topk", "sql_text_filtered_topk",
    "ai_batch_topk", "ti_batch_topk", "ii_batch_topk",
    # --- oldest-green sweep (the r13 window note's candidate list,
    # in its order; the last 8 displaced by the new r14 rows above) ---
    "ev_session_windows", "samp_stratified",
    "samp_temperature_mixture", "text_lang_id",
]
# r16 rotation candidates (driver-green in r13/r14, displaced since):
# sql_text_search_topk, sql_ann_search_topk, ai_knn_join_indexed,
# ai_lsh_indexed_topk (displaced r15 by the rewrite-coverage rows
# above), dedup_semantic_semdedup, vec_quantize_int8_roundtrip,
# vt_view_composition, sql_clone_divergence, ann_lsh_topk_multiprobe,
# ann_lsh_knn_join, text_bm25_topk, text_ngram_contamination
# (displaced late-r14 by the filtered-search/batch
# rows), rel_salted_join_skew, sql_create_schema_insert,
# sql_bucketed_lifecycle, sql_merge_sync_by_source,
# sql_bucket_migration,
# sql_bucketed_conditional_merge, b16_local_binary_ingest,
# sql_bucketed_schema_evolution, samp_export_shards_manifest —
# then sql_timestamp_time_travel, sql_copy_roundtrip,
# sql_copy_stream_ingest, sql_check_constraint_gate,
# sql_truncate_timetravel, sql_restore_roundtrip, sql_mv_roundtrip,
# rel_window_rank, sql_q8_market_share, rel_grouping_sets,
# sql_analyze_stats, sql_topk_qualify, sql_update_roundtrip,
# sql_q17_small_quantity_revenue — plus the usual oldest-green sweep.


def _ordered(reg: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    out = {n: reg[n] for n in _PRIORITY if n in reg}
    out.update((n, v) for n, v in reg.items() if n not in out)
    return out


def queries() -> dict:
    return _ordered(_QUERIES)


def oracle_sql() -> dict:
    return _ordered(_ORACLES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query end-to-end on sf0.001 (reference §3.1 lifecycle):
    parse 'zebra -stripes +2spots' → combinator → brute-force cosine top-12."""
    return _QUERIES["a1_a2_flagship_topk"](spark, "/root/testdata/sf0.001")

