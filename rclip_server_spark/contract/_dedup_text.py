"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _register, _t  # noqa: F401

# ===========================================================================
# B4 + dedup family
# ===========================================================================

_register(
    "b4_exact_dup_groups",
    lambda spark, sf: dedup.exact_dup_groups(
        _t(spark, sf, "documents"), "lang", "doc_id"
    ).select("lang", F.col("n_dups").cast("long").alias("n_dups"), "keep_id"),
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_dups, min(doc_id) AS keep_id
    FROM documents GROUP BY lang HAVING count(*) > 1
    """,
)

_register(
    "b4_exact_dedup_mark",
    lambda spark, sf: dedup.exact_dedup_mark(
        _t(spark, sf, "documents"), "lang", "doc_id"
    ).select("doc_id", "is_duplicate"),
    """
    SELECT doc_id, doc_id > min(doc_id) OVER (PARTITION BY lang) AS is_duplicate
    FROM documents
    """,
)

_register(
    "b4_exact_dup_embeddings",
    lambda spark, sf: dedup.exact_dup_groups(
        _t(spark, sf, "embeddings"), "embedding", "vec_id"
    ).select(F.col("n_dups").cast("long").alias("n_dups"), "keep_id"),
    """
    SELECT CAST(count(*) AS BIGINT) AS n_dups, min(vec_id) AS keep_id
    FROM embeddings GROUP BY embedding HAVING count(*) > 1
    """,
)

_SHINGLES = char_shingles_sql("text")
_HASHED_SHINGLES = f"list_transform({_SHINGLES}, s -> {hash32_sql('s')})"
_SIG_LIST = "[" + ", ".join(minhash_sig_exprs("hs")) + "]"

def _minhash_sig_query(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import minhash_signature_over_hashed, portable_hash32

    hashed = _t(spark, sf, "documents").select(
        "doc_id",
        F.transform(TXT.char_shingles(F.col("text"), SHINGLE_N), portable_hash32).alias("hs"),
    )
    return hashed.select(
        "doc_id",
        F.posexplode(minhash_signature_over_hashed("hs", MH_PARAMS)).alias("pos", "sig"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "sig")


_register(
    "dedup_minhash_signatures",
    _minhash_sig_query,
    f"""
    WITH h AS (SELECT doc_id, {_HASHED_SHINGLES} AS hs FROM documents),
    sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM h)
    SELECT doc_id, CAST(generate_subscripts(sig, 1) - 1 AS BIGINT) AS pos,
           unnest(sig) AS sig
    FROM sigs
    """,
)

_BAND_EQ = " OR ".join(
    f"list_slice(a.sig, {i * 4 + 1}, {i * 4 + 4}) = list_slice(c.sig, {i * 4 + 1}, {i * 4 + 4})"
    for i in range(N_BANDS)
)

# signature-agreement prefilter twin (operators.dedup.minhash_near_dup):
# matching components >= num_hashes * (threshold - 4*binomial_sd)
_MH_SD = (0.7 * 0.3 / N_MINHASH) ** 0.5
_MH_MIN_MATCHES = max(0, int(N_MINHASH * (0.7 - 4.0 * _MH_SD)))
_SIG_MATCHES = (
    "("
    + " + ".join(
        f"(CASE WHEN a.sig[{i + 1}] = c.sig[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(N_MINHASH)
    )
    + ")"
)

_register(
    "dedup_minhash_near_dup",
    lambda spark, sf: dedup.minhash_near_dup(
        _t(spark, sf, "documents"), threshold=0.7
    ),
    f"""
    WITH h AS (SELECT doc_id AS id,
                      list_distinct(list_transform({_SHINGLES}, s -> {hash60_sql('s')})) AS gs,
                      {_HASHED_SHINGLES} AS hs FROM documents),
    s AS (SELECT id, gs, {_SIG_LIST} AS sig FROM h),
    cand AS (
      SELECT a.id AS id_a, c.id AS id_b, a.gs AS gs_a, c.gs AS gs_b
      FROM s a JOIN s c ON a.id < c.id AND ({_BAND_EQ})
        AND {_SIG_MATCHES} >= {_MH_MIN_MATCHES})
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
             CAST(len(list_intersect(gs_a, gs_b)) AS DOUBLE)
             / CAST(len(gs_a) + len(gs_b) - len(list_intersect(gs_a, gs_b)) AS DOUBLE) AS jaccard
      FROM cand)
    WHERE jaccard >= 0.7
    """,
)

_TOKS = tokens_sql("text")
_NG3 = word_ngrams_sql(_TOKS, 3)

_register(
    "dedup_ngram_jaccard",
    lambda spark, sf: dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), n=3, threshold=0.5
    ),
    f"""
    WITH g AS (SELECT doc_id AS id, list_distinct({_NG3}) AS gs FROM documents)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.id AS id_a, c.id AS id_b,
             CAST(len(list_intersect(a.gs, c.gs)) AS DOUBLE)
             / CAST(len(a.gs) + len(c.gs) - len(list_intersect(a.gs, c.gs)) AS DOUBLE) AS jaccard
      FROM g a JOIN g c ON a.id < c.id
      WHERE len(list_intersect(a.gs, c.gs)) > 0)
    WHERE jaccard >= 0.5
    """,
)

_register(
    "dedup_simhash",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id", simhash32(TXT.tokens(F.col("text"))).alias("simhash")
    ),
    f"SELECT doc_id, {simhash_sql(_TOKS)} AS simhash FROM documents",
)

_register(
    "dedup_fingerprint",
    lambda spark, sf: dedup.doc_fingerprints(_t(spark, sf, "documents")),
    f"""
    SELECT doc_id,
           CASE WHEN len({word_ngrams_sql(_TOKS, 8)}) > 0
                THEN list_min(list_transform({word_ngrams_sql(_TOKS, 8)}, g -> {hash32_sql('g')}))
                ELSE {hash32_sql('lower(text)')} END AS fingerprint
    FROM documents
    """,
)

# Transitive closure of the near-dup pairs: DuckDB's recursive CTE IS the
# connected-components definition, so the iterative Spark algorithm
# (min-label propagation + pointer jumping, operators/dedup.py) is checked
# against declarative ground truth — exact match on every (doc_id, cluster).
_register(
    "dedup_duplicate_clusters",
    lambda spark, sf: dedup.duplicate_clusters(
        _t(spark, sf, "documents"), threshold=0.7
    ),
    f"""
    WITH RECURSIVE
    h AS (SELECT doc_id AS id,
                 list_distinct(list_transform({_SHINGLES}, s -> {hash60_sql('s')})) AS gs,
                 {_HASHED_SHINGLES} AS hs FROM documents),
    s AS (SELECT id, gs, {_SIG_LIST} AS sig FROM h),
    cand AS (
      SELECT a.id AS id_a, c.id AS id_b, a.gs AS gs_a, c.gs AS gs_b
      FROM s a JOIN s c ON a.id < c.id AND ({_BAND_EQ})
        AND {_SIG_MATCHES} >= {_MH_MIN_MATCHES}),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               CAST(len(list_intersect(gs_a, gs_b)) AS DOUBLE)
               / CAST(len(gs_a) + len(gs_b) - len(list_intersect(gs_a, gs_b)) AS DOUBLE) AS jaccard
        FROM cand)
      WHERE jaccard >= 0.7),
    und AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM und
      UNION
      SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
)

_register(
    "dedup_embedding_near_dup",
    lambda spark, sf: dedup.embedding_near_dup_pairs(
        # threshold 0.4 matches the oracle (see ann_hyperplane_near_dup)
        _t(spark, sf, "embeddings"), threshold=0.4
    ),
    f"""
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             {dot2_sql('a.embedding', 'c.embedding')} AS cosine
      FROM embeddings a JOIN embeddings c ON a.vec_id < c.vec_id)
    WHERE cosine >= 0.4
    """,
)

# ===========================================================================
# text analysis family
# ===========================================================================

_STOP_HITS = f"len(list_intersect({_TOKS}, {STOPWORDS_SQL}))"
_PUNCT_STRIPPED = "regexp_replace(text, '[.,;:!?]', '', 'g')"
_MTL = (
    f"CAST(coalesce(list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum'), 0) AS BIGINT)"
    f" / CAST(len({_TOKS}) AS DOUBLE)"
)
_STOP_RATIO = f"CAST({_STOP_HITS} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE)"
_PUNCT_RATIO = (
    f"CAST(length(text) - length({_PUNCT_STRIPPED}) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
)

_register(
    "text_stats",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id",
        TXT.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TXT.stopword_ratio(F.col("text")).alias("stop_ratio"),
        TXT.punct_ratio(F.col("text")).alias("punct_ratio"),
        TXT.mean_token_len(F.col("text")).alias("mean_tok_len"),
        TXT.quality_score(F.col("text")).alias("quality"),
    ),
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           {_STOP_RATIO} AS stop_ratio,
           {_PUNCT_RATIO} AS punct_ratio,
           {_MTL} AS mean_tok_len,
           ((1.0 - least(abs(({_MTL}) - 5.0) / 5.0, 1.0))
            + least(({_STOP_RATIO}) * 10.0, 1.0)
            + (1.0 - least(({_PUNCT_RATIO}) * 5.0, 1.0))) / 3.0 AS quality
    FROM documents
    """,
)

_LANG_HITS = {
    lang: f"len(list_intersect({_TOKS}, ["
    + ", ".join(f"'{w}'" for w in markers)
    + "]))"
    for lang, markers in sorted(TXT.LANG_MARKERS.items())
}
_LANG_MAX = "greatest(" + ", ".join(f"h_{lang}" for lang in _LANG_HITS) + ")"
# descending lang-code order = Spark greatest-of-structs tie-break (max lang)
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN h_{lang} = {_LANG_MAX} THEN '{lang}'"
        for lang in sorted(_LANG_HITS, reverse=True)
    )
    + " END"
)

_register(
    "text_lang_id",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id", TXT.lang_id(F.col("text")).alias("lang_pred")
    ),
    f"""
    WITH h AS (SELECT doc_id,
      {', '.join(f'{expr} AS h_{lang}' for lang, expr in _LANG_HITS.items())}
      FROM documents)
    SELECT doc_id, {_LANG_CASE} AS lang_pred FROM h
    """,
)

_register(
    "text_shingle_counts",
    lambda spark, sf: _t(spark, sf, "documents").select(
        "doc_id",
        F.size(TXT.char_shingles(F.col("text"), SHINGLE_N)).cast("long").alias("n_shingles"),
        F.size(TXT.word_ngrams(F.col("text"), 3)).cast("long").alias("n_ngrams3"),
        F.element_at(TXT.char_shingles(F.col("text"), SHINGLE_N), 1).alias("first_shingle"),
    ),
    f"""
    SELECT doc_id,
           CAST(len({_SHINGLES}) AS BIGINT) AS n_shingles,
           CAST(len({_NG3}) AS BIGINT) AS n_ngrams3,
           ({_SHINGLES})[1] AS first_shingle
    FROM documents
    """,
)

_register(
    "text_token_stats_by_lang",
    lambda spark, sf: _t(spark, sf, "documents")
    .groupBy("lang")
    .agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TXT.token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.sum(F.col("n_chars")).alias("total_chars"),
    ),
    f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)

