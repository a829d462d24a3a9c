"""Maintained NEAR-DUP CANDIDATE-PAIRS view: the banded-LSH MinHash
pair table (id_a, id_b, jaccard) kept incrementally fresh as the
document corpus ingests — "dedup today's crawl against 100 TB without
re-pairing the corpus".

The batch-vs-corpus algebra already exists
(operators/dedup.py:minhash_near_dup_incremental): a new batch's bands
probe the corpus band index, so pair discovery costs O(batch), never
O(corpus²). This module turns that one-shot call into a maintained
view with DELETE retraction:

* two internal TRANSFORM views over the source (each O(changed rows)
  per refresh, sources/matview.py:create_transform_view):
    - ``<view>_grams``: (key, gs) — 60-bit hashed shingle sets, the
      exact-verification payload (stored ONCE per doc, never
      duplicated across bands);
    - ``<view>_bands``: (key, band, bh, sig) — the banded signature
      index the probe equi-joins on (at fleet scale this table is
      bucketed by (band, bh) so probes are co-located joins).
* the PAIRS table itself, refreshed per source interval as ONE
  delete_and_append commit:
    - retraction: pairs touching a deleted/updated key become a
      delete vector (found by a broadcast semi-join of the Δ keys
      against the current pair rows — row volume is the touched
      pairs, the scan prunes on two key columns);
    - discovery: the Δ docs' bands probe the refreshed band index —
      new-vs-corpus and new-vs-new pairs only, with the same
      first-matching-band dedup + signature-agreement prefilter +
      exact Jaccard verification as the full pipeline, so the
      maintained state is row-identical to recomputing
      minhash_near_dup over the head (the oracle row
      ``vt_near_dup_pairs_view`` pins exactly that).

Refresh cost is bounded by Δ docs × band collisions — flat in corpus
size (tools/neardup_scale_proof.py; BASELINE.md). The view registers
in matview's graph (_VIEW_KINDS "nd_source"), so refresh_view /
refresh_cascade / describe_view / vacuum_source_safely all dispatch
to it; a pure insert-only interval needs no function handle at all.

Reference parity: the reference has no incremental dedup (B4 is a
one-shot SELECT, RS:214-223); this is the scale-path extension the
LLM-ingest pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..functions.hashing import (
    hash32_from_md5,
    hash60_from_md5,
    minhash_params,
    minhash_signature_over_hashed,
)
from ..operators.dedup import _first_band_only
from . import matview as M
from . import versioned as V

PAIR_COL = "_nd_pair"
_SEP = "\x01"
GRAMS_SUFFIX = "_grams"
BANDS_SUFFIX = "_bands"

_RETRACTING = ("delete", "update_preimage")
_INSERTING = ("insert", "update_post", "update_postimage")


def _grams_transform(key: str, text_col: str, shingle_n: int):
    def fn(df: DataFrame) -> DataFrame:
        m5 = F.transform(TXT.char_shingles(F.col(text_col), shingle_n),
                         F.md5)
        return df.select(
            key, F.array_distinct(F.transform(m5, hash60_from_md5))
            .alias("gs"))

    return fn


def _bands_transform(key: str, text_col: str, shingle_n: int,
                     num_hashes: int, bands: int, seed: int):
    params = minhash_params(num_hashes, seed)
    rpb = num_hashes // bands

    def fn(df: DataFrame) -> DataFrame:
        m5 = df.select(
            key,
            F.transform(TXT.char_shingles(F.col(text_col), shingle_n),
                        F.md5).alias("m5"))
        sig = m5.select(
            key, F.transform("m5", hash32_from_md5).alias("hs")
        ).select(key, minhash_signature_over_hashed("hs", params)
                 .alias("sig"))
        return sig.select(
            key, "sig",
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("band"),
                         F.slice("sig", i * rpb + 1, rpb).alias("bh"))
                for i in range(bands)
            ])).alias("bk"),
        ).select(key, F.col("bk.band").alias("band"),
                 F.col("bk.bh").alias("bh"), "sig")

    return fn


def _transform_names(spec: dict) -> tuple[str, str]:
    tag = (f"{spec['nd_shingle_n']}:{spec['nd_num_hashes']}:"
           f"{spec['nd_bands']}:{spec['nd_seed']}")
    return f"nd_grams:{tag}", f"nd_bands:{tag}"


def _index_fns(spec: dict):
    g = _grams_transform(spec["nd_key"], spec["nd_text_col"],
                         spec["nd_shingle_n"])
    b = _bands_transform(spec["nd_key"], spec["nd_text_col"],
                         spec["nd_shingle_n"], spec["nd_num_hashes"],
                         spec["nd_bands"], spec["nd_seed"])
    return g, b


def _min_matches(num_hashes: int, threshold: float) -> int:
    # signature-agreement prefilter cut, 4 binomial sd below the
    # threshold — the same constant minhash_near_dup uses, so the
    # maintained pair set is row-identical to the one-shot pipeline
    sd = (threshold * (1.0 - threshold) / num_hashes) ** 0.5
    return max(0, int(num_hashes * (threshold - 4.0 * sd)))


def _verified_pairs(cands: DataFrame, grams: DataFrame, key: str,
                    threshold: float) -> DataFrame:
    """Exact Jaccard verification over candidate (id_a, id_b) pairs —
    join the 60-bit shingle sets on both sides, keep >= threshold."""
    g = grams.select(F.col(key).alias("_gid"), "gs")
    joined = (
        cands
        .join(g.withColumnRenamed("_gid", "id_a")
               .withColumnRenamed("gs", "gs_a"), "id_a")
        .join(g.withColumnRenamed("_gid", "id_b")
               .withColumnRenamed("gs", "gs_b"), "id_b")
    )
    inter = F.size(F.array_intersect("gs_a", "gs_b")).cast("double")
    union = (F.size("gs_a") + F.size("gs_b")).cast("double") - inter
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _with_pair_col(pairs: DataFrame) -> DataFrame:
    return pairs.withColumn(
        PAIR_COL,
        F.concat(F.col("id_a").cast("string"), F.lit(_SEP),
                 F.col("id_b").cast("string")))


def _full_pairs(band_df: DataFrame, gram_df: DataFrame, spec: dict
                ) -> DataFrame:
    """The complete pair set from the index views (create / heal path)
    — the same plan as minhash_near_dup's self-join, reading the
    maintained index instead of re-hashing the text."""
    key = spec["nd_key"]
    rpb = spec["nd_num_hashes"] // spec["nd_bands"]
    a, b = band_df.alias("a"), band_df.alias("b")
    ka, kb = F.col(f"a.{key}"), F.col(f"b.{key}")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh")) & (ka < kb))
        .where(_first_band_only(F.col("a.sig"), F.col("b.sig"),
                                F.col("a.band"), rpb))
        .where(_sig_agree() >= _min_matches(spec["nd_num_hashes"],
                                            spec["nd_threshold"]))
        .select(ka.alias("id_a"), kb.alias("id_b"))
    )
    return _verified_pairs(cands, gram_df, key, spec["nd_threshold"])


def _sig_agree():
    return F.size(F.filter(
        F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
        lambda m: m))


def _probe_pairs(band_df: DataFrame, gram_df: DataFrame,
                 ins_keys: DataFrame, spec: dict) -> DataFrame:
    """Δ-bounded pair discovery: inserted docs' bands (probe side)
    equi-join the full band index (corpus side, which includes the
    inserted docs). Orientation rule — corpus-old×new pairs appear in
    exactly one order (the corpus side is not new), new×new pairs are
    kept only when corpus key < probe key — so each pair is emitted
    once; the stored orientation is always (lesser id, greater id)."""
    key = spec["nd_key"]
    rpb = spec["nd_num_hashes"] // spec["nd_bands"]
    # ONE broadcast and ONE pass over the band index: the Δ-key flag
    # join serves both sides — the probe side is the flagged frame
    # filtered to the new keys (no second semi-join / second broadcast
    # on the hot refresh path)
    ins = F.broadcast(ins_keys.select(F.col(key).alias("_ins_key"))
                      .distinct())
    corpus = (band_df.join(ins, band_df[key] == F.col("_ins_key"),
                           "left")
              .withColumn("_is_new", F.col("_ins_key").isNotNull())
              .drop("_ins_key"))
    probe = corpus.where(F.col("_is_new")).drop("_is_new")
    a, b = corpus.alias("a"), probe.alias("b")
    ka, kb = F.col(f"a.{key}"), F.col(f"b.{key}")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh")) & (ka != kb))
        .where(~F.col("a._is_new") | (ka < kb))
        .where(_first_band_only(F.col("a.sig"), F.col("b.sig"),
                                F.col("a.band"), rpb))
        .where(_sig_agree() >= _min_matches(spec["nd_num_hashes"],
                                            spec["nd_threshold"]))
        .select(F.least(ka, kb).alias("id_a"),
                F.greatest(ka, kb).alias("id_b"))
    )
    return _verified_pairs(cands, gram_df, key, spec["nd_threshold"])


def create_near_dup_pairs_view(
    spark: SparkSession, source_path: str, view_path: str, key: str,
    text_col: str = "text", shingle_n: int = 5, num_hashes: int = 32,
    bands: int = 8, threshold: float = 0.7, seed: int = 42,
) -> int:
    """Materialize the near-dup pair table over the source's head and
    record the spec + cursor; the two index transform views are created
    alongside (``<view>_grams``, ``<view>_bands``). ``key`` must be a
    unique non-null row identity (the transform-view contract)."""
    if num_hashes % bands:
        raise ValueError(f"bands {bands} must divide num_hashes "
                         f"{num_hashes}")
    spec = {
        "nd_source": source_path, "nd_key": key,
        "nd_text_col": text_col, "nd_shingle_n": int(shingle_n),
        "nd_num_hashes": int(num_hashes), "nd_bands": int(bands),
        "nd_threshold": float(threshold), "nd_seed": int(seed),
    }
    gname, bname = _transform_names(spec)
    gfn, bfn = _index_fns(spec)
    M.create_transform_view(spark, source_path, view_path + GRAMS_SUFFIX,
                            key=key, transform=gfn, name=gname)
    M.create_transform_view(spark, source_path, view_path + BANDS_SUFFIX,
                            key=key, transform=bfn, name=bname)
    # converge the two index views on ONE source version (a source
    # commit can race between the two creates) and PIN the reads at
    # the index versions whose cursors were verified — reading the
    # index heads here would materialize pairs past the recorded
    # cursor, which the first refresh would then re-append
    src_v, gv, bv = _refresh_indexes(spark, view_path, spec)
    band_df = M._read_source(spark, view_path + BANDS_SUFFIX, bv)
    gram_df = M._read_source(spark, view_path + GRAMS_SUFFIX, gv)
    state = _with_pair_col(_full_pairs(band_df, gram_df, spec))
    return V.create(spark, view_path, state,
                    extra={"app": spec | {"nd_source_version": src_v}})


def _spec_nd(path: str, version: int | None = None) -> dict:
    v = V.current_version(path) if version is None else int(version)
    spec = V._manifest(path, v).get("app") or {}
    if "nd_source" not in spec:
        raise ValueError(f"{path} is not a near-dup pairs view "
                         f"(no nd_source in its manifest app namespace)")
    return spec


def read_near_dup_pairs_view(spark: SparkSession, view_path: str,
                             version: int | None = None) -> DataFrame:
    """The pair table at a version (default head), maintenance key
    hidden."""
    return V.read(spark, view_path, version).drop(PAIR_COL)


def _converge_indexes(spark: SparkSession, view_path: str,
                      indexes, recompute_fraction: float | None = None
                      ) -> tuple[int, list[int]]:
    """Advance a pair view's index transform views to a COMMON source
    version (re-run on the rare race where the source commits between
    the refreshes) and return ``(src_v, [index view versions])`` — the
    versions whose cursors equal src_v, so callers read the indexes
    PINNED (one consistent read): reading the index heads instead
    would let a concurrent refresher's later commit leak future docs
    into this interval's probe, and the next refresh would re-discover
    (duplicate) those pairs. ``indexes`` is [(path, fn, name), ...]."""
    for _ in range(5):
        for path, fn, name in indexes:
            M.refresh_transform_view_with_retry(
                spark, path, fn, name,
                recompute_fraction=recompute_fraction)
        views = [V.current_version(p) for p, _f, _n in indexes]
        cursors = [int(M._spec_tv(p, v)["tv_source_version"])
                   for (p, _f, _n), v in zip(indexes, views)]
        if len(set(cursors)) == 1:
            return cursors[0], views
    raise RuntimeError(
        f"index views for {view_path} could not converge on one source "
        f"version after 5 rounds (source committing continuously?)")


def _refresh_indexes(spark: SparkSession, view_path: str, spec: dict,
                     recompute_fraction: float | None = None
                     ) -> tuple[int, int, int]:
    """_converge_indexes over the MinHash flavor's gram/band views."""
    gname, bname = _transform_names(spec)
    gfn, bfn = _index_fns(spec)
    src_v, (gvv, bvv) = _converge_indexes(
        spark, view_path,
        [(view_path + GRAMS_SUFFIX, gfn, gname),
         (view_path + BANDS_SUFFIX, bfn, bname)],
        recompute_fraction=recompute_fraction)
    return src_v, gvv, bvv


def _refresh_pairs_table(spark: SparkSession, view_path: str,
                         view_v: int, spec: dict, prefix: str,
                         v_to: int, full_state_fn, probe_fn,
                         recompute_fraction) -> int:
    """The SHARED maintenance skeleton both pair-view flavors
    (MinHash-shingle and hyperplane-embedding) run per interval:
    retract pairs touching retracted keys (delete vector, found by a
    broadcast semi-join on the Δ keys), probe the pinned index with
    the inserted keys, publish both as ONE delete_and_append commit. A
    rewriting interval that trips the shared cost model — or a
    vacuumed/rolled-back source — heals by full recompute from the
    refreshed indexes (one overwrite, identical rows)."""
    src = spec[f"{prefix}_source"]
    v_from = int(spec[f"{prefix}_source_version"])
    key = spec[f"{prefix}_key"]
    if v_to == v_from:
        return view_v
    new_app = dict(spec) | {f"{prefix}_source_version": v_to}

    def _recompute() -> int:
        state = _with_pair_col(full_state_fn())
        return V.overwrite(spark, view_path, state,
                           extra={"app": new_app},
                           parent_version=view_v)

    # Pair-view cost model: "recompute" here is the full banded
    # SELF-JOIN over the whole corpus, not one pass over the head —
    # the shared row-scan model (bound > fraction x head) undercosts
    # it by the pairing factor, and any interval containing a
    # retraction has bound ~= 2 x head, which would trip full corpus
    # re-pairing on EVERY delete under the 0.5 default. So the cost
    # trip is DISABLED for the pairs table itself (the O(delta)
    # retract+probe path is always preferred, per the module's
    # "never re-pair the corpus" contract); recompute_fraction keeps
    # exactly its heal semantics — a rolled-back source self-heals
    # when it is set, raises the named error when it is None. The
    # index transform views above still dispatch under the row model,
    # where recompute really is one head pass.
    try:
        recompute, _bounds = M._dispatch_recompute(
            None, [(src, v_from, v_to)])
    except RuntimeError:
        if recompute_fraction is None:
            raise
        recompute = True  # rollback self-heal, as with the row model
    if recompute:
        return _recompute()
    try:
        ch = M._changes_since_cursor(spark, src, v_from, v_to, key)
    except RuntimeError:
        return _recompute()  # vacuumed past the cursor: heal
    ch = ch.persist()
    try:
        del_keys = (ch.where(F.col("_change_type").isin(*_RETRACTING))
                    .select(key).distinct())
        ins_keys = (ch.where(F.col("_change_type").isin(*_INSERTING))
                    .select(key).distinct())
        cur = V.read(spark, view_path, view_v)
        dk = F.broadcast(del_keys.withColumnRenamed(key, "_dk"))
        del_pairs = (
            cur.join(dk, cur["id_a"] == F.col("_dk"), "leftsemi")
            .unionByName(
                cur.join(dk, cur["id_b"] == F.col("_dk"), "leftsemi"))
            .select(PAIR_COL).distinct()
        )
        new_pairs = _with_pair_col(probe_fn(ins_keys))
        return V.delete_and_append(
            spark, view_path, del_pairs, PAIR_COL, new_pairs,
            extra={"app": new_app}, parent_version=view_v)
    finally:
        ch.unpersist()


def refresh_near_dup_pairs_view(
        spark: SparkSession, view_path: str,
        recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    """Advance the pair table to the source head: refresh the index
    views (O(changed docs)), then run the shared retract+probe+commit
    skeleton (_refresh_pairs_table) against the PINNED index reads —
    a concurrent refresher advancing the shared indexes must not leak
    future docs into this interval's probe (duplicate-pair hazard)."""
    view_v = V.current_version(view_path)
    spec = _spec_nd(view_path, view_v)
    v_to, gv, bv = _refresh_indexes(spark, view_path, spec,
                                    recompute_fraction=recompute_fraction)
    if v_to == int(spec["nd_source_version"]):
        return view_v  # fresh: no manifest/parquet reads on the poll path
    band_df = M._read_source(spark, view_path + BANDS_SUFFIX, bv)
    gram_df = M._read_source(spark, view_path + GRAMS_SUFFIX, gv)
    return _refresh_pairs_table(
        spark, view_path, view_v, spec, "nd", v_to,
        full_state_fn=lambda: _full_pairs(band_df, gram_df, spec),
        probe_fn=lambda ins: _probe_pairs(band_df, gram_df, ins, spec),
        recompute_fraction=recompute_fraction)


def refresh_near_dup_pairs_view_with_retry(
    spark: SparkSession, view_path: str, max_retries: int = 3,
    recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    """OCC rebase loop (the standard view-refresh retry contract)."""
    return M._refresh_with_retry(
        lambda: refresh_near_dup_pairs_view(
            spark, view_path, recompute_fraction=recompute_fraction),
        max_retries)


# ===========================================================================
# EMBEDDING near-dup pairs view: hyperplane-multiset LSH over an
# embedding column — the vector twin of the MinHash flavor, sharing
# the same maintenance skeleton. The candidate tier is
# ann.hyperplane_lsh_near_dup_multiset's algebra (n_sets independently
# seeded sign-bit bucketings, union, distinct), verification is exact
# cosine ≥ threshold; planes derive deterministically from the seed in
# the spec, so every refresh buckets identically and the maintained
# state is row-identical to the one-shot pipeline over the head.
# ===========================================================================

EVECS_SUFFIX = "_evecs"
EBKTS_SUFFIX = "_ebuckets"


def _evecs_transform(key: str, vec_col: str):
    def fn(df: DataFrame) -> DataFrame:
        return df.select(key, F.col(vec_col).alias("v"))

    return fn


def _ebkts_transform(key: str, vec_col: str, n_planes: int, n_sets: int,
                     seed: int, dim: int):
    from ..operators import ann as A

    def fn(df: DataFrame) -> DataFrame:
        # buckets are PRECOMPUTED into the index (the literal-planes
        # expression tree is planned once per refresh over Δ rows, and
        # probes reuse the stored column — never re-planned per probe)
        sets = [
            F.struct(
                F.lit(s).alias("pset"),
                A.hyperplane_bucket_col(
                    vec_col,
                    A.hyperplanes(n_planes, dim, seed + s)).alias("bkt"))
            for s in range(n_sets)
        ]
        return (df.select(key, F.explode(F.array(*sets)).alias("sb"))
                .select(key, F.col("sb.pset").alias("pset"),
                        F.col("sb.bkt").alias("bkt")))

    return fn


def _ed_transform_names(spec: dict) -> tuple[str, str]:
    tag = (f"{spec['ed_n_planes']}:{spec['ed_n_sets']}:"
           f"{spec['ed_seed']}:{spec['ed_dim']}")
    return f"ed_vecs:{spec['ed_vec_col']}", f"ed_buckets:{tag}"


def _ed_index_fns(spec: dict):
    v = _evecs_transform(spec["ed_key"], spec["ed_vec_col"])
    b = _ebkts_transform(spec["ed_key"], spec["ed_vec_col"],
                         spec["ed_n_planes"], spec["ed_n_sets"],
                         spec["ed_seed"], spec["ed_dim"])
    return v, b


def _ed_verified(cands: DataFrame, vec_df: DataFrame, key: str,
                 threshold: float) -> DataFrame:
    from ..functions import vector as VEC

    v = vec_df.select(F.col(key).alias("_vid"), "v")
    joined = (
        cands
        .join(v.withColumnRenamed("_vid", "id_a")
               .withColumnRenamed("v", "va"), "id_a")
        .join(v.withColumnRenamed("_vid", "id_b")
               .withColumnRenamed("v", "vb"), "id_b")
    )
    return (joined.withColumn("cosine", VEC.dot("va", "vb"))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _ed_full_pairs(bkt_df: DataFrame, vec_df: DataFrame, spec: dict
                   ) -> DataFrame:
    key = spec["ed_key"]
    a, b = bkt_df.alias("a"), bkt_df.alias("b")
    ka, kb = F.col(f"a.{key}"), F.col(f"b.{key}")
    cands = (
        a.join(b, (F.col("a.pset") == F.col("b.pset"))
               & (F.col("a.bkt") == F.col("b.bkt")) & (ka < kb))
        .select(ka.alias("id_a"), kb.alias("id_b"))
        .distinct()  # a pair colliding in several plane sets is ONE pair
    )
    return _ed_verified(cands, vec_df, key, spec["ed_threshold"])


def _ed_probe_pairs(bkt_df: DataFrame, vec_df: DataFrame,
                    ins_keys: DataFrame, spec: dict) -> DataFrame:
    key = spec["ed_key"]
    ins = F.broadcast(ins_keys.select(F.col(key).alias("_ins_key"))
                      .distinct())
    corpus = (bkt_df.join(ins, bkt_df[key] == F.col("_ins_key"), "left")
              .withColumn("_is_new", F.col("_ins_key").isNotNull())
              .drop("_ins_key"))
    probe = corpus.where(F.col("_is_new")).drop("_is_new")
    a, b = corpus.alias("a"), probe.alias("b")
    ka, kb = F.col(f"a.{key}"), F.col(f"b.{key}")
    cands = (
        a.join(b, (F.col("a.pset") == F.col("b.pset"))
               & (F.col("a.bkt") == F.col("b.bkt")) & (ka != kb))
        .where(~F.col("a._is_new") | (ka < kb))
        .select(F.least(ka, kb).alias("id_a"),
                F.greatest(ka, kb).alias("id_b"))
        .distinct()
    )
    return _ed_verified(cands, vec_df, key, spec["ed_threshold"])


def create_embed_near_dup_pairs_view(
    spark: SparkSession, source_path: str, view_path: str, key: str,
    vec_col: str = "embedding", threshold: float = 0.95,
    n_planes: int = 6, n_sets: int = 3, seed: int = 42,
    dim: int | None = None,
) -> int:
    """Materialize the EMBEDDING near-dup pair table (cosine ≥
    threshold through the hyperplane-multiset candidate tier) over the
    source's head; the bucket/vector index transform views are created
    alongside. ``dim`` is frozen in the spec (inferred from the source
    when omitted) so every refresh derives identical planes."""
    if dim is None:
        probe = M._read_source(spark, source_path).select(
            F.size(vec_col)).first()
        if probe is None or probe[0] is None:
            raise ValueError(f"cannot infer {vec_col} dim from an "
                             f"empty source; pass dim=")
        dim = int(probe[0])
    spec = {
        "ed_source": source_path, "ed_key": key, "ed_vec_col": vec_col,
        "ed_threshold": float(threshold), "ed_n_planes": int(n_planes),
        "ed_n_sets": int(n_sets), "ed_seed": int(seed),
        "ed_dim": int(dim),
    }
    vname, bname = _ed_transform_names(spec)
    vfn, bfn = _ed_index_fns(spec)
    M.create_transform_view(spark, source_path, view_path + EVECS_SUFFIX,
                            key=key, transform=vfn, name=vname)
    M.create_transform_view(spark, source_path, view_path + EBKTS_SUFFIX,
                            key=key, transform=bfn, name=bname)
    src_v, vv, bv = _ed_refresh_indexes(spark, view_path, spec)
    bkt_df = M._read_source(spark, view_path + EBKTS_SUFFIX, bv)
    vec_df = M._read_source(spark, view_path + EVECS_SUFFIX, vv)
    state = _with_pair_col(_ed_full_pairs(bkt_df, vec_df, spec))
    return V.create(spark, view_path, state,
                    extra={"app": spec | {"ed_source_version": src_v}})


def _spec_ed(path: str, version: int | None = None) -> dict:
    v = V.current_version(path) if version is None else int(version)
    spec = V._manifest(path, v).get("app") or {}
    if "ed_source" not in spec:
        raise ValueError(f"{path} is not an embedding near-dup pairs "
                         f"view (no ed_source in its manifest)")
    return spec


def read_embed_near_dup_pairs_view(spark: SparkSession, view_path: str,
                                   version: int | None = None
                                   ) -> DataFrame:
    return V.read(spark, view_path, version).drop(PAIR_COL)


def _ed_refresh_indexes(spark: SparkSession, view_path: str, spec: dict,
                        recompute_fraction: float | None = None
                        ) -> tuple[int, int, int]:
    """_converge_indexes over the embedding flavor's vec/bucket views."""
    vname, bname = _ed_transform_names(spec)
    vfn, bfn = _ed_index_fns(spec)
    src_v, (vvv, bvv) = _converge_indexes(
        spark, view_path,
        [(view_path + EVECS_SUFFIX, vfn, vname),
         (view_path + EBKTS_SUFFIX, bfn, bname)],
        recompute_fraction=recompute_fraction)
    return src_v, vvv, bvv


def refresh_embed_near_dup_pairs_view(
        spark: SparkSession, view_path: str,
        recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    """Advance the embedding pair table to the source head — the same
    pinned-index + shared-skeleton contract as the MinHash flavor."""
    view_v = V.current_version(view_path)
    spec = _spec_ed(view_path, view_v)
    v_to, vv, bv = _ed_refresh_indexes(
        spark, view_path, spec, recompute_fraction=recompute_fraction)
    if v_to == int(spec["ed_source_version"]):
        return view_v  # fresh: no manifest/parquet reads on the poll path
    bkt_df = M._read_source(spark, view_path + EBKTS_SUFFIX, bv)
    vec_df = M._read_source(spark, view_path + EVECS_SUFFIX, vv)
    return _refresh_pairs_table(
        spark, view_path, view_v, spec, "ed", v_to,
        full_state_fn=lambda: _ed_full_pairs(bkt_df, vec_df, spec),
        probe_fn=lambda ins: _ed_probe_pairs(bkt_df, vec_df, ins, spec),
        recompute_fraction=recompute_fraction)


def refresh_embed_near_dup_pairs_view_with_retry(
    spark: SparkSession, view_path: str, max_retries: int = 3,
    recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    return M._refresh_with_retry(
        lambda: refresh_embed_near_dup_pairs_view(
            spark, view_path, recompute_fraction=recompute_fraction),
        max_retries)
