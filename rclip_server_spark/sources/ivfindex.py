"""Maintained IVF (inverted-file) index view: the source's embedding
rows stored WITH their nearest-centroid cell, kept in sync through the
CDC log — the coarse-quantizer twin of the LSH ann_index, completing
the ad-hoc ladder's IVF tier (operators/ann.py ivf_topk /
write_partitioned_by_ivf) with O(changed rows) maintenance.

Reference parity: the reference scores every row per query
(rclip_server.py:150-166); the ad-hoc IVF tier prunes that scan but
re-assigns the whole corpus per call (ivf_assign is a map pass over
every row). The maintained index moves assignment to WRITE time: a
refresh costs O(changed rows) (key delete-vector retraction + assigned
rows append, ONE delete_and_append commit), and a query reads only the
``n_probe`` nearest cells' rows — O(probe fraction), never O(corpus).

Centroids are trained ONCE at create time (operators/ann.py
ivf_train_kmeans — deterministic k-means, or caller-provided explicit
centroids) and FROZEN in the manifest spec: retraining on refresh
would force a full corpus re-assignment (O(corpus), the exact cost
the index exists to avoid) and silently reshuffle every cell. This is
the standard IVF maintenance contract (FAISS trains the coarse
quantizer once and adds incrementally); under real distribution
drift, recall decays gracefully and the heal is an explicit re-create
— an operator decision, never an implicit 100 TB rewrite.

Exactness: query_ivf_index ranks cells driver-side from the spec's
stored centroids (KB-sized: n_cells x dim floats in the manifest app
namespace — zero Spark jobs) and exact-dot re-ranks only the probed
cells' rows, so the result is row-identical to ann.ivf_topk over the
current source with the same centroids (pinned by an oracle row
against a DuckDB argmax+dot twin). Joins the matview graph through
the standard marker registry (``ii_source``), so REFRESH / CASCADE /
DESCRIBE / cursor-safe VACUUM / refresh streams all work unchanged.

Scale: the index build is one map pass (assignment is a
greatest-of-structs over literal centroids); at rest the state can be
hash-bucketed on ``ivf_cell`` (convert_index_to_bucketed) so probe
queries skip FILES at manifest resolution — only the probed cells'
buckets' segments are ever named in the plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as VEC
from ..functions.localrel import values_df
from ..operators.ann import ivf_assign, ivf_train_kmeans
from . import matview as M
from . import versioned as V
from .matview import _INSERTING, _RETRACTING


def _assigned_rows(df: DataFrame, key: str, vec_col: str,
                   centroids: np.ndarray, codebooks=None,
                   include_cols: tuple[str, ...] = ()) -> DataFrame:
    """(ivf_cell, key, vec[, pq_codes][, payload…]) — plain
    assignment, or (with codebooks) the IVFADC encode: cell + residual
    PQ codes + the full-precision vector for the exact re-rank tier,
    all in ONE Arrow pass (ann.ivf_pq_encode keep_cols).
    ``include_cols`` ride along as filterable payload."""
    inc = list(include_cols)
    if codebooks is None:
        a = ivf_assign(df, centroids, id_col=key, vec_col=vec_col,
                       keep_cols=inc)
        return a.select("ivf_cell", key, vec_col, *inc)
    from ..operators.ann import ivf_pq_encode

    enc = ivf_pq_encode(df, centroids, np.asarray(codebooks),
                        id_col=key, vec_col=vec_col,
                        keep_cols=[vec_col] + inc)
    return enc.select("ivf_cell", key, vec_col, "pq_codes", *inc)


def create_ivf_index(
    spark: SparkSession, source_path: str, view_path: str, key: str,
    vec_col: str = "embedding", n_cells: int = 8, iters: int = 3,
    init: str = "first_k", centroids=None, dim: int | None = None,
    pq_m: int | None = None, pq_k: int = 64, pq_iters: int = 10,
    pq_sample: int = 4096, pq_seed: int = 42, codebooks=None,
    include_cols: list[str] | None = None,
) -> int:
    """Train centroids over the source's head (or take explicit
    ``centroids`` — deterministic external quantizers, test fixtures),
    materialize the assigned rows, and record spec + cursor + the
    full centroid matrix (exact float64 round-trip through the
    manifest JSON). Explicit centroids are UNIT-NORMALIZED like the
    kmeans path's output: assignment is by max dot product
    (ivf_assign), which equals nearest-centroid only for constant-norm
    centroids — silently honoring non-unit rows would change
    assignment semantics. Rows already unit within 1e-9 are stored
    BIT-AS-GIVEN (re-dividing by a 1±1ulp norm would perturb
    deterministic oracle fixtures for zero semantic gain).

    ``pq_m`` turns the index into IVFADC (Jegou/Douze/Schmid 2011):
    residual PQ codebooks (``pq_m`` subspaces × ``pq_k`` centroids)
    train ONCE on a deterministic min-key sample of the head
    (``pq_sample`` rows driver-side — the standard recipe: codebooks
    need a sample, not the corpus), freeze in the spec alongside the
    centroids, and every row additionally stores its ``pq_codes`` —
    queries can then score candidates from the code bytes (method=
    'adc' on query_ivf_index) and exact-re-rank only a shortlist.
    Alternatively pass explicit ``codebooks`` (shape
    (m_sub, k_cent, dim/m_sub) — external quantizers, deterministic
    oracle fixtures); residual codebooks quantize x - centroid, whose
    norm carries the geometry, so explicit books are stored as-is
    (never normalized), mutually exclusive with ``pq_m``.

    ``include_cols`` copies the listed source columns into the index
    rows as FILTERABLE PAYLOAD (query_ivf_index ``where=``): the
    predicate evaluates inside the probed-cell scan, parquet-pushed,
    so filtered vector search never joins back to the source."""
    from .matview import _check_include_cols

    src_v = V.current_version(source_path)
    df = M._read_source(spark, source_path, src_v)
    inc = _check_include_cols(df, key, vec_col, include_cols,
                              reserved=("ivf_cell", "pq_codes"))
    if centroids is None:
        centroids = ivf_train_kmeans(df, k=int(n_cells), iters=int(iters),
                                     id_col=key, vec_col=vec_col,
                                     init=init)
        trained = f"kmeans:{init}:{int(iters)}"
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
        if centroids.ndim == 2:
            norms = np.linalg.norm(centroids, axis=1, keepdims=True)
            if not (norms > 0).all():
                raise ValueError("explicit centroids must be non-zero "
                                 "rows (assignment is by max dot)")
            if not np.allclose(norms, 1.0, rtol=0.0, atol=1e-9):
                centroids = centroids / norms
        trained = "explicit"
    if centroids.ndim != 2:
        raise ValueError(f"centroids must be a (n_cells, dim) matrix, "
                         f"got shape {centroids.shape}")
    if dim is None:
        dim = int(centroids.shape[1])
    if centroids.shape[1] != dim:
        raise ValueError(f"centroids must be (n_cells, {dim}), got "
                         f"{centroids.shape}")
    spec = {
        "ii_source": source_path, "ii_key": key,
        "ii_vec_col": vec_col, "ii_n_cells": int(centroids.shape[0]),
        "ii_dim": int(dim), "ii_trained": trained,
        "ii_source_version": src_v,
        "ii_centroids": [[float(x) for x in c] for c in centroids],
        "ii_include_cols": inc,
    }
    books = None
    if codebooks is not None:
        if pq_m is not None:
            raise ValueError("pass pq_m (train residual codebooks) OR "
                             "codebooks (explicit), not both")
        books = np.asarray(codebooks, dtype=np.float64)
        if books.ndim != 3 or books.shape[0] * books.shape[2] != dim:
            raise ValueError(
                f"explicit codebooks must be (m_sub, k_cent, "
                f"dim/m_sub) with m_sub*dsub == {dim}, got shape "
                f"{books.shape}")
        spec["ii_codebooks"] = [[[float(x) for x in c] for c in b]
                                for b in books]
    if pq_m is not None:
        from ..operators.ann import ivf_pq_train

        if dim % int(pq_m):
            raise ValueError(f"pq_m={pq_m} must divide dim {dim}")
        # deterministic sample: min-key rows (content-keyed, no rand)
        sample_rows = (df.orderBy(F.asc(key)).limit(int(pq_sample))
                       .select(vec_col).collect())
        if not sample_rows:
            raise ValueError("cannot train PQ codebooks on an empty "
                             "source")
        sample = np.asarray([r[0] for r in sample_rows],
                            dtype=np.float64)
        books = ivf_pq_train(sample, centroids, m_sub=int(pq_m),
                             k_cent=int(pq_k), iters=int(pq_iters),
                             seed=int(pq_seed))
        spec["ii_codebooks"] = [[[float(x) for x in c] for c in b]
                                for b in books]
        # training recipe recorded so retrain_ivf_index (the drift
        # heal) can rebuild the books against the NEW centroids with
        # the same parameters
        spec["ii_pq_params"] = {
            "m": int(pq_m), "k": int(pq_k), "iters": int(pq_iters),
            "sample": int(pq_sample), "seed": int(pq_seed)}
    state = _assigned_rows(df, key, vec_col, centroids,
                           codebooks=books, include_cols=tuple(inc))
    # drift governance baseline: per-cell counts + summed quantization
    # error of the create-time corpus, frozen alongside the centroids.
    # One extra assignment pass at create (rare, already O(corpus));
    # refreshes roll the CURRENT twin forward O(delta).
    counts, sum_qe = _cell_stats(spark, state, vec_col, centroids)
    spec |= {
        "ii_base_cell_counts": counts, "ii_base_sum_qe": sum_qe,
        "ii_cur_cell_counts": list(counts), "ii_cur_sum_qe": sum_qe,
        "ii_drift_tv_threshold": 0.25, "ii_drift_mqe_threshold": 1.5,
    }
    return V.create(spark, view_path, state, extra={"app": spec})


def _cell_stats(spark: SparkSession, rows: DataFrame, vec_col: str,
                centroids: np.ndarray, sign_col: str | None = None
                ) -> tuple[list[int], float]:
    """(per-cell row counts, summed quantization error) of already-
    assigned rows: qe = ||x - c_cell||^2 expanded as |x|^2 - 2 x.c +
    |c|^2 in JVM column math over a broadcast n_cells-row centroid
    frame. KB-sized drift evidence from ONE small aggregation —
    O(given rows): the full state at create/heal, the interval's
    delta inside a refresh. ``sign_col`` turns the aggregation into a
    signed roll-forward (inserts +1, retractions -1 in one job)."""
    n_cells = int(centroids.shape[0])
    cdf = values_df(
        spark,
        [(int(i), [float(x) for x in centroids[i]],
          float(centroids[i] @ centroids[i])) for i in range(n_cells)],
        "ivf_cell int, _cent array<double>, _cnsq double")
    qe = (VEC.dot(F.col(vec_col), F.col(vec_col))
          - F.lit(2.0) * VEC.dot(F.col(vec_col), F.col("_cent"))
          + F.col("_cnsq"))
    sgn = (F.col(sign_col).cast("double") if sign_col
           else F.lit(1.0))
    agg = (rows.join(F.broadcast(cdf), "ivf_cell")
           .groupBy("ivf_cell")
           .agg(F.sum(sgn).alias("n"), F.sum(qe * sgn).alias("sqe"))
           .collect())
    counts = [0] * n_cells
    sum_qe = 0.0
    for r in agg:
        counts[int(r["ivf_cell"])] = int(r["n"] or 0)
        sum_qe += float(r["sqe"] or 0.0)
    return counts, sum_qe


def _spec_ii(path: str, version: int | None = None) -> dict:
    v = V.current_version(path) if version is None else int(version)
    spec = V._manifest(path, v).get("app") or {}
    if "ii_source" not in spec:
        raise ValueError(f"{path} is not an ivf-index view (no "
                         f"ii_source in its manifest app namespace)")
    return spec


def _centroids(spec: dict) -> np.ndarray:
    return np.asarray(spec["ii_centroids"], dtype=np.float64)


def _codebooks(spec: dict):
    b = spec.get("ii_codebooks")
    return None if b is None else np.asarray(b, dtype=np.float64)


def _state(spark: SparkSession, view_path: str, v: int,
           cells: list[int] | None = None) -> DataFrame:
    """Layout-dispatched state read through the shared serving read
    (versioned.read_probed, bucket key = ivf_cell): on the bucketed
    at-rest layout the probed CELLS resolve to physical buckets
    driver-side and only those buckets' segment files enter the plan,
    schema pinned from the manifest — zero pre-scan Spark jobs."""
    return V.read_probed(
        spark, view_path, v, "ivf_cell",
        probe_values=None if cells is None else [int(c) for c in
                                                 cells])


def read_ivf_index(spark: SparkSession, view_path: str,
                   version: int | None = None) -> DataFrame:
    """The assigned rows at a version, canonical column order
    (+ pq_codes on an IVFADC index)."""
    v = V.current_version(view_path) if version is None else int(version)
    spec = _spec_ii(view_path, v)
    cols = ["ivf_cell", spec["ii_key"], spec["ii_vec_col"]]
    if spec.get("ii_codebooks") is not None:
        cols.append("pq_codes")
    cols += spec.get("ii_include_cols", [])
    return _state(spark, view_path, v).select(*cols)


def convert_index_to_bucketed(spark: SparkSession, view_path: str,
                              n_buckets: int | None = None) -> int:
    """Physically lay the index out by its ``ivf_cell`` column
    (versioned.convert_to_bucketed): one rewrite, after which a probe
    query's candidate read SKIPS FILES, not rows. Default n_buckets =
    n_cells (one physical bucket per cell modulo hash collisions),
    capped at 256."""
    spec = _spec_ii(view_path)
    if n_buckets is None:
        n_buckets = min(int(spec["ii_n_cells"]), 256)
    return V.convert_to_bucketed(spark, view_path, "ivf_cell",
                                 int(n_buckets))


def refresh_ivf_index(
    spark: SparkSession, view_path: str,
    recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    """Advance the index to the source head: retract changed keys'
    rows (key delete vector), append the new rows WITH their cells
    under the FROZEN centroids — ONE delete_and_append commit,
    O(changed rows). Rollback/vacuumed-past-cursor heals by full
    recompute (same assignments — the centroids don't move, so heal
    is layout repair, never a semantic change). All structure lives
    in the shared skeleton (matview._refresh_index); this kind
    contributes assignment under the frozen quantizers plus the
    DRIFT-counter hooks: the frozen-centroid contract means recall
    decays SILENTLY under distribution drift, so every refresh rolls
    the current per-cell counts and summed quantization error forward
    exactly from the interval (insert stats over the new rows, minus
    retract stats over the pre-images — both O(delta)), against the
    create-time baseline frozen in the spec. ivf_drift_report /
    DESCRIBE INDEX read the alarm from the manifest, zero Spark
    jobs; the documented heal is an explicit re-create."""

    def _rows(spec, df):
        return _assigned_rows(
            df, spec["ii_key"], spec["ii_vec_col"], _centroids(spec),
            codebooks=_codebooks(spec),
            include_cols=tuple(spec.get("ii_include_cols", [])))

    def _app_recompute(spark_, spec, head, app):
        # heal path re-derives the CURRENT stats from the head (the
        # heal already rescans the corpus); the baseline stays frozen
        # — a heal is layout repair, never a drift absolution
        if "ii_base_cell_counts" not in spec:
            return app  # pre-drift index (older manifest): stay quiet
        cents = _centroids(spec)
        rows = _assigned_rows(head, spec["ii_key"],
                              spec["ii_vec_col"], cents,
                              codebooks=_codebooks(spec))
        counts, sum_qe = _cell_stats(spark_, rows,
                                     spec["ii_vec_col"], cents)
        return app | {"ii_cur_cell_counts": counts,
                      "ii_cur_sum_qe": sum_qe}

    def _app_delta(spark_, spec, ch, new_rows, app):
        if "ii_base_cell_counts" not in spec:
            return app
        cents = _centroids(spec)
        key, vec_col = spec["ii_key"], spec["ii_vec_col"]
        # ONE signed aggregation over the (already persisted) change
        # frame: inserts count +1, retracted pre-images -1, each
        # re-assigned under the SAME frozen centroids they carried —
        # exact roll-forward. Counts/qe never need pq_codes, so the
        # retraction side skips the IVFADC Arrow re-encode a
        # _assigned_rows call would pay (r14 review finding: the old
        # two-_cell_stats form ran two jobs + a PQ pass per refresh).
        signed = (ch.where(F.col("_change_type").isin(
            *(_RETRACTING + _INSERTING)))
            .withColumn("_sgn", F.when(
                F.col("_change_type").isin(*_INSERTING),
                F.lit(1)).otherwise(F.lit(-1)))
            .select(key, vec_col, "_sgn"))
        assigned = ivf_assign(signed, cents, id_col=key,
                              vec_col=vec_col, keep_cols=["_sgn"])
        counts, sum_qe = _cell_stats(spark_, assigned, vec_col, cents,
                                     sign_col="_sgn")
        cur = [int(c) + d for c, d in
               zip(spec["ii_cur_cell_counts"], counts)]
        return app | {
            "ii_cur_cell_counts": cur,
            "ii_cur_sum_qe": float(spec["ii_cur_sum_qe"]) + sum_qe,
        }

    return M._refresh_index(
        spark, view_path,
        spec_of=_spec_ii, src_field="ii_source",
        cursor_field="ii_source_version", key_field="ii_key",
        rows_of=_rows, recompute_fraction=recompute_fraction,
        app_on_recompute=_app_recompute, app_on_delta=_app_delta)


def ivf_drift_report(view_path: str,
                     version: int | None = None) -> dict:
    """Drift governance readout — pure manifest math (KB-sized spec
    fields maintained O(delta) by refresh_ivf_index), ZERO Spark jobs:

    * ``cell_tv`` — total-variation distance in [0, 1] between the
      CURRENT per-cell row distribution and the create-time baseline
      (0.5 * L1 of the fraction vectors): rising TV means rows now
      concentrate in different cells than the quantizer was trained
      for, so probe recall decays even though every query still
      "works".
    * ``mqe_ratio`` — current mean quantization error ||x - c_cell||^2
      over its create-time baseline: rising MQE means vectors sit
      farther from every frozen centroid — the classic
      distribution-shift signature.
    * ``alarm`` — cell_tv > ii_drift_tv_threshold (default 0.25) OR
      mqe_ratio > ii_drift_mqe_threshold (default 1.5). The documented
      heal is an EXPLICIT re-create (retrain centroids on the current
      corpus — an operator decision, never an implicit 100 TB
      rewrite); a rebuild resets both baselines, clearing the alarm.

    Indexes created before drift tracking report ``tracked: False``
    and never alarm (no baseline to compare against)."""
    spec = _spec_ii(view_path, version)
    if "ii_base_cell_counts" not in spec:
        return {"tracked": False, "alarm": False}
    base = [int(x) for x in spec["ii_base_cell_counts"]]
    cur = [int(x) for x in spec["ii_cur_cell_counts"]]
    n_base, n_cur = sum(base), sum(cur)
    if n_base <= 0 or n_cur <= 0:
        return {"tracked": True, "alarm": False, "n_base": n_base,
                "n_cur": n_cur, "cell_tv": 0.0, "mqe_ratio": 1.0}
    cell_tv = 0.5 * sum(abs(c / n_cur - b / n_base)
                        for b, c in zip(base, cur))
    mqe_base = float(spec["ii_base_sum_qe"]) / n_base
    mqe_cur = float(spec["ii_cur_sum_qe"]) / n_cur
    mqe_ratio = (mqe_cur / mqe_base) if mqe_base > 0 else 1.0
    tv_thr = float(spec.get("ii_drift_tv_threshold", 0.25))
    mqe_thr = float(spec.get("ii_drift_mqe_threshold", 1.5))
    return {
        "tracked": True, "n_base": n_base, "n_cur": n_cur,
        "cell_tv": cell_tv, "mqe_ratio": mqe_ratio,
        "tv_threshold": tv_thr, "mqe_threshold": mqe_thr,
        "alarm": cell_tv > tv_thr or mqe_ratio > mqe_thr,
    }


def retrain_ivf_index(
    spark: SparkSession, view_path: str, centroids=None,
    codebooks=None, iters: int | None = None, init: str | None = None,
) -> int:
    """The drift HEAL (the explicit re-create ivf_drift_report's alarm
    asks for, as ONE in-band commit): retrain the coarse quantizer on
    the CURRENT source head with the create-time recipe (or take new
    explicit ``centroids`` — required when the index was created with
    explicit ones, whose provenance this module cannot reproduce),
    retrain the residual PQ codebooks against the NEW centroids with
    the recorded ``ii_pq_params`` (or take explicit ``codebooks``),
    reassign every row, advance the cursor to the source head, and
    RESET the drift baseline to the new corpus — exactly what CREATE
    would record today, without dropping the view, its catalog entry,
    or its version history. One V.overwrite commit (parent-checked:
    a concurrent refresh loses the OCC race cleanly); on a bucketed
    at-rest layout overwrite's layout dispatch re-routes the new state
    into the same bucket map, so file pruning survives the retrain."""
    view_v = V.current_version(view_path)
    spec = _spec_ii(view_path, view_v)
    key, vec_col = spec["ii_key"], spec["ii_vec_col"]
    src = spec["ii_source"]
    src_v = V.current_version(src)
    df = M._read_source(spark, src, src_v)
    trained = str(spec.get("ii_trained", "explicit"))
    if centroids is None:
        if not trained.startswith("kmeans:"):
            raise ValueError(
                "this index was created with EXPLICIT centroids — "
                "pass centroids= (and codebooks= if it carries "
                "explicit books) to retrain_ivf_index")
        _, c_init, c_iters = trained.split(":")
        cents = ivf_train_kmeans(
            df, k=int(spec["ii_n_cells"]),
            iters=int(iters if iters is not None else c_iters),
            id_col=key, vec_col=vec_col,
            init=str(init if init is not None else c_init))
        new_trained = (f"kmeans:{init or c_init}:"
                       f"{int(iters if iters is not None else c_iters)}")
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        if not (norms > 0).all():
            raise ValueError("explicit centroids must be non-zero rows")
        if not np.allclose(norms, 1.0, rtol=0.0, atol=1e-9):
            cents = cents / norms
        new_trained = "explicit"
    if cents.shape != (int(spec["ii_n_cells"]), int(spec["ii_dim"])):
        raise ValueError(
            f"retrained centroids shape {cents.shape} != the index's "
            f"({spec['ii_n_cells']}, {spec['ii_dim']})")
    books = None
    if codebooks is not None:
        books = np.asarray(codebooks, dtype=np.float64)
        dim = int(spec["ii_dim"])
        if books.ndim != 3 or books.shape[0] * books.shape[2] != dim:
            raise ValueError(
                f"explicit codebooks must be (m_sub, k_cent, "
                f"dim/m_sub) with m_sub*dsub == {dim}, got shape "
                f"{books.shape}")
    elif spec.get("ii_codebooks") is not None:
        pq = spec.get("ii_pq_params")
        if pq is None:
            raise ValueError(
                "this index carries EXPLICIT PQ codebooks — pass "
                "codebooks= to retrain_ivf_index (residual books are "
                "centroid-relative and cannot survive a retrain)")
        from ..operators.ann import ivf_pq_train

        sample_rows = (df.orderBy(F.asc(key)).limit(int(pq["sample"]))
                       .select(vec_col).collect())
        if not sample_rows:
            raise ValueError("cannot retrain on an empty source")
        sample = np.asarray([r[0] for r in sample_rows],
                            dtype=np.float64)
        books = ivf_pq_train(sample, cents, m_sub=int(pq["m"]),
                             k_cent=int(pq["k"]),
                             iters=int(pq["iters"]),
                             seed=int(pq["seed"]))
    inc = tuple(spec.get("ii_include_cols", []))
    state = _assigned_rows(df, key, vec_col, cents, codebooks=books,
                           include_cols=inc)
    counts, sum_qe = _cell_stats(spark, state, vec_col, cents)
    app = dict(spec) | {
        "ii_centroids": [[float(x) for x in c] for c in cents],
        "ii_trained": new_trained,
        "ii_source_version": src_v,
        "ii_base_cell_counts": counts, "ii_base_sum_qe": sum_qe,
        "ii_cur_cell_counts": list(counts), "ii_cur_sum_qe": sum_qe,
    }
    if books is not None:
        app["ii_codebooks"] = [[[float(x) for x in c] for c in b]
                               for b in books]
    return V.overwrite(spark, view_path, state, extra={"app": app},
                       parent_version=view_v)


def refresh_ivf_index_with_retry(
    spark: SparkSession, view_path: str, max_retries: int = 3,
    recompute_fraction: float | None = M._RECOMPUTE_BOUND_FRACTION,
) -> int:
    """OCC rebase loop (the standard view-refresh retry contract)."""
    return M._refresh_with_retry(
        lambda: refresh_ivf_index(
            spark, view_path, recompute_fraction=recompute_fraction),
        max_retries)


def query_ivf_index(
    spark: SparkSession, view_path: str, query_vec, k: int = 10,
    n_probe: int = 2, version: int | None = None,
    method: str = "exact", shortlist: int = 200,
    where: str | None = None, min_results: int | None = None,
) -> DataFrame:
    """Approximate top-k FROM the maintained index: the ``n_probe``
    nearest cells are ranked driver-side from the spec's stored
    centroids (zero Spark jobs), the state is filtered to those cells
    (file-pruned on a bucketed layout), and the candidates are scored
    by one of two tiers:

    * ``method='exact'`` — exact dot product over every probed row
      (the re-rank tier the oracle row pins): same probe order
      (np.argsort(-dots), ties by cell index), scoring, ordering, and
      tie-break as ann.ivf_topk over the current source.
    * ``method='adc'`` (IVFADC index only, built with ``pq_m``) —
      candidates score from their stored residual PQ codes via one
      (m_sub × k_cent) lookup table (q·centroid + ADC, the
      Jegou/Douze/Schmid pipeline), a ``shortlist`` survives, and the
      final k re-rank EXACTLY against the index's own full-precision
      column — row-identical to ann.ivf_pq_topk over this state with
      the frozen centroids/codebooks. At 100 TB the ADC pass reads
      code bytes, not vectors: the memory-bound tier.

    ``where`` is a SQL predicate over the index's payload columns
    (``include_cols`` at CREATE) and key — FILTERED vector search,
    evaluated inside the probed-cell scan (parquet-pushed): top-k
    among probed candidates matching the filter. A selective filter
    can leave fewer than k probed survivors; pass ``min_results``
    (≤ k) to adaptively WIDEN the probe: each escalation doubles
    n_probe (finally ALL cells — the exact filtered answer) and costs
    one extra count job.

    Returns (<key>, score); final scores are exact dots either way."""
    v = V.current_version(view_path) if version is None else int(version)
    spec = _spec_ii(view_path, v)
    key, vec_col = spec["ii_key"], spec["ii_vec_col"]
    dim = int(spec["ii_dim"])
    n_cells = int(spec["ii_n_cells"])
    qv = np.asarray(query_vec, dtype=np.float64)
    if qv.shape != (dim,):
        raise ValueError(f"query dim {qv.shape} != index dim ({dim},)")
    cents = _centroids(spec)
    if int(n_probe) < 1:
        # also the widening ladder's loop variant: doubling from 0
        # would never reach n_cells
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if method not in ("exact", "adc"):
        raise ValueError(f"unknown method {method!r}; "
                         f"use 'exact' or 'adc'")
    from .matview import _apply_where, _where_expr

    flt = _where_expr(where) if where is not None else None

    def _plan(probe_n: int) -> DataFrame:
        order = np.argsort(-(cents @ qv))[:probe_n]
        cells = [int(i) for i in order]
        cand = _state(spark, view_path, v, cells=cells).where(
            F.col("ivf_cell").isin(cells))
        if flt is not None:
            cand = _apply_where(cand, flt, where)
        if method == "adc":
            from ..operators.ann import ivf_pq_topk

            books = _codebooks(spec)
            if books is None:
                raise ValueError(
                    f"{view_path} was built without PQ codebooks — "
                    f"recreate with pq_m=<subspaces> for method='adc'")
            # the probed-cell filter is already applied (and file-
            # pruned); ivf_pq_topk re-applies it idempotently from the
            # same probe rule, then ADC-shortlists and exact-re-ranks
            # in-state. The payload filter above shrinks its
            # candidate set BEFORE the LUT pass.
            return ivf_pq_topk(cand, qv, cents, books, k=k,
                               n_probe=probe_n, shortlist=shortlist,
                               id_col=key, vec_col=vec_col)
        scored = cand.withColumn(
            "score", VEC.dot(vec_col, VEC.vec_lit_sql(qv)))
        return (scored.select(key, "score")
                .orderBy(F.desc("score"), F.asc(key))
                .limit(k))

    out = _plan(int(n_probe))
    if min_results is None:
        return out
    want = min(int(min_results), int(k))
    # widening ladder: double the probed cells until all cells are in
    # (the exact filtered answer). Each tier is a fresh single-shot
    # plan — file pruning re-resolves, no cross-tier merge state.
    probe_n = int(n_probe)
    while probe_n < n_cells:
        if out.count() >= want:
            return out
        probe_n = min(probe_n * 2, n_cells)
        out = _plan(probe_n)
    return out


def query_ivf_index_batch(
    spark: SparkSession, view_path: str, queries, k: int = 10,
    n_probe: int = 2, version: int | None = None,
    qid_col: str = "qid", where: str | None = None,
) -> DataFrame:
    """M queries against the maintained IVF index in ONE plan (the
    exact re-rank tier) — the amortized serving form: each query's
    n_probe cells rank driver-side from the spec's stored centroids
    (zero Spark jobs), the UNION of probed cells drives ONE
    file-pruned state scan, a broadcast (qid, ivf_cell, qvec) frame
    equi-joins candidates to their queries (a row lives in exactly
    ONE cell — no dedup exchange), exact dots score JVM-side, and a
    per-qid window takes top-k. Per query, rows are IDENTICAL to
    query_ivf_index(method='exact'): same probe rule
    (np.argsort(-dots)), same fold-order dot, same
    (score DESC, key ASC) total order. The ADC tier stays per-query
    (each query carries its own LUT; batch it by chunking calls).

    Returns (qid, <key>, score) ordered (qid, score DESC, key)."""
    v = V.current_version(view_path) if version is None else int(version)
    spec = _spec_ii(view_path, v)
    key, vec_col = spec["ii_key"], spec["ii_vec_col"]
    dim = int(spec["ii_dim"])
    if not queries:
        raise ValueError("query_ivf_index_batch needs at least one "
                         "(qid, vector) pair")
    qids = [q for q, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate qids in batch")
    from ..functions.localrel import _render

    cents = _centroids(spec)
    by_cell: dict[int, list] = {}
    qvec_lit: dict = {}
    union = set()
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        if q.shape != (dim,):
            raise ValueError(
                f"query {qid!r} dim {q.shape} != index dim ({dim},)")
        cells = [int(i) for i in np.argsort(-(cents @ q))[:int(n_probe)]]
        union |= set(cells)
        qvec_lit[qid] = _render([float(x) for x in q], "array<double>")
        for c in cells:
            by_cell.setdefault(c, []).append(qid)
    qid_t = "string" if isinstance(qids[0], str) else "bigint"
    # cell -> array(qid) and qid -> qvec as constant-folded literal maps:
    # the per-row element_at lookups run inside the probed scan stage,
    # replacing the r14 broadcast (qid, cell, qvec) frame's build job +
    # AQE stage (guide §2.4; same rewrite as query_ann_index_batch —
    # rows occupy exactly one cell, so the explode emits each
    # (row, query) pair at most once: inner-join semantics preserved)
    cmap_text = "map(" + ", ".join(
        f"CAST({c} AS INT), array({', '.join(_render(q, qid_t) for q in qs)})"
        for c, qs in sorted(by_cell.items())) + ")"
    qmap_text = "map(" + ", ".join(
        f"{_render(q, qid_t)}, {qvec_lit[q]}" for q in qids) + ")"
    cand = _state(spark, view_path, v,
                  cells=sorted(union)).where(
        F.col("ivf_cell").isin(sorted(union)))
    if where is not None:
        # shared metadata filter across the batch (payload predicate
        # pushed into the ONE probed scan, before the query lookup)
        from .matview import _apply_where, _where_expr

        cand = _apply_where(cand, _where_expr(where), where)
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(F.desc("score"),
                                            F.asc(key))
    return (cand
            .withColumn(qid_col,
                        F.explode(F.expr(f"element_at({cmap_text}, ivf_cell)")))
            .withColumn("score", VEC.dot(
                F.col(vec_col),
                F.expr(f"element_at({qmap_text}, `{qid_col}`)")))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(qid_col, key, "score")
            .orderBy(qid_col, F.desc("score"), F.asc(key)))
