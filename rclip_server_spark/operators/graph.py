"""Iterative graph algorithms over edge DataFrames.

Why in a training-data engine: web-corpus curation uses link-graph
importance as a document quality prior (the original use of PageRank), and
entity graphs (customer–supplier, user–item) need the same message-passing
shape for influence/popularity scoring. The engine already has the
union-find side of graph work (dedup.connected_components, pointer-jumping
in O(log diameter) rounds); this module adds the value-propagation side.

Scale shape per iteration: ONE equi-join of the edge table with the
current rank vector (broadcast when ranks fit, shuffle join otherwise —
Spark/AQE picks) and ONE groupBy(dst) aggregation; the rank vector is
node-sized, never edge-sized. Iteration count is fixed (power iteration
converges geometrically at rate = damping), so the whole job is
iters × (join + agg) — the standard Pregel cost, expressed in DataFrame
operators with no RDDs. Lineage is truncated with localCheckpoint every
few rounds so the plan does not grow with the iteration count (the same
discipline as dedup.connected_components).

Determinism: fixed iteration count and double arithmetic; per-target
contribution sums are floating-point and therefore partition-order
dependent in the last ulp, so PageRank registers as a rows-only contract
row with exactness pinned against a NumPy reference in tests (the same
treatment as the iterative logistic trainer in stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. Returns
    (node, rank) with Σ rank = 1 (dangling mass redistributed uniformly —
    the standard stochastic-matrix completion, so the invariant is exact
    up to float rounding and testable).

    rank_{t+1}(v) = (1-d)/N + d·( Σ_{u→v} rank_t(u)/outdeg(u)
                                  + dangling_t/N )

    Per iteration: contributions = edges ⋈ ranks (one equi-join on src) →
    groupBy(dst) sum (one exchange, node-sized), plus a scalar aggregate
    for the dangling mass. Parallel edges are legitimate multi-edges
    (each contributes); pre-`distinct` the input to treat them as simple
    edges."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1); got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # node-sized state: (node, rank, outdeg); outdeg NULL marks a dangling
    # node whose whole rank redistributes each round
    state = nodes.join(outdeg, nodes.node == outdeg.src, "left").select(
        "node", F.lit(1.0 / n).alias("rank"), "outdeg"
    ).persist()
    state.count()
    base = (1.0 - damping) / n
    for it in range(int(iters)):
        dangling = (
            state.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(state.withColumnRenamed("node", "src_n"),
                   e.src == F.col("src_n"))
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        new_state = (
            state.join(contribs, state.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0))
                       + F.lit(float(dangling) / n))
                ).alias("rank"),
                "outdeg",
            )
        )
        # materialize the new state BEFORE releasing the old one — the
        # next iteration then reads a cached/checkpointed node-sized
        # table instead of recomputing the chain since the last
        # checkpoint (without this, recompute depth grows toward
        # checkpoint_every every round)
        if (it + 1) % int(checkpoint_every) == 0 or it == int(iters) - 1:
            new_state = new_state.localCheckpoint(eager=True)
        else:
            new_state = new_state.persist()
            new_state.count()
        old = state
        state = new_state
        old.unpersist()
    nodes.unpersist()
    return state.select("node", "rank")


def pagerank_numpy_reference(edge_list, iters=10, damping=0.85):
    """Dense NumPy twin for tests: identical update rule, node order =
    sorted(nodes). Returns {node: rank}."""
    import numpy as np

    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edge_list:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        dangling = r[out == 0].sum()
        in_sum = np.zeros(n)
        for u, v in edge_list:
            in_sum[idx[v]] += r[idx[u]] / out[idx[u]]
        r = base + damping * (in_sum + dangling / n)
    return dict(zip(nodes, r))
