"""PageRank (operators/graph.py): NumPy parity, dangling-mass handling,
and the probability-mass invariant."""

from pyspark.sql import functions as F

from rclip_server_spark.operators import graph

from conftest import SF_DIR


def _run(spark, edges, iters=12):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in graph.pagerank(df, iters=iters).collect()}
    want = graph.pagerank_numpy_reference(edges, iters=iters)
    return got, want


def test_matches_numpy_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
             ("e", "a"), ("e", "b"), ("c", "e")]
    got, want = _run(spark, edges)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_dangling_mass_redistributes(spark):
    # b is a pure sink: without dangling redistribution its rank would
    # leak out of the system and the total would decay below 1
    edges = [("a", "b"), ("c", "b"), ("c", "a")]
    got, want = _run(spark, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    # the sink holds the most rank (everything points at it)
    assert got["b"] == max(got.values())


def test_star_graph_hub_dominates(spark):
    edges = [(f"leaf{i}", "hub") for i in range(10)]
    got, _ = _run(spark, edges, iters=10)
    leaves = [v for k, v in got.items() if k != "hub"]
    # the hub absorbs the leaves' mass (its dangling rank recycles
    # uniformly, so it tops out below 0.5 — but far above any leaf)
    assert got["hub"] > 5 * max(leaves)
    assert max(leaves) - min(leaves) < 1e-12  # symmetry is exact


def test_parallel_edges_are_multi_edges(spark):
    # a doubled edge contributes twice (documented multi-edge semantics)
    single = [("a", "b"), ("a", "c")]
    doubled = [("a", "b"), ("a", "b"), ("a", "c")]
    got_s, _ = _run(spark, single)
    got_d, _ = _run(spark, doubled)
    assert got_d["b"] > got_s["b"]


def test_fixture_supplier_graph_runs(spark):
    """The contract row's shape: customer -> supplier edges derived from
    orders x lineitem; ranks form a probability distribution."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), "o_custkey").alias("src"),
            F.concat(F.lit("s"), "l_suppkey").alias("dst"),
        )
    )
    pr = graph.pagerank(edges, iters=6)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    assert pr.count() > 100
