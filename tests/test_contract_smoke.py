"""Every registered contract query must EXECUTE at sf0.001 — the driver's
smoke scale, 10x smaller than the oracle gate's sf0.01. This is the
empty/tiny-input robustness net: an operator that divides by a group count,
collects a pool, or infers a dim must degrade, not crash, when the fixture
shrinks."""

import pytest

from conftest import SF_DIR

import __spark_entry__ as entry


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_executes_at_smoke_scale(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    assert df.count() >= 0  # full execution, not just plan construction
    # the external driver's pandas canonicalizer cannot hash list/struct/map
    # cells — every ORACLE-CHECKED row must project scalar columns only
    # (flatten with array_join/concat_ws at the contract boundary; r3's one
    # red cell was exactly this). Rows-only rows skip canonicalization.
    if name in entry.oracle_sql():
        from pyspark.sql.types import ArrayType, MapType, StructType

        complex_cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not complex_cols, (
            f"{name} outputs complex-typed columns {complex_cols}; "
            "the driver's canonicalizer cannot hash them"
        )


def test_entry_flagship(spark):
    out = entry.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert {"vec_id", "score"} <= set(out.columns)


def test_registry_invariants():
    """Contract-registry shape: every oracle key has a query, the priority
    window is exactly the first 50 names, each priority name resolves, and
    the window spans the operator families the driver should verify."""
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    from rclip_server_spark import contract as C

    names = list(q)
    assert names[: len(C._PRIORITY)] == C._PRIORITY
    assert len(C._PRIORITY) == 50
    window = set(C._PRIORITY)
    # Round-5 rotation: the window spans these families directly; vec_ and
    # dedup_ rows are absent BY DESIGN — every one of them is already
    # driver-verified (CORRECTNESS_r03/r04 green cells), and their slots
    # now carry never-verified backlog rows (the cumulative-coverage goal).
    # late-r11: the text/ann family slots may be carried by their
    # maintained-index twins (ti_/ai_ rows exercise the same operators
    # through the index surface)
    for prefix in ("a", "b", "ev_", "samp_", ("text_", "ti_"),
                   "rel_", ("ann_", "ai_"), "sketch_", "d1_"):
        assert any(n.startswith(prefix) for n in window), prefix
    # everything in the window has an oracle except the NAMED rows-only
    # rows (no SQL twin by design: RNG-seeded/k-means/iterative/UDF
    # ops). The r14 rotation carries exactly ONE rows-only row — the
    # fixed §2 D1 slot (pandas_udf embedding). ii_ivfadc_topk was
    # UPGRADED to hash-exact in r14 (explicit quantizer literals; the
    # oracle recomputes the PQ-argmin shortlist as VALUES-table
    # LIMIT 1 subqueries) and b16_local_binary_ingest (binary
    # columns can't value-hash) rotated out with the sweep.
    assert sorted(n for n in C._PRIORITY if n not in o) == [
        "d1_embed_documents_distributed",
    ]


def test_local_checker_compare_is_dtype_strict():
    """The r6 escape class, pinned at the gate: DuckDB HUGEINT results
    come back to pandas as float64 while Spark emits int64 — numerically
    equal, hash-different at the driver. The local checker's compare()
    must FAIL on an int/float dtype-class mismatch (not accept it as
    1e-9-close), must still pass exact same-class frames, and must keep
    the 1e-9 tolerance for genuine float columns."""
    import pandas as pd

    from tools.check_contract import compare

    ints = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    floats = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    ok, msg = compare(ints, floats)
    assert not ok and "DTYPE MISMATCH" in msg, msg
    ok, msg = compare(ints, ints.copy())
    assert ok, msg
    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0 + 1e-12, 2.0]})
    ok, msg = compare(a, b)
    assert ok, msg  # within 1e-9 on float-float stays acceptable
    c = pd.DataFrame({"x": [1.0, 2.5]})
    ok, msg = compare(a, c)
    assert not ok, msg
