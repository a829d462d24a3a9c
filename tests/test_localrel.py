"""values_df (functions/localrel): VALUES LocalRelation twin of
createDataFrame — row/schema identity on every supported type, exact
double round-trip, loud-but-safe fallback, and the plan property the
optimization exists for (LocalTableScan, no RDD scan stage)."""

import math

import pytest

from rclip_server_spark.functions.localrel import values_df


def _same(spark, rows, ddl):
    a = values_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema or [
        (f.name, f.dataType) for f in a.schema
    ] == [(f.name, f.dataType) for f in b.schema]
    assert sorted(map(tuple, a.collect()), key=repr) == sorted(
        map(tuple, b.collect()), key=repr)
    return a


def test_plain_types_identical(spark):
    _same(spark, [(1, 2.5, "x", True), (None, None, None, None)],
          "a bigint, b double, c string, d boolean")


def test_double_bit_roundtrip(spark):
    vals = [0.1 + 0.2, 1e-300, -1.7976931348623157e308, 6.02e23,
            math.pi, 2.0 ** -1074]
    rows = [(v,) for v in vals]
    got = [r[0] for r in values_df(spark, rows, "v double").collect()]
    assert sorted(map(float.hex, got)) == sorted(map(float.hex, vals))


def test_nan_inf(spark):
    rows = [(float("nan"),), (float("inf",),), (float("-inf"),)]
    got = [r[0] for r in values_df(spark, rows, "v double").collect()]
    assert sum(math.isnan(g) for g in got) == 1
    assert float("inf") in got and float("-inf") in got


def test_string_escaping(spark):
    rows = [("it's",), ("back\\slash",), ("new\nline",), ("",),
            ("quote\"d",), ("uni✓code",)]
    _same(spark, rows, "s string")


def test_arrays(spark):
    _same(spark, [([1.5, 2.5], [1, 2], ["a", "b'c"]),
                  ([], None, [])],
          "v array<double>, k array<bigint>, s array<string>")


def test_empty_rows(spark):
    df = values_df(spark, [], "a bigint, b array<double>")
    assert df.collect() == []
    assert [f.name for f in df.schema] == ["a", "b"]


def test_fallback_on_unsupported_type(spark):
    # struct types are not rendered -> silently identical via fallback
    rows = [((1, "x"),)]
    df = values_df(spark, rows, "s struct<a:bigint,b:string>")
    assert df.collect()[0][0] == (1, "x")


def test_compact_numeric_arrays_identical(spark):
    # the compact split-cast rendering (one string literal per array)
    # must be row- and bit-identical to createDataFrame
    import random

    rng = random.Random(7)
    vec = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(i, vec, list(range(i, i + 40))) for i in range(8)]
    got = _same(spark, rows, "k bigint, v array<double>, n array<bigint>")
    # bit-exact doubles through the split->cast path
    back = got.orderBy("k").collect()[0][1]
    assert [float.hex(x) for x in back] == [float.hex(x) for x in vec]


def test_compact_bails_on_nulls_and_nonfinite(spark):
    # arrays holding nulls / NaN / inf take the elementwise path but stay
    # identical to createDataFrame
    rows = [([1.0, None, 3.0],), ([float("inf"), 0.5] + [0.1] * 20,)]
    a = values_df(spark, rows, "v array<double>").collect()
    assert a[0][0][1] is None and a[1][0][0] == float("inf")


def test_plan_is_local_relation(spark):
    df = values_df(spark, [(1, [0.5])], "k bigint, v array<double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
