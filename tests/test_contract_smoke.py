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


def test_entry_flagship(spark):
    out = entry.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert {"vec_id", "score"} <= set(out.columns)
