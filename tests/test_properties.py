"""Property-based checks (SURVEY.md §5.4) — driver-side pure functions only,
so hypothesis can run hundreds of cases without Spark jobs."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rclip_server_spark.plans.combinator import seeded_unit_vector
from rclip_server_spark.plans.embedder import DeterministicEmbedder
from rclip_server_spark.plans.parser import parse_query

E = DeterministicEmbedder(64)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes_and_weights_are_finite(q):
    for t in parse_query(q):
        assert math.isfinite(t.weight)
        assert t.text != ""


@given(st.text(alphabet="abcdefghij ", min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_parser_plain_words_preserve_content(q):
    # plain word queries: every parsed term is a substring of the input and
    # carries the default +1 weight
    for t in parse_query(q):
        assert t.weight == 1.0
        assert t.text in q


@given(st.integers(min_value=-(2**31), max_value=2**31))
@settings(max_examples=50, deadline=None)
def test_seeded_vector_deterministic_and_unit(seed):
    a = seeded_unit_vector(seed, 64)
    b = seeded_unit_vector(seed, 64)
    np.testing.assert_array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_embedder_deterministic_unit_norm(text):
    a = E.embed_text(text)
    b = E.embed_text(text)
    np.testing.assert_array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


@given(
    st.lists(st.floats(min_value=-5, max_value=5), min_size=64, max_size=64),
    st.lists(st.floats(min_value=-5, max_value=5), min_size=64, max_size=64),
)
@settings(max_examples=50, deadline=None)
def test_weight_semantics_match_reference_formula(_, __):
    # float(sign+'1') * magnitude (rclip_server.py:136): spot-check the
    # parser's weight arithmetic against the reference expression
    for sign, mag, text in [("-", 2.0, "-2x"), ("+", 0.5, "+0.5x"), ("+", 1.0, "x")]:
        terms = parse_query(text)
        assert len(terms) == 1
        assert terms[0].weight == float(sign + "1") * mag


@given(
    st.dictionaries(
        st.sampled_from(["train", "val", "test", "holdout", "calib"]),
        st.floats(min_value=0.001, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_split_bounds_partition_hash_space(weights):
    """split_bounds must tile [0, 2^32) exactly: monotone non-decreasing
    bounds, last bound closing the space — every hash value gets exactly one
    label regardless of weight scale."""
    from rclip_server_spark.operators.sampling import _HASH_SPACE, split_bounds

    bounds = split_bounds(weights)
    assert [name for name, _ in bounds] == list(weights)
    his = [hi for _, hi in bounds]
    assert all(a <= b for a, b in zip(his, his[1:]))
    assert his[-1] == _HASH_SPACE
    assert all(0 <= hi <= _HASH_SPACE for hi in his)


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_split_bounds_proportional(frac):
    from rclip_server_spark.operators.sampling import _HASH_SPACE, split_bounds

    bounds = split_bounds({"a": frac, "b": 1.0 - frac}) if 0 < frac < 1 else None
    if bounds is None:
        return
    a_hi = bounds[0][1]
    assert abs(a_hi / _HASH_SPACE - frac) < 1e-9  # bound placed at the weight


# ---------------------------------------------------------------------------
# round-4 pure functions: bloom sizing, PQ training
# ---------------------------------------------------------------------------

from rclip_server_spark.operators.sketches import bloom_params


@given(st.integers(min_value=1, max_value=10**9),
       st.floats(min_value=1e-6, max_value=0.5))
@settings(max_examples=200, deadline=None)
def test_bloom_params_wellformed(n, fpp):
    m, k = bloom_params(n, fpp)
    assert m > 0 and m % 64 == 0     # whole bitmap words
    assert 1 <= k <= 64              # sane hash count at any (n, fpp)
    assert m >= n * 1.44 * math.log2(1 / fpp) * 0.9  # near the textbook bound


@given(st.integers(min_value=1, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_bloom_params_monotone_in_fpp(n):
    m_tight, _ = bloom_params(n, 0.001)
    m_loose, _ = bloom_params(n, 0.05)
    assert m_tight >= m_loose        # stricter fpp never shrinks the filter


@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=16, max_value=64))
@settings(max_examples=25, deadline=None)
def test_pq_train_deterministic_and_wellformed(seed, n):
    from rclip_server_spark.operators.ann import pq_train

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 8))
    a = pq_train(X, m_sub=4, k_cent=8, iters=3, seed=7)
    b = pq_train(X, m_sub=4, k_cent=8, iters=3, seed=7)
    np.testing.assert_array_equal(a, b)          # seeded determinism
    assert a.shape == (4, min(8, n), 2)          # (m_sub, k_cent<=n, dsub)
    assert np.isfinite(a).all()


# --- zone-map segment skipping (sources/versioned.zone_survives) ---------

_vals = st.lists(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    min_size=1, max_size=12,
)
_bound = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))


@given(
    st.dictionaries(st.sampled_from(["a", "b", "c"]), _vals,
                    min_size=1, max_size=3),
    st.dictionaries(st.sampled_from(["a", "b", "c"]),
                    st.tuples(_bound, _bound), min_size=1, max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_zone_survives_never_false_prunes(col_values, ranges):
    """SAFETY: if any row (taking value v_c for each column c; a column
    without generated values contributes non-NULL-unknown, i.e. cannot
    fail the predicate via stats) satisfies every range, the pruning
    decision must keep the segment. Conservativeness (keeping a segment
    with no matching row) is allowed; dropping a matching one is not."""
    from rclip_server_spark.sources.versioned import zone_survives

    # stats exactly as the write path records them
    seg_stats = {}
    for c, vs in col_values.items():
        nn = [v for v in vs if v is not None]
        seg_stats[c] = {
            "min": min(nn) if nn else None,
            "max": max(nn) if nn else None,
            "nulls": sum(1 for v in vs if v is None),
        }
    # brute-force oracle: rows are the value tuples (same index across
    # columns; ragged lists padded with None = SQL NULL, which fails any
    # range predicate)
    n_rows = max(len(vs) for vs in col_values.values())

    def row_matches(i):
        for c, (lo, hi) in ranges.items():
            if lo is None and hi is None:
                continue  # unbounded range = no predicate: every row
                # (NULL included) matches — mirrors zone_survives
            if c not in col_values:
                continue  # untracked column: stats can't see it either
            vs = col_values[c]
            v = vs[i] if i < len(vs) else None
            if v is None:
                return False
            if lo is not None and v < lo:
                return False
            if hi is not None and v > hi:
                return False
        return True

    any_match = any(row_matches(i) for i in range(n_rows))
    survived = zone_survives(seg_stats, ranges)
    if any_match:
        assert survived, (seg_stats, ranges)
