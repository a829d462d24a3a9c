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
