"""Parser golden cases (reference C1-C3, rclip_server.py:85-106, 130-136;
FIXTURES.md 'Parser golden cases')."""

from rclip_server_spark.plans.parser import parse_query


def _pairs(q):
    return [(t.weight, t.text) for t in parse_query(q)]


def test_basic_signed_terms():
    assert _pairs("zebra -stripes +spots") == [
        (1.0, "zebra"),
        (-1.0, "stripes"),
        (1.0, "spots"),
    ]


def test_weight_magnitude_and_paren_strip():
    # -2(winter sports): weight = -2.0, ONE outer paren pair stripped
    assert _pairs("-2(winter sports)") == [(-2.0, "winter sports")]


def test_double_paren_strips_one_level():
    assert _pairs("((winter sports))") == [(1.0, "(winter sports)")]


def test_quoted_phrase_keeps_quotes():
    # pyparsing original_text_for keeps the quotes (rclip_server.py:98)
    assert _pairs('zebra -"black and white"') == [
        (1.0, "zebra"),
        (-1.0, '"black and white"'),
    ]


def test_json_terms():
    assert _pairs('{"image_id":5} -{"image_id":7}') == [
        (1.0, '{"image_id":5}'),
        (-1.0, '{"image_id":7}'),
    ]


def test_fractional_weight_json():
    assert _pairs('+0.5{"random_seed":42}') == [(0.5, '{"random_seed":42}')]


def test_empty_query():
    assert _pairs("") == []
    assert _pairs("   ") == []


def test_consecutive_words_one_term():
    # words := OneOrMore(word): consecutive words form a single term
    assert _pairs("winter sports") == [(1.0, "winter sports")]


def test_mixed_words_and_signs():
    assert _pairs("big cat -small dog") == [(1.0, "big cat"), (-1.0, "small dog")]


def test_unbalanced_skips_garbage():
    # scan_string behavior: unmatchable chars skipped, rest still parses
    assert _pairs(")( zebra") == [(1.0, "zebra")]
