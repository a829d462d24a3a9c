"""Text-analysis column functions for the training-data-pipeline operators
(tokenize, n-grams, quality scoring, language-ID, token counting,
fingerprinting). All pure pyspark.sql.functions — JVM-side, codegen'd,
shuffle-free — with exact DuckDB-SQL twins for the oracle.

The reference's only text processing is the words-table predicate
``lower(words) = words`` (rclip_server.py:300); everything else here is the
§F / north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny, deterministic marker-word lists per language for the heuristic
# language-ID (stopword-hit scoring). Real deployments swap in proper n-gram
# profiles; the operator shape (score-per-language → argmax) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "es": ("el", "la", "los", "las", "que", "de", "es", "un"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans"),
    "zh": ("de5", "le5", "shi4", "zai4", "you3", "he2", "wo3", "ta1"),
}

STOPWORDS = LANG_MARKERS["en"]

PUNCT_PATTERN = "[.,;:!?]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization, lowercased and TRIMMED — leading/trailing
    whitespace would otherwise yield empty-string tokens (Spark split keeps
    them), and empty text maps to an empty array rather than [''].
    DuckDB twin:
        CASE WHEN length(trim(lower(text))) = 0 THEN []
             ELSE string_split_regex(trim(lower(text)), '\\s+') END
    """
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def tokens_spark_sql(text_ref: str) -> str:
    """Spark-dialect SQL text of ``tokens`` (same parsed tree — see the
    construction-cost note in functions/hashing.py). NOT the DuckDB twin;
    that lives in the contract module."""
    t = f"trim(lower({text_ref}))"
    return (
        f"CASE WHEN (length({t}) = 0) THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE split({t}, '\\\\s+', -1) END"
    )


def char_shingles_spark_sql(text_ref: str, n: int = 5) -> str:
    """Spark-dialect SQL text of ``char_shingles`` (same parsed tree)."""
    t = f"lower({text_ref})"
    last = f"(length({t}) - {n} + 1)"
    return (
        f"CASE WHEN {last} >= 1 THEN "
        f"transform(sequence(1, {last}), i -> substring({t}, i, {n})) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


# GPT-2-style pre-tokenizer, restricted to the regex subset Java (Spark) and
# RE2 (DuckDB) share — i.e. the original pattern minus the \s+(?!\S)
# lookahead (RE2 has none): contractions, optional-space letter runs,
# optional-space digit runs, optional-space punctuation runs, whitespace.
# The alternation covers every character class, so the matches PARTITION the
# string (concatenation of tokens == original text — pinned in tests).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(text: Column) -> Column:
    """BPE-style pre-tokens (the units a byte-pair encoder would merge
    within). The LLM-pipeline token-budget estimator: counts of these track
    real tokenizer counts far better than whitespace words, with no model
    file and no Python in the loop.
    DuckDB twin: regexp_extract_all(text, <BPE_PRETOKEN_RE>)"""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_pretokens(text))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Character n-grams. Guarded: Spark sequence(1,0) would count DOWN, so
    short strings explicitly yield an empty array.
    DuckDB twin: list_transform(range(1, greatest(length(t)-n+2, 1)), i -> substr(t, i::INT, n))."""
    t = F.lower(text)
    last = F.length(t) - F.lit(n) + 1
    return F.when(
        last >= 1,
        F.transform(F.sequence(F.lit(1), last), lambda i: F.substring(t, i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-grams joined with spaces.
    DuckDB twin: list_transform(range(...), i -> array_to_string(list_slice(toks, i, i+n-1), ' '))."""
    toks = tokens(text)
    last = F.size(toks) - F.lit(n) + 1
    return F.when(
        last >= 1,
        F.transform(
            F.sequence(F.lit(1), last),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(text: Column) -> Column:
    """DISTINCT stopword hits / token count (array_intersect is distinct-based
    in both engines — list_intersect in DuckDB)."""
    toks = tokens(text)
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS])))
    return hits.cast("double") / F.size(toks).cast("double")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars.
    DuckDB twin needs the 'g' flag: regexp_replace(text, p, '', 'g')."""
    stripped = F.regexp_replace(text, PUNCT_PATTERN, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text).cast("double")


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0, ~1]: favors mid-length
    tokens, some stopwords, little punctuation. Deterministic arithmetic only
    so the DuckDB twin matches bit-for-bit after rounding."""
    mtl = mean_token_len(text)
    length_term = F.lit(1.0) - F.least(F.abs(mtl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * F.lit(10.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(5.0), F.lit(1.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens(text)
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in markers])))
        out.append((lang, hits))
    return out


def lang_id(text: Column) -> Column:
    """Heuristic language-ID: argmax of marker-word hit counts, ties broken by
    language code DESC via max-of-structs (greatest((hits, lang)) — identical
    comparison semantics in DuckDB's greatest over ROWs)."""
    scored = lang_scores(text)
    structs = [F.struct(hits.alias("h"), F.lit(lang).alias("l")) for lang, hits in scored]
    return F.greatest(*structs)["l"]


def fingerprint(text: Column, n: int = 8) -> Column:
    """Document fingerprint: minimum portable hash over word 8-shingles
    (winnowing-style 'rolling hash' selection, reduced to global-min for
    determinism). Falls back to hashing the whole text for short docs."""
    from .hashing import portable_hash32

    grams = word_ngrams(text, n)
    return F.when(
        F.size(grams) > 0, F.array_min(F.transform(grams, portable_hash32))
    ).otherwise(portable_hash32(F.lower(text)))


# URL hygiene (web-crawl pipelines). Java∩RE2 regex subset, like the BPE
# and PII patterns, so every transform is oracle-exact in DuckDB.
_TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&?"


def url_host(url: Column) -> Column:
    """Lowercased host part (no scheme/port/path); '' for non-URLs.
    DuckDB twin: lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1))"""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/:?#]+)", 1))


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host, strip
    fragment, strip tracking params (utm_*/fbclid/gclid/ref), drop a
    trailing '?' or '&' left behind. Deterministic string surgery — the
    web-crawl rule that one page fetched via two campaign links is ONE
    document."""
    u = F.regexp_replace(url, r"#.*$", "")            # fragment
    u = F.regexp_replace(u, _TRACKING_PARAM_RE, "")   # tracking params
    u = F.regexp_replace(u, r"[?&]$", "")             # dangling separator
    # lowercase scheme://host prefix only (path stays case-sensitive)
    head = F.regexp_extract(u, r"^([a-zA-Z]+://[^/]*)", 1)
    tail = F.regexp_replace(u, r"^[a-zA-Z]+://[^/]*", "")
    return F.when(head == "", u).otherwise(F.concat(F.lower(head), tail))
