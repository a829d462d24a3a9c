"""Driver-side query-language frontend (reference C1-C3).

Reimplements the signed-weighted-term grammar of rclip_server.py:85-106
without pyparsing — the grammar is regular enough for a hand-rolled scanner,
and parsing is O(len(query)), never distributed (SURVEY.md §2.C).

Grammar (semantics preserved exactly):

    query := (expr)*                 -- scan_string: skip unmatchable chars
    expr  := sign? term
    sign  := ('+'|'-') number?       -- defaults: '+' and 1 (rclip_server.py:87-92)
    term  := '"..."'                 -- quoted phrase (original text, quotes kept)
           | '(' ... ')'             -- nested parens (outer pair stripped later,
                                     --   rclip_server.py:134)
           | '{' ... '}'             -- JSON term, braces kept for dispatch
           | word+                   -- consecutive words form ONE term
    word  := unicode-alnum start, then printables except '([{}])'

Weight semantics (rclip_server.py:136): weight = magnitude * (sign=='-' ? -1 : +1),
i.e. ``-2(winter sports)`` → (-2.0, 'winter sports'); bare term → (+1.0, term).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_NUMBER_RE = re.compile(r"(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?")
_EXCLUDED = set("([{}])")
_OPEN_TO_CLOSE = {"(": ")", "{": "}", "[": "]"}


@dataclass(frozen=True)
class Term:
    weight: float
    text: str


def _is_word_start(ch: str) -> bool:
    return ch.isalnum()


def _is_word_char(ch: str) -> bool:
    return (not ch.isspace()) and ch not in _EXCLUDED


def _skip_ws(q: str, i: int) -> int:
    while i < len(q) and q[i].isspace():
        i += 1
    return i


def _scan_balanced(q: str, i: int) -> int | None:
    """Return index just past the closer matching the opener at q[i], with all
    three bracket kinds required to nest properly (pyparsing nestedExpr
    behavior); None if unbalanced."""
    stack = [q[i]]
    j = i + 1
    while j < len(q) and stack:
        ch = q[j]
        if ch in _OPEN_TO_CLOSE:
            stack.append(ch)
        elif ch in (")", "}", "]"):
            if not stack or _OPEN_TO_CLOSE[stack[-1]] != ch:
                return None
            stack.pop()
        j += 1
    return j if not stack else None


def _scan_term(q: str, i: int) -> tuple[str, int] | None:
    """Try to match one term at position i; return (original_text, end)."""
    if i >= len(q):
        return None
    ch = q[i]
    if ch == '"':
        end = q.find('"', i + 1)
        if end == -1:
            return None
        return q[i : end + 1], end + 1  # quotes kept (original_text_for)
    if ch in ("(", "{"):
        end = _scan_balanced(q, i)
        if end is None:
            return None
        return q[i:end], end
    if _is_word_start(ch):
        # words := OneOrMore(word); original text keeps inner whitespace
        j = i
        last_word_end = None
        while j < len(q) and _is_word_start(q[j]):
            while j < len(q) and _is_word_char(q[j]):
                j += 1
            last_word_end = j
            j = _skip_ws(q, j)
        return q[i:last_word_end], last_word_end
    return None


def parse_query(q: str) -> list[Term]:
    """Scan the whole string for sign+term matches, skipping unmatchable
    characters one at a time (pyparsing search_string behavior)."""
    terms: list[Term] = []
    i = 0
    n = len(q)
    while i < n:
        start = i
        i = _skip_ws(q, i)
        if i >= n:
            break
        sign, magnitude = "+", 1.0
        j = i
        if q[j] in "+-":
            sign = q[j]
            j = _skip_ws(q, j + 1)
            m = _NUMBER_RE.match(q, j)
            if m:
                magnitude = float(m.group(0))
                j = _skip_ws(q, m.end())
        matched = _scan_term(q, j)
        if matched is None and j != i:
            # sign present but no term after it: retry without the sign
            matched = _scan_term(q, i)
            sign, magnitude = "+", 1.0
        if matched is None:
            i = start + 1 if start + 1 > i else i + 1
            continue
        text, end = matched
        # strip ONE outer paren pair (rclip_server.py:134)
        if len(text) > 2 and text[0] == "(" and text[-1] == ")":
            text = text[1:-1]
        weight = magnitude * (-1.0 if sign == "-" else 1.0)
        terms.append(Term(weight, text))
        i = end
    return terms
