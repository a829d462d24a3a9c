"""The read path: catalog entries -> temp views -> spark.sql, with
VERSION AS OF rewriting and view-state column presentation."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import matview as MV
from ._base import SqlError, _mask
from ._catalog import Catalog

# ---------------------------------------------------------------------------
# reads: catalog names → temp views → spark.sql
# ---------------------------------------------------------------------------


def _read_entry(spark: SparkSession, entry: dict,
                version: int | None = None) -> DataFrame:
    """Read a catalog entry's CURRENT state the way a SQL user expects:
    maintenance-internal columns (``nn_*`` NULL-ness counters,
    ``_pair_key`` row identities) are hidden, and an MV created with
    non-canonical SQL aliases gets its declared output names back."""
    df = MV._read_source(spark, entry["path"], version)
    if entry.get("kind") == "table":
        # maintenance-column hiding / avgs / projection are VIEW-state
        # concerns — a base table legally owning columns named nn_x
        # and sum_x must surface them all, or SELECT * and INSERT's
        # column-count check disagree with append's real schema
        return df
    meta = entry.get("meta", {})
    for canon, col in (meta.get("avgs") or {}).items():
        # AVG presents as exact-BIGINT sum / non-null count (nn_*),
        # the same arithmetic both engines produce for integer AVG;
        # 0/0 -> NULL matches SQL AVG over an all-NULL group
        df = df.withColumn(canon, F.col(f"sum_{col}") / F.col(f"nn_{col}"))
    hide = [c for c in df.columns
            if c in ("_pair_key", "_nd_pair")
            or (c.startswith("nn_") and f"sum_{c[3:]}" in df.columns)]
    if hide:
        df = df.drop(*hide)
    requested = meta.get("requested")
    if requested:
        # project to the DECLARED SQL output: asking MIN(x) alone still
        # maintains the min/max pair, but the unrequested twin is state,
        # not schema — it must not leak into SELECT *
        df = df.select(*[c for c in requested if c in df.columns])
    aliases = meta.get("aliases") or {}
    if aliases:  # canonical state name -> SQL-declared output name
        df = df.select(*[F.col(c).alias(aliases.get(c, c))
                         for c in df.columns])
    return df


_VERSION_AS_OF = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s+version\s+as\s+of\s+(\d+)\b",
    re.IGNORECASE,
)

# the literal (quotes included) is blanked to spaces on the mask, so
# the pattern ends at OF; whitespace is then skipped and the literal
# recovered from the ORIGINAL text
_TIMESTAMP_AS_OF = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s+timestamp\s+as\s+of\b",
    re.IGNORECASE,
)
_TS_LITERAL = re.compile(r"\s*'((?:[^']|'')*)'")

# LENGTH-PRESERVING mask of string literals (backslash escapes and
# ''-doubling; BOTH quote styles — Spark treats \" as an escape inside
# double-quoted literals too), backticked identifiers, and both
# comment syntaxes: the VERSION AS OF rewrite and the name scan run
# against the mask, so quoted/commented text can neither pin versions
# nor trigger catalog reads, while offsets into the REAL text stay


def _run_select(spark: SparkSession, text: str, catalog: Catalog
                ) -> DataFrame:
    """Register every referenced catalog name as a temp view, rewrite
    ``name VERSION AS OF n`` to a pinned temp view, and delegate the
    statement text to spark.sql — full Spark SQL composes over
    maintained state."""

    from ..sources import versioned as V

    by_lower = {n.lower(): n for n in catalog.names()}
    scannable = _mask(text)

    # both time-travel forms rewrite to a pinned temp view; spans are
    # collected first (mixed forms in one statement), then spliced in
    # one left-to-right pass
    pins: list[tuple[int, int, str]] = []  # (start, end, view_name)
    for m in _VERSION_AS_OF.finditer(scannable):
        name = by_lower.get(m.group(1).lower())
        if name is None:
            continue
        ver = int(m.group(2))
        pinned = f"{name}__v{ver}"
        _read_entry(spark, catalog.get(name), ver)\
            .createOrReplaceTempView(pinned)
        pins.append((m.start(), m.end(), pinned))
    for m in _TIMESTAMP_AS_OF.finditer(scannable):
        name = by_lower.get(m.group(1).lower())
        if name is None:
            continue
        lm = _TS_LITERAL.match(text, m.end())
        if lm is None:
            continue
        ts = lm.group(1).replace("''", "'")
        entry = catalog.get(name)
        try:
            ver = V.version_at_timestamp(entry["path"], ts)
        except ValueError as ex:
            raise SqlError(str(ex)) from ex
        pinned = f"{name}__v{ver}"
        _read_entry(spark, entry, ver).createOrReplaceTempView(pinned)
        pins.append((m.start(), lm.end(), pinned))
    if pins:
        out, last = [], 0
        for start, end, pinned in sorted(pins):
            out.append(text[last:start])
            out.append(pinned)
            last = end
        out.append(text[last:])
        text = "".join(out)
        scannable = _mask(text)
    referenced = {m.group(0).lower()
                  for m in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*",
                                       scannable)}
    for name in catalog.names():
        if name.lower() in referenced:
            _read_entry(spark, catalog.get(name))\
                .createOrReplaceTempView(name)
    return spark.sql(text)

