"""The read path: catalog entries -> temp views -> spark.sql, with
VERSION AS OF rewriting and view-state column presentation."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import matview as MV
from ._base import _mask
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

    by_lower = {n.lower(): n for n in catalog.names()}
    scannable = _mask(text)

    out, last = [], 0
    for m in _VERSION_AS_OF.finditer(scannable):
        name = by_lower.get(m.group(1).lower())
        if name is None:
            continue
        ver = int(m.group(2))
        pinned = f"{name}__v{ver}"
        _read_entry(spark, catalog.get(name), ver)\
            .createOrReplaceTempView(pinned)
        out.append(text[last:m.start()])
        out.append(pinned)
        last = m.end()
    if out:
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

