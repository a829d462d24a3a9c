"""Small driver-side row lists as SQL ``VALUES`` local relations.

r14 optimization (guide §1.2/§5): ``spark.createDataFrame(rows, ddl)``
builds an RDD-backed plan — every action that touches it runs a real scan
stage through a Python worker, which on this host costs ~0.3 s even for a
3-row frame (measured: ``createDataFrame([...]).collect()`` 0.31 s vs a
``VALUES`` LocalTableScan 0.04 s, and the same delta re-appears inside any
join whose probe side is such a frame). Rendering the rows as a parsed
``VALUES`` statement instead produces a JVM ``LocalRelation``: collect is
driver-only, broadcasts build without launching a job, and Catalyst can
constant-fold through it. ``F.expr`` parses arbitrarily large SQL text in
~0.4 ms (one py4j round-trip), so the text path is strictly cheaper for
anything sketch-sized.

Only plain types are rendered (ints, doubles, strings, booleans,
``array<...>`` of those); anything else — or a row list big enough that a
distributed frame is genuinely the right altitude — falls back to
``createDataFrame`` unchanged. Doubles round-trip exactly: ``repr()`` is
the shortest decimal that re-parses to the same IEEE-754 bits and Spark
parses double literals with ``Double.parseDouble`` (correctly rounded), so
results are bit-identical with the createDataFrame path.
"""

from __future__ import annotations

import math
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

# Above this, the SQL text gets into the multi-MB range and a distributed
# frame is the right altitude anyway (sources/external.py's rule).
_MAX_ROWS = 20_000

_INT_TYPES = {"tinyint", "byte", "smallint", "short", "int", "integer",
              "bigint", "long"}
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    """'a bigint, b array<double>' -> [('a','bigint'), ('b','array<double>')]
    (top-level comma split; raises on anything it cannot read)."""
    fields, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur))
    out = []
    for f in fields:
        parts = f.strip().split(None, 1)
        if len(parts) != 2:
            raise ValueError(f"unreadable DDL field {f!r}")
        name = parts[0].strip().strip("`")
        if not _IDENT_RE.match(name):
            raise ValueError(f"unreadable column name {name!r}")
        out.append((name, parts[1].strip().lower()))
    return out


def _render(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ in _INT_TYPES:
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(f"{v!r} is not an int for {typ}")
        return f"CAST({int(v)} AS {typ})"
    if typ in ("double", "float", "real"):
        f = float(v)
        if math.isnan(f):
            return f"CAST('NaN' AS {typ})"
        if math.isinf(f):
            return f"CAST('{'-' if f < 0 else ''}Infinity' AS {typ})"
        return f"CAST({f!r} AS {typ})"
    if typ == "string":
        if not isinstance(v, str):
            raise ValueError(f"{v!r} is not a str")
        body = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{body}'"
    if typ == "boolean":
        if not isinstance(v, bool):
            raise ValueError(f"{v!r} is not a bool")
        return "TRUE" if v else "FALSE"
    if typ.startswith("array<") and typ.endswith(">"):
        el = typ[6:-1]
        if not isinstance(v, (list, tuple)):
            raise ValueError(f"{v!r} is not a sequence for {typ}")
        if not v:
            return f"CAST(ARRAY() AS {typ})"
        compact = _render_array_compact(v, el, typ)
        if compact is not None:
            return compact
        return "ARRAY(" + ",".join(_render(x, el) for x in v) + ")"
    raise ValueError(f"unsupported type {typ!r}")


def _render_array_compact(v, el: str, typ: str) -> str | None:
    """Numeric arrays as ONE string literal: ``CAST(split('..',',') AS t)``.

    The elementwise ``ARRAY(CAST(x AS t), ...)`` form costs 2 AST nodes per
    element; a 64-dim double array is ~129 nodes, and a probe frame of 64
    such rows pushed Catalyst analysis to ~0.4 s per plan (measured — the
    r14 ann_batch32 regression). The split form is one literal plus two
    calls per row; ConstantFolding evaluates it to the same LocalRelation.
    Bit-exact: string→double cast is Double.parseDouble (correctly rounded
    on the shortest-repr round trip), string→integral an exact parse. Bails
    (→ elementwise) on nulls, non-finite floats, or non-numeric elements."""
    if el in _INT_TYPES:
        if any(x is None or isinstance(x, bool) or not isinstance(x, int)
               for x in v):
            return None
        body = ",".join(str(int(x)) for x in v)
    elif el in ("double", "float", "real"):
        vals = []
        for x in v:
            if x is None or not isinstance(x, (int, float)) \
                    or isinstance(x, bool):
                return None
            f = float(x)
            if math.isnan(f) or math.isinf(f):
                return None
            vals.append(repr(f))
        body = ",".join(vals)
    else:
        return None
    return f"CAST(split('{body}',',') AS {typ})"


def values_df(spark: SparkSession, rows: Sequence, ddl: str) -> DataFrame:
    """``createDataFrame(rows, ddl)`` as a VALUES LocalRelation when the
    rows are small and plainly typed; identical rows/schema either way."""
    try:
        fields = _split_ddl(ddl)
        if len(rows) > _MAX_ROWS:
            raise ValueError("row list too large for SQL text")
        rendered = []
        for row in rows:
            if len(row) != len(fields):
                raise ValueError(f"row width {len(row)} != {len(fields)}")
            rendered.append(
                "(" + ",".join(_render(v, t)
                               for v, (_, t) in zip(row, fields)) + ")"
            )
        names = ",".join(f"`{n}`" for n, _ in fields)
        if not rendered:
            nulls = ",".join(f"CAST(NULL AS {t}) AS `{n}`"
                             for n, t in fields)
            return spark.sql(f"SELECT {nulls} WHERE FALSE")
        return spark.sql(
            f"SELECT * FROM (VALUES {','.join(rendered)}) AS t({names})"
        )
    except ValueError:
        return spark.createDataFrame(rows, ddl)
