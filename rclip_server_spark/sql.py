"""SQL frontend for the lakehouse layer: a driver-side statement
dispatcher that makes versioned tables and all five maintained-view
kinds (agg / transform / top-k / join / join-table) reachable through
SQL text instead of ``import matview``.

The reference's whole value was a *query interface* over its index
(rclip_server.py:85-106 serves parsed query strings); this module gives
the Spark engine the equivalent entry point for its storage layer:

* ``CREATE TABLE t [OPTIONS (key='id')] AS SELECT ...``
* ``INSERT INTO|OVERWRITE t SELECT ...`` / ``DELETE FROM t WHERE ...``
* ``UPDATE t SET col = expr WHERE ...`` / ``MERGE INTO t USING src ON
  t.k = s.k WHEN MATCHED [AND c] THEN UPDATE SET ...|DELETE / WHEN NOT
  MATCHED [AND c] THEN INSERT ...`` (the CDC-apply clause surface)
* ``ALTER TABLE t ADD COLUMN c <type>`` — O(1) schema evolution (old
  segments read the new column as NULL)
* ``CREATE MATERIALIZED VIEW v [OPTIONS (...)] AS SELECT ...`` — the
  view KIND is inferred from the query shape (see ``_plan_mv``):
    - ``SELECT g, COUNT(*) AS c, SUM(x) AS s, MIN(y)... FROM t GROUP
      BY g``                         → incremental agg view
    - same over ``a [LEFT] JOIN b USING (k)``  → incremental join view
    - ``SELECT * FROM a [LEFT] JOIN b USING (k)`` → maintained join
      TABLE (the denormalized pre-join)
    - ``SELECT <exprs> FROM t [WHERE p]`` → row-transform view (the
      transform is the projection+filter itself; its identity is a
      hash of the normalized SQL so refreshes can't silently mix
      functions)
    - ``SELECT g..., id, score FROM t QUALIFY ROW_NUMBER() OVER
      (PARTITION BY g... ORDER BY score DESC, id ASC) <= k``
                                      → maintained top-k view
* ``REFRESH MATERIALIZED VIEW v [CASCADE]`` — kind-dispatched through
  matview.refresh_view / refresh_cascade (transform views have their
  function rebuilt from the catalog-recorded SQL).
* ``START REFRESH STREAM ON VIEW v [CASCADE]`` / ``STOP REFRESH
  STREAM ON VIEW v`` — continuous maintenance: a streaming query
  tails the composition's base-table manifest logs and cascades a
  refresh per micro-batch; ``DESCRIBE [MATERIALIZED] VIEW`` reports
  the stream's liveness.
* ``SELECT ...`` over any mix of registered tables/views — names are
  registered as Spark temp views (internal maintenance columns
  ``nn_*`` / ``_pair_key`` hidden, SQL aliases restored) and the text
  is delegated verbatim to ``spark.sql`` — so the FULL Spark SQL
  surface composes on top of maintained state. ``t VERSION AS OF n``
  time-travels a versioned table.
* ``CREATE MATERIALIZED VIEW v USING near_dup OPTIONS (source='t',
  key='id', ...)`` — the algorithm-defined kind (the maintained
  banded-MinHash pair table) that has no SQL shape to infer from.
* ``EXPLAIN <select>`` — the formatted physical plan, for checking
  pushdown/broadcast/shuffle shape from the same entry point.
* ``DESCRIBE [MATERIALIZED] VIEW v`` / ``DESCRIBE CASCADE v`` /
  ``DESCRIBE HISTORY t`` / ``SHOW TABLES`` — manifest-only metadata.
* ``VACUUM t [KEEP n]`` — cursor-safe: clamped to every registered
  view's refresh cursor (matview.vacuum_source_safely with the whole
  catalog as the dependent-view list).
* ``OPTIMIZE t [ZORDER BY (x, y)]`` — fold accreted segments into one
  committed version (versioned.compact), or recluster by Morton key
  with zone maps on both columns (versioned.cluster_zorder).
* ``DROP TABLE t`` / ``DROP MATERIALIZED VIEW v``

Scale notes: every statement is driver-side manifest work plus the
same incremental refresh plans the Python API produces — the parser
adds zero Spark jobs and the generated plans are byte-identical to
the matview/versioned ones (the plan-audit assertions in PLANS.md
cover them). The catalog is a JSON file next to the tables; at 100 TB
the same statements run unchanged because names resolve to paths and
paths resolve to manifests, never to data scans.
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import matview as MV
from .sources import versioned as V


class SqlError(ValueError):
    """Statement rejected: syntax, unknown name, or unsupported shape.
    The message always names the supported alternative."""


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_RESERVED = {
    "select", "from", "where", "group", "by", "join", "left", "inner",
    "using", "qualify", "create", "table", "materialized", "view",
    "refresh", "cascade", "describe", "insert", "into", "delete",
    "drop", "vacuum", "keep", "options", "as", "history", "show",
    "tables", "version", "of", "values", "and", "or", "not",
}

# NEW names may not shadow any statement's grammar words, but these
# stay OUT of the parser's reserved set (_RESERVED): SQL text stored
# in existing catalogs may legally use them as identifiers/aliases,
# and _mv_transforms re-parses that text on every REFRESH — widening
# the parser set would brick whole legacy catalogs.
_UNREGISTERABLE = _RESERVED | {
    "update", "merge", "set", "when", "matched", "then", "on",
    "restore", "optimize", "explain", "distinct", "to",
    "alter", "add", "column", "start", "stop", "stream",
}


class Catalog:
    """name → versioned-table path registry, persisted as
    ``<root>/_catalog.json`` so a later session (or another process)
    resolves the same names. Entries carry a ``kind`` ("table" or the
    maintained-view kind) and a ``meta`` dict: a table's declared
    ``key`` column (what DELETE deletes by), an MV's normalized SQL
    body (what REFRESH rebuilds a transform from) and its alias map
    (SQL output names → canonical state-column names)."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._file = os.path.join(self.root, "_catalog.json")
        self._lock = self._file + ".lock"
        self._entries: dict[str, dict] = {}
        self._load()

    def _load(self) -> None:
        if os.path.exists(self._file):
            with open(self._file) as f:
                self._entries = json.load(f)
        else:
            # a deleted/reset catalog must not be resurrected from a
            # stale in-memory snapshot by the next mutation's _save
            self._entries = {}

    @staticmethod
    def _pid_dead(pid: int) -> bool:
        try:
            os.kill(pid, 0)
            return False
        except ProcessLookupError:
            return True
        except PermissionError:
            return False  # alive, owned by another user

    def _try_reap_stale_lock(self) -> None:
        """If the lock's recorded owner pid is dead, remove the lock.
        Reap by RENAME-to-unique-tombstone first, then verify the
        tombstone's pid before unlinking: the rename is atomic, so at
        most one reaper can ever remove a given lock incarnation — a
        plain read-then-unlink has a window where another process
        reaps, a third acquires, and the unlink deletes the LIVE
        third's lock (two mutators in the critical section). If the
        tombstoned incarnation turns out to be live after all (it was
        replaced between the pid check and the rename), it is linked
        back in place, best-effort; the 30s deadline in _locked
        remains the liveness backstop."""
        try:
            with open(self._lock) as f:
                pid = int(f.read().strip() or "0")
        except (OSError, ValueError):
            return  # vanished or unreadable — let the retry loop spin
        if not self._pid_dead(pid):
            return
        tomb = self._lock + f".tomb.{uuid.uuid4().hex[:8]}"
        try:
            os.rename(self._lock, tomb)
        except OSError:
            return  # someone else reaped (or owner released) first
        try:
            with open(tomb) as f:
                tpid = int(f.read().strip() or "0")
        except (OSError, ValueError):
            tpid = pid  # unreadable tombstone: treat as the judged one
        if tpid == pid or self._pid_dead(tpid):
            with contextlib.suppress(OSError):
                os.remove(tomb)
            return
        # we tombstoned a LIVE incarnation that replaced the dead one
        # mid-decision — restore the same inode so the live holder's
        # release still finds its lock
        try:
            os.link(tomb, self._lock)
        except OSError:
            pass  # a waiter slipped in; deadline backstop applies
        with contextlib.suppress(OSError):
            os.remove(tomb)

    @contextlib.contextmanager
    def _locked(self):
        """os.link-arbitrated mutual exclusion for catalog mutations —
        the same primitive the versioned commit protocol uses, so two
        processes registering different names through one catalog file
        cannot lose each other's entry (each mutation re-reads the
        file under the lock before applying itself). The lock is
        advisory for MUTATIONS only; reads stay lock-free. A lock
        whose recorded owner pid is dead is reaped automatically."""
        tmp = self._lock + f".{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
        try:
            deadline = time.monotonic() + 30.0
            while True:
                try:
                    os.link(tmp, self._lock)
                    break
                except FileExistsError:
                    self._try_reap_stale_lock()
                    if time.monotonic() > deadline:
                        raise SqlError(
                            f"catalog lock {self._lock} held for "
                            f">30s — stale? remove it to recover")
                    time.sleep(0.01)
            try:
                self._load()  # rebase onto the latest on-disk state
                yield
            finally:
                os.remove(self._lock)
        finally:
            os.remove(tmp)

    def _save(self) -> None:
        tmp = self._file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self._file)

    def register(self, name: str, path: str, kind: str = "table",
                 meta: dict | None = None,
                 require_path: bool = False) -> None:
        """``require_path=True`` (the CREATE paths set it) refuses to
        publish an entry whose data directory is missing — the
        closing guard of the CREATE-race protocol: if a concurrent
        failed CREATE's reap removed this build's directories before
        we got the lock, fail cleanly instead of registering a
        dangling name."""
        if not _IDENT_RE.match(name) or name.lower() in _UNREGISTERABLE:
            raise SqlError(f"{name!r} is not a legal table name "
                           f"(identifier, not a reserved word)")
        with self._locked():
            # Spark resolves temp views case-insensitively, so names
            # that collide on lowercase would shadow each other at
            # read time — reject at declaration. This check runs on
            # the freshly-rebased state under the lock, so it is the
            # AUTHORITATIVE duplicate gate: two processes CREATE-ing
            # the same name concurrently both pass check_available's
            # lock-free pre-check, but the second register fails here
            # instead of silently overwriting the first entry.
            clash = next((n for n in self._entries
                          if n.lower() == name.lower()), None)
            if clash == name:
                raise SqlError(f"{name!r} already exists — DROP it "
                               f"first")
            if clash:
                raise SqlError(f"{name!r} collides with registered "
                               f"{clash!r} (names resolve case-"
                               f"insensitively, like Spark SQL)")
            if require_path and not os.path.isdir(path):
                raise SqlError(
                    f"cannot register {name!r}: data path {path} is "
                    f"missing — a concurrent failed CREATE may have "
                    f"reaped it; retry the statement")
            self._entries[name] = {"path": os.path.abspath(path),
                                   "kind": kind, "meta": meta or {}}
            self._save()

    def unregister(self, name: str) -> dict:
        with self._locked():
            match = name if name in self._entries else next(
                (n for n in self._entries
                 if n.lower() == name.lower()), None)
            e = self._entries.pop(match, None) if match else None
            if e is None:
                raise SqlError(f"unknown table or view: {name}")
            self._save()
            return e

    def get(self, name: str) -> dict:
        # refresh from disk (one small JSON read) so a long-lived
        # session sees another process's CREATE/DROP — the catalog is
        # advertised as cross-process, and serving the construction-
        # time snapshot would resolve DROPped entries to rmtree'd
        # directories
        self._load()
        e = self._entries.get(name)
        if e is None:  # case-insensitive fallback, like Spark SQL
            e = next((v for n, v in self._entries.items()
                      if n.lower() == name.lower()), None)
        if e is None:
            raise SqlError(
                f"unknown table or view: {name} "
                f"(known: {sorted(self._entries) or '<none>'})")
        return e

    def check_available(self, name: str) -> None:
        """Validate a NEW name before any data is materialized — name
        legality, reserved words, case-insensitive collisions, and
        already-registered names all fail here, not after a full
        CREATE job has written directories. Lock-free PRE-check only
        (refreshed from disk, but another process can still win the
        name between here and register — register's under-lock clash
        check is the authoritative gate)."""
        if not _IDENT_RE.match(name) or name.lower() in _UNREGISTERABLE:
            raise SqlError(f"{name!r} is not a legal table name "
                           f"(identifier, not a reserved word)")
        self._load()
        clash = next((n for n in self._entries
                      if n.lower() == name.lower()), None)
        if clash:
            raise SqlError(
                f"{name!r} already exists as {clash!r} — DROP it "
                f"first (names resolve case-insensitively)")

    def names(self) -> list[str]:
        self._load()  # cross-process visibility, same as get()
        return sorted(self._entries)

    def path_for(self, name: str) -> str:
        """Default storage path for a NEW table created through SQL."""
        return os.path.join(self.root, name)


# ---------------------------------------------------------------------------
# tokenizer — identifiers / strings / numbers / operators, with source
# offsets so raw expression spans can be recovered verbatim
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<str>'(?:[^']|'')*')
    | (?P<num>\d+(?:\.\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op><=|>=|<>|!=|\|\||[*=<>(),.+\-/%])
    )""",
    re.X,
)


class _Tok:
    __slots__ = ("kind", "text", "start", "end")

    def __init__(self, kind, text, start, end):
        self.kind, self.text, self.start, self.end = kind, text, start, end

    @property
    def lower(self):
        return self.text.lower()


def _tokenize(text: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            raise SqlError(f"cannot tokenize at offset {pos}: "
                           f"{text[pos:pos + 20]!r}")
        kind = m.lastgroup
        toks.append(_Tok(kind, m.group(kind), m.start(kind), m.end(kind)))
        pos = m.end()
    return toks


class _Cursor:
    def __init__(self, toks: list[_Tok], text: str):
        self.toks, self.text, self.i = toks, text, 0

    def peek(self, ahead: int = 0) -> _Tok | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "ident" and t.lower in kws

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise SqlError("unexpected end of statement")
        self.i += 1
        return t

    def expect_kw(self, kw: str) -> _Tok:
        t = self.take()
        if t.kind != "ident" or t.lower != kw:
            raise SqlError(f"expected {kw.upper()}, got {t.text!r}")
        return t

    def expect_op(self, op: str) -> _Tok:
        t = self.take()
        if t.text != op:
            raise SqlError(f"expected {op!r}, got {t.text!r}")
        return t

    def expect_ident(self) -> str:
        t = self.take()
        if t.kind != "ident" or t.lower in _RESERVED:
            raise SqlError(f"expected identifier, got {t.text!r}")
        return t.text

    def done(self) -> bool:
        return self.i >= len(self.toks)


def _ident_list(cur: _Cursor) -> list[str]:
    out = [cur.expect_ident()]
    while cur.peek() is not None and cur.peek().text == ",":
        cur.take()
        out.append(cur.expect_ident())
    return out


def _parse_options(cur: _Cursor) -> dict:
    """``OPTIONS (k = 'v' | num, ...)`` — declared table/view knobs."""
    opts: dict = {}
    if not cur.at_kw("options"):
        return opts
    cur.take()
    cur.expect_op("(")
    while True:
        k = cur.expect_ident().lower()
        cur.expect_op("=")
        t = cur.take()
        if t.kind == "str":
            opts[k] = t.text[1:-1].replace("''", "'")
        elif t.kind == "num":
            opts[k] = float(t.text) if "." in t.text else int(t.text)
        else:
            raise SqlError(f"OPTIONS value must be a string or number, "
                           f"got {t.text!r}")
        nxt = cur.take()
        if nxt.text == ")":
            return opts
        if nxt.text != ",":
            raise SqlError(f"expected , or ) in OPTIONS, got {nxt.text!r}")


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
# valid for the rewrite splice.
_MASK_RE = re.compile(
    r"'(?:[^'\\]|\\.|'')*'"
    r'|"(?:[^"\\]|\\.)*"'
    r"|`[^`]*`|--[^\n]*|/\*.*?\*/",
    re.DOTALL)


def _mask(text: str) -> str:
    return _MASK_RE.sub(lambda m: " " * len(m.group(0)), text)


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


# ---------------------------------------------------------------------------
# CREATE MATERIALIZED VIEW — parse the SELECT body, infer the view kind
# ---------------------------------------------------------------------------


class _Item:
    """One select-list item: ('count',None) | ('sum'|'min'|'max',col)
    | ('col',name) | ('star',None) | ('expr',src_text) — plus the
    SQL-declared output alias."""

    def __init__(self, kind, col, alias):
        self.kind, self.col, self.alias = kind, col, alias


def _parse_select_items(cur: _Cursor) -> list[_Item]:
    items = []
    while True:
        t = cur.peek()
        if t.text == "*":
            cur.take()
            items.append(_Item("star", None, None))
        elif (t.kind == "ident" and t.lower in ("count", "sum", "min",
                                                "max", "avg")
              and cur.peek(1) is not None and cur.peek(1).text == "("):
            fn = cur.take().lower
            cur.expect_op("(")
            if fn == "count" and cur.at_kw("distinct"):
                cur.take()
                fn, col = "count_distinct", cur.expect_ident()
            elif fn == "count":
                cur.expect_op("*")
                col = None
            else:
                col = cur.expect_ident()
            cur.expect_op(")")
            items.append(_Item(fn, col, _maybe_alias(cur)))
        elif (t.kind == "ident" and t.lower not in _RESERVED
              and (cur.peek(1) is None
                   or cur.peek(1).text in (",",)
                   or cur.peek(1).lower in ("as", "from"))):
            items.append(_Item("col", cur.take().text, _maybe_alias(cur)))
        else:
            # raw expression: consume tokens to top-level , / AS / FROM
            depth, start = 0, t.start
            end = start
            while cur.peek() is not None:
                p = cur.peek()
                if depth == 0 and (p.text == ","
                                   or (p.kind == "ident"
                                       and p.lower in ("as", "from"))):
                    break
                if p.text == "(":
                    depth += 1
                elif p.text == ")":
                    depth -= 1
                end = cur.take().end
            items.append(_Item("expr", cur.text[start:end],
                               _maybe_alias(cur)))
        nxt = cur.peek()
        if nxt is not None and nxt.text == ",":
            cur.take()
            continue
        return items


def _maybe_alias(cur: _Cursor) -> str | None:
    if cur.at_kw("as"):
        cur.take()
        return cur.expect_ident()
    return None


def _raw_until(cur: _Cursor, stop_kws: set[str]) -> str:
    """Verbatim source slice to the next top-level stop keyword."""
    if cur.done():
        raise SqlError("expected an expression")
    start = cur.peek().start
    end, depth = start, 0
    while cur.peek() is not None:
        p = cur.peek()
        if depth == 0 and p.kind == "ident" and p.lower in stop_kws:
            break
        if p.text == "(":
            depth += 1
        elif p.text == ")":
            depth -= 1
        end = cur.take().end
    return cur.text[start:end]


class _MvPlan:
    def __init__(self, kind, **kw):
        self.kind = kind
        self.__dict__.update(kw)


def _parse_mv_body(cur: _Cursor) -> _MvPlan:
    """Parse the SELECT body of CREATE MATERIALIZED VIEW and classify
    it into one of the five maintained-view kinds."""
    cur.expect_kw("select")
    items = _parse_select_items(cur)
    cur.expect_kw("from")
    left = cur.expect_ident()
    right = how = None
    on: list[str] = []
    if cur.at_kw("join", "left", "inner"):
        kw = cur.take().lower
        how = "inner"
        if kw == "left":
            how = "left"
            if cur.at_kw("outer"):
                cur.take()
            cur.expect_kw("join")
        elif kw == "inner":
            cur.expect_kw("join")
        right = cur.expect_ident()
        t = cur.take()
        if t.kind != "ident" or t.lower != "using":
            raise SqlError(
                "maintained join views join with USING (col, ...) — "
                f"ON syntax is not supported; got {t.text!r}")
        cur.expect_op("(")
        on = _ident_list(cur)
        cur.expect_op(")")
    where = None
    if cur.at_kw("where"):
        cur.take()
        where = _raw_until(cur, {"group", "qualify"})
    group_by: list[str] = []
    if cur.at_kw("group"):
        cur.take()
        cur.expect_kw("by")
        group_by = _ident_list(cur)
    qualify = None
    if cur.at_kw("qualify"):
        cur.take()
        qualify = _parse_qualify(cur)
    if not cur.done():
        raise SqlError(f"unexpected trailing tokens: "
                       f"{cur.text[cur.peek().start:]!r}")

    if qualify is not None:
        if right is not None or group_by or where is not None:
            raise SqlError("QUALIFY top-k views take a single source, "
                           "no WHERE/GROUP BY")
        return _MvPlan("topk", items=items, source=left, **qualify)
    if group_by:
        if where is not None:
            raise SqlError(
                "WHERE on an aggregating materialized view is not "
                "supported — materialize a transform view of the "
                "filter first and aggregate over it (views compose)")
        if right is None:
            return _MvPlan("agg", items=items, source=left,
                           group_by=group_by)
        return _MvPlan("join", items=items, left=left, right=right,
                       on=on, how=how, group_by=group_by)
    if right is not None:
        if len(items) != 1 or items[0].kind != "star":
            raise SqlError("a maintained join TABLE must select * "
                           "(both sides' columns verbatim)")
        if where is not None:
            raise SqlError("WHERE on a maintained join table is not "
                           "supported — filter a transform view first")
        return _MvPlan("join_table", left=left, right=right, on=on,
                       how=how)
    return _MvPlan("transform", items=items, source=left, where=where)


def _parse_qualify(cur: _Cursor) -> dict:
    """``ROW_NUMBER() OVER (PARTITION BY g... ORDER BY s DESC, k ASC)
    <= K`` — the one rank shape top-k views maintain."""
    t = cur.take()
    if t.lower != "row_number":
        raise SqlError("QUALIFY supports exactly ROW_NUMBER() OVER "
                       "(PARTITION BY ... ORDER BY s DESC, key ASC) <= k")
    cur.expect_op("(")
    cur.expect_op(")")
    cur.expect_kw("over")
    cur.expect_op("(")
    cur.expect_kw("partition")
    cur.expect_kw("by")
    part = _ident_list(cur)
    cur.expect_kw("order")
    cur.expect_kw("by")
    score = cur.expect_ident()
    cur.expect_kw("desc")
    cur.expect_op(",")
    key = cur.expect_ident()
    cur.expect_kw("asc")
    cur.expect_op(")")
    cur.expect_op("<=")
    k_tok = cur.take()
    if k_tok.kind != "num" or "." in k_tok.text:
        raise SqlError(f"top-k bound must be an integer, got "
                       f"{k_tok.text!r}")
    return {"part": part, "score": score, "key": key, "k": int(k_tok.text)}


def _bare_cols_must_match(items: list[_Item],
                          group_by: list[str]) -> None:
    bare = [i.col for i in items if i.kind == "col"]
    if bare != list(group_by):
        raise SqlError(
            f"select-list bare columns {bare} must equal the GROUP BY "
            f"list {list(group_by)} (in order)")


def _agg_spec(items: list[_Item], group_by: list[str]) -> dict:
    """Map parsed select items onto create_[join_]view's
    (group_cols, sum_cols, minmax_cols) + the alias map canonical→SQL
    name. Bare columns must equal the GROUP BY list; aggregates become
    state columns (MIN or MAX alone still maintains the min/max pair —
    the unrequested twin is hidden by the read projection). AVG(x) is
    maintained as the retractable pair (sum_x, nn_x) and divided at
    read time — exact for the integer columns the view layer sums."""
    _bare_cols_must_match(items, group_by)
    sum_cols, minmax_cols, aliases, requested = [], [], {}, []
    avgs = {}
    has_count = False
    for it in items:
        if it.kind == "col":
            requested.append(it.col)
            if it.alias and it.alias != it.col:
                aliases[it.col] = it.alias
        elif it.kind == "count":
            has_count = True
            requested.append("cnt")
            if it.alias and it.alias != "cnt":
                aliases["cnt"] = it.alias
        elif it.kind in ("sum", "min", "max", "avg"):
            canon = f"{it.kind}_{it.col}"
            requested.append(canon)
            if it.alias and it.alias != canon:
                aliases[canon] = it.alias
            if it.kind in ("sum", "avg"):
                if it.col not in sum_cols:
                    sum_cols.append(it.col)
                if it.kind == "avg":
                    avgs[canon] = it.col
            elif it.col not in minmax_cols:
                minmax_cols.append(it.col)
        elif it.kind == "count_distinct":
            raise SqlError(
                "COUNT(DISTINCT x) is supported in single-source agg "
                "views (it stacks a hidden pairs view) — for a join, "
                "materialize the join first and stack the distinct "
                "view on top")
        else:
            raise SqlError(
                "aggregating views support COUNT(*) / SUM / AVG / MIN "
                "/ MAX and the grouping columns — arbitrary "
                "expressions belong in a transform view underneath")
    if not has_count:
        raise SqlError("aggregating views must select COUNT(*) — it is "
                       "the maintenance anchor (group liveness)")
    return {"sum_cols": sum_cols, "minmax_cols": minmax_cols,
            "aliases": aliases, "requested": requested, "avgs": avgs}


def _norm_sql(text: str) -> str:
    return " ".join(text.split())


def _transform_name(body_sql: str) -> str:
    return "sql:" + hashlib.sha256(
        _norm_sql(body_sql).encode()).hexdigest()[:16]


def _transform_fn(items: list[_Item], where: str | None):
    """The row-local transform a SQL-defined transform view applies:
    WHERE filter + selectExpr projection. Row-local by construction —
    every select item is a scalar expression over one input row."""
    exprs = []
    for it in items:
        if it.kind == "star":
            exprs.append("*")
        elif it.kind == "col":
            exprs.append(f"{it.col} AS {it.alias}" if it.alias
                         else it.col)
        elif it.kind == "expr":
            if not it.alias:
                raise SqlError(
                    f"expression select items need AS <name>: "
                    f"{it.src if hasattr(it, 'src') else it.col!r}")
            exprs.append(f"({it.col}) AS {it.alias}")
        else:
            raise SqlError(
                "aggregate functions need GROUP BY (agg view) — a "
                "transform view's select list is row-local expressions")

    def fn(df: DataFrame) -> DataFrame:
        if where is not None:
            df = df.where(where)
        return df.selectExpr(*exprs)

    return fn


def _kind_internal_suffixes(kind: str) -> list:
    """Path suffixes of a view kind's hidden internal views — the ONE
    place a new kind with internals must be added (the strand-proof
    reap guard, DROP, and _create_using all derive from it)."""
    from .sources import neardup_view as ND
    if kind == "near_dup":
        return [ND.GRAMS_SUFFIX, ND.BANDS_SUFFIX]
    if kind == "embed_near_dup":
        return [ND.EVECS_SUFFIX, ND.EBKTS_SUFFIX]
    return []


def _entry_owned_paths(e: dict) -> list:
    """Every directory one catalog entry owns: its data path, its
    hidden stack levels, and its kind's internal index views."""
    return ([e["path"]] + (e["meta"].get("stack") or [])
            + list(e["meta"].get("stack_transforms") or {})
            + [e["path"] + s for s in _kind_internal_suffixes(e["kind"])])


def _dependents_of(catalog: Catalog, name: str, e: dict) -> list[str]:
    """Registered entries whose view graph READS any path the entry
    ``name`` owns — discovered from manifests (matview's post-order
    walk), so hidden stack levels and near-dup index internals count
    too. Manifest-only, zero Spark jobs."""
    owned = {os.path.abspath(p) for p in _entry_owned_paths(e)}
    out = []
    for n in catalog.names():
        if n.lower() == name.lower():
            continue
        e2 = catalog.get(n)
        if e2["kind"] == "table":
            continue
        reads: set = set()
        try:
            nodes, _leaves = MV._walk_views_post_order(e2["path"])
        except ValueError:
            continue  # unreadable/cyclic graph: not provably dependent
        for _p, (_k, _spec, sources) in nodes:
            reads.update(os.path.abspath(s) for s in sources)
        reads.discard(os.path.abspath(e2["path"]))
        reads -= {os.path.abspath(p) for p in _entry_owned_paths(e2)}
        if reads & owned:
            out.append(n)
    return sorted(out)


def _catalog_owned_paths(catalog: Catalog) -> set:
    owned = set()
    for n in catalog.names():
        owned.update(os.path.abspath(p)
                     for p in _entry_owned_paths(catalog.get(n)))
    return owned


def _strand_proof(catalog: Catalog, paths: list, fn):
    """Run a CREATE body; on failure (including KeyboardInterrupt —
    a Ctrl-C mid-CREATE must not brick the name) reap the directories
    the call created, so a failed CREATE neither strands unregistered
    dirs that block the next CREATE nor touches another object's
    data. The reap runs under the catalog mutation lock with a fresh
    ownership read, and skips any path a registered entry owns — so
    a racing loser never deletes the registered winner's data. In
    the residual window (winner built but not yet registered when the
    loser reaps), the winner's own register(require_path=True) fails
    cleanly rather than publishing an entry with no data. The reap is
    best-effort: if the guard itself fails (unreadable catalog,
    second interrupt), the ORIGINAL build error still surfaces."""
    clash = [p for p in paths if os.path.exists(p)]
    if clash:
        raise SqlError(
            f"cannot create: path(s) already exist on disk: {clash} — "
            f"another object (or an orphaned directory) owns them; "
            f"DROP or remove it first")
    try:
        return fn()
    except BaseException:
        tombstones = []
        try:
            # O(1) critical section: RENAME unowned paths to
            # tombstones under the lock (ownership can't change
            # mid-decision), delete the bytes after releasing it — a
            # multi-GB rmtree must not stall other processes into the
            # 30s lock deadline
            with catalog._locked():
                owned = _catalog_owned_paths(catalog)
                for p in paths:
                    if (os.path.abspath(p) not in owned
                            and os.path.exists(p)):
                        t = f"{p}.reap-{uuid.uuid4().hex[:8]}"
                        os.rename(p, t)
                        tombstones.append(t)
        except BaseException:
            import sys as _sys
            # best-effort lock-free ownership read JUST for the
            # warning: never name a registered winner's live data as
            # "stranded" (a user following rm advice would delete it)
            try:
                catalog._load()
                owned = _catalog_owned_paths(catalog)
            except BaseException:
                owned = None
            stranded = [p for p in paths if os.path.exists(p)
                        and (owned is None
                             or os.path.abspath(p) not in owned)]
            if stranded:
                print(f"warning: failed CREATE could not clean up; "
                      f"possibly stranded path(s): {stranded} — "
                      f"verify no catalog entry owns them before "
                      f"removing", file=_sys.stderr)
        try:
            for t in tombstones:
                shutil.rmtree(t, ignore_errors=True)
        except BaseException:
            # a second interrupt mid-delete leaves *.reap-* dirs
            # (harmless, uniquely named) — the ORIGINAL build error
            # must still be what surfaces
            pass
        raise


def _create_mv(spark: SparkSession, catalog: Catalog, name: str,
               opts: dict, plan: _MvPlan, body_sql: str) -> dict:
    # name already validated by the dispatch (check_available runs
    # BEFORE the strand-proof disk check so a plain duplicate reports
    # "already exists", not an orphan warning)
    vp = catalog.path_for(name)
    meta: dict = {"sql": _norm_sql(body_sql)}
    if plan.kind == "agg":
        src = catalog.get(plan.source)
        key = opts.get("key") or src["meta"].get("key")
        if not key:
            raise SqlError(
                "agg views need the source's row-identity column: "
                "OPTIONS (key='id') on the view or the source table")
        if any(i.kind == "count_distinct" for i in plan.items):
            return _create_distinct_mv(spark, catalog, name, key, plan,
                                       body_sql)
        spec = _agg_spec(plan.items, plan.group_by)
        MV.create_agg_view(spark, src["path"], vp, key=key,
                           group_cols=plan.group_by,
                           sum_cols=spec["sum_cols"],
                           minmax_cols=spec["minmax_cols"])
        meta.update(aliases=spec["aliases"], requested=spec["requested"],
                    avgs=spec["avgs"])
    elif plan.kind == "join":
        le, re_ = catalog.get(plan.left), catalog.get(plan.right)
        lk = opts.get("left_key") or le["meta"].get("key")
        rk = opts.get("right_key") or re_["meta"].get("key")
        if not (lk and rk):
            raise SqlError("join views need OPTIONS (left_key='..', "
                           "right_key='..') or keys declared on both "
                           "source tables")
        spec = _agg_spec(plan.items, plan.group_by)
        MV.create_join_view(spark, le["path"], re_["path"], vp,
                            on=plan.on, left_key=lk, right_key=rk,
                            group_cols=plan.group_by,
                            sum_cols=spec["sum_cols"],
                            minmax_cols=spec["minmax_cols"],
                            how=plan.how)
        meta.update(aliases=spec["aliases"], requested=spec["requested"],
                    avgs=spec["avgs"])
    elif plan.kind == "join_table":
        le, re_ = catalog.get(plan.left), catalog.get(plan.right)
        lk = opts.get("left_key") or le["meta"].get("key")
        rk = opts.get("right_key") or re_["meta"].get("key")
        if not (lk and rk):
            raise SqlError("join tables need OPTIONS (left_key='..', "
                           "right_key='..') or keys declared on both "
                           "source tables")
        MV.create_join_table_view(spark, le["path"], re_["path"], vp,
                                  on=plan.on, left_key=lk, right_key=rk,
                                  how=plan.how)
    elif plan.kind == "topk":
        src = catalog.get(plan.source)
        proj = [i.col for i in plan.items if i.kind == "col"]
        if ([i for i in plan.items if i.kind != "col"]
                or set(proj) != set(plan.part + [plan.key, plan.score])):
            raise SqlError(
                "a top-k view's select list must be exactly the "
                "partition columns, the key and the score "
                f"({plan.part + [plan.key, plan.score]}); got {proj}")
        MV.create_topk_view(spark, src["path"], vp, key=plan.key,
                            group_cols=plan.part, score_col=plan.score,
                            k=plan.k)
    elif plan.kind == "transform":
        src = catalog.get(plan.source)
        key = opts.get("key") or src["meta"].get("key")
        if not key:
            raise SqlError("transform views need the source's "
                           "row-identity column: OPTIONS (key='id') "
                           "or a key declared on the source table")
        fn = _transform_fn(plan.items, plan.where)
        MV.create_transform_view(spark, src["path"], vp, key=key,
                                 transform=fn,
                                 name=_transform_name(body_sql))
        meta["key"] = key
    else:  # pragma: no cover - _parse_mv_body is exhaustive
        raise SqlError(f"unknown view kind {plan.kind}")
    catalog.register(name, vp, kind=plan.kind, meta=meta,
                     require_path=True)
    return {"status": "created", "name": name, "kind": plan.kind,
            "path": vp}


def _synth_transform(sql_text: str):
    """(fn, name) for a stack-internal transform view, reconstructed
    from its synthetic SQL exactly the way _mv_transforms rebuilds
    user-declared transforms — one code path for both."""
    cur = _Cursor(*_tk(sql_text))
    plan = _parse_mv_body(cur)
    return _transform_fn(plan.items, plan.where), _transform_name(
        sql_text)


_DISTINCT_IND = "_x_nn"


def _create_distinct_mv(spark: SparkSession, catalog: Catalog,
                        name: str, key: str, plan: _MvPlan,
                        body_sql: str) -> dict:
    """``SELECT k, COUNT(DISTINCT x) [, COUNT(*)] FROM t GROUP BY k``
    as incrementally-maintained EXACT distinct counting — no sketch,
    pure view COMPOSITION of three hidden-except-the-top levels:
    a transform view (``<name>__nn``) projects the key/group/distinct
    columns plus a 0/1 x-IS-NOT-NULL indicator; a pairs agg view
    (``<name>__pairs``) holds one row per LIVE (k, x) pair (a pair
    whose count retracts to zero leaves it); and the named top view
    sums the indicator over pair rows — NULL never counts, matching
    SQL COUNT(DISTINCT) — while its SUM over the pair counts serves
    COUNT(*) (which does include NULL-x rows). Each level refreshes
    for the cost of the changes; plain REFRESH advances exactly the
    hidden levels then the top, and the graph walker gives
    vacuum-safety/DESCRIBE CASCADE for free."""
    cds = [i for i in plan.items if i.kind == "count_distinct"]
    if len(cds) > 1:
        raise SqlError("one COUNT(DISTINCT ...) per view — stack "
                       "another view for a second distinct column")
    cd = cds[0]
    bad = [i for i in plan.items
           if i.kind not in ("col", "count", "count_distinct")]
    if bad:
        raise SqlError(
            "COUNT(DISTINCT x) composes with COUNT(*) and the "
            "grouping columns only — other aggregates belong in a "
            "separate view over the same source")
    _bare_cols_must_match(plan.items, plan.group_by)
    if cd.col.lower() in {c.lower() for c in plan.group_by}:
        raise SqlError(
            f"COUNT(DISTINCT {cd.col}) over its own grouping column "
            f"is constant 1 per group — drop it or group differently")
    src = catalog.get(plan.source)
    vp = catalog.path_for(name)
    vp0, vp1 = vp + "__nn", vp + "__pairs"
    seen: set = set()
    proj = [c for c in [key, *plan.group_by, cd.col]
            if not (c.lower() in seen or seen.add(c.lower()))]
    t_sql = (f"SELECT {', '.join(proj)}, CASE WHEN {cd.col} IS NULL "
             f"THEN 0 ELSE 1 END AS {_DISTINCT_IND} "
             f"FROM {plan.source}")

    def _build() -> dict:
        fn, tname = _synth_transform(t_sql)
        MV.create_transform_view(spark, src["path"], vp0, key=key,
                                 transform=fn, name=tname)
        MV.create_agg_view(spark, vp0, vp1, key=key,
                           group_cols=[*plan.group_by, cd.col,
                                       _DISTINCT_IND])
        MV.create_agg_view(spark, vp1, vp, key=cd.col,
                           group_cols=list(plan.group_by),
                           sum_cols=["cnt", _DISTINCT_IND])
        requested, aliases = [], {}
        for it in plan.items:
            if it.kind == "col":
                requested.append(it.col)
                if it.alias and it.alias != it.col:
                    aliases[it.col] = it.alias
            elif it.kind == "count":
                requested.append("sum_cnt")
                aliases["sum_cnt"] = it.alias or "cnt"
            else:
                requested.append(f"sum_{_DISTINCT_IND}")
                aliases[f"sum_{_DISTINCT_IND}"] = (
                    it.alias or f"n_distinct_{cd.col}")
        catalog.register(name, vp, kind="agg",
                         meta={"sql": _norm_sql(body_sql),
                               "aliases": aliases,
                               "requested": requested,
                               "stack": [vp0, vp1],
                               "stack_transforms": {
                                   vp0: _norm_sql(t_sql)}},
                         require_path=True)
        return {"status": "created", "name": name, "kind": "agg",
                "path": vp}

    return _strand_proof(catalog, [vp, vp1, vp0], _build)


def _create_using(spark: SparkSession, catalog: Catalog, name: str,
                  kind: str, opts: dict) -> dict:
    """``CREATE MATERIALIZED VIEW v USING near_dup OPTIONS (source='t',
    key='id'[, text_col='text', shingle_n=5, num_hashes=32, bands=8,
    threshold=0.7, seed=42])`` — the maintained banded-MinHash pair
    table (sources/neardup_view.py), the one view kind whose definition
    is an algorithm, not a SQL shape. REFRESH / DESCRIBE / VACUUM /
    SELECT all work on it like any other registered view."""
    if kind not in ("near_dup", "embed_near_dup"):
        raise SqlError(f"unknown USING kind {kind!r}; supported: "
                       f"near_dup, embed_near_dup (SQL-shaped kinds "
                       f"use AS SELECT)")
    from .sources import neardup_view as ND

    src_name = opts.get("source")
    if not src_name:
        raise SqlError(f"USING {kind} needs OPTIONS (source='<table>')")
    src = catalog.get(str(src_name))
    key = opts.get("key") or src["meta"].get("key")
    if not key:
        raise SqlError(f"USING {kind} needs OPTIONS (key='id') or a "
                       f"key declared on the source table")
    catalog.check_available(name)
    vp = catalog.path_for(name)
    internals = [vp + s for s in _kind_internal_suffixes(kind)]

    def _build() -> dict:
        if kind == "near_dup":
            kw = {k: opts[k] for k in ("text_col", "shingle_n",
                                       "num_hashes", "bands",
                                       "threshold", "seed")
                  if k in opts}
            ND.create_near_dup_pairs_view(spark, src["path"], vp,
                                          key=key, **kw)
        else:
            kw = {k: opts[k] for k in ("vec_col", "threshold",
                                       "n_planes", "n_sets", "seed",
                                       "dim") if k in opts}
            ND.create_embed_near_dup_pairs_view(spark, src["path"], vp,
                                                key=key, **kw)
        catalog.register(name, vp, kind=kind, require_path=True)
        return {"status": "created", "name": name, "kind": kind,
                "path": vp}

    return _strand_proof(catalog, [vp, *internals], _build)


def _mv_transforms(catalog: Catalog) -> dict:
    """path → (fn, name) for every SQL-defined transform view in the
    catalog — what refresh_view/refresh_cascade need to advance them."""
    out = {}
    for n in catalog.names():
        e = catalog.get(n)
        if e["kind"] == "transform" and e["meta"].get("sql"):
            cur = _Cursor(*_tk(e["meta"]["sql"]))
            plan = _parse_mv_body(cur)
            out[e["path"]] = (_transform_fn(plan.items, plan.where),
                              _transform_name(e["meta"]["sql"]))
        # hidden stack-internal transforms (COUNT DISTINCT chains)
        # travel in the owning entry's meta, same reconstruction
        for p, s in (e["meta"].get("stack_transforms") or {}).items():
            out[p] = _synth_transform(s)
    return out


def _tk(text: str):
    return _tokenize(text), text


# live refresh-stream handles, keyed by (catalog root, lowercased view
# name). StreamingQuery handles are PROCESS-LOCAL: DESCRIBE VIEW
# reports liveness for streams started in this process; a stream
# started by another process shows as absent here (its wakes are still
# visible as the view's advancing cursor/version).
_STREAMS: dict[tuple, object] = {}


def _stream_key(catalog: Catalog, name: str) -> tuple:
    return (catalog.root, name.lower())


def _start_refresh_stream(spark: SparkSession, catalog: Catalog,
                          name: str) -> dict:
    """``START REFRESH STREAM ON VIEW v [CASCADE]`` — continuous
    maintenance: one streaming query tails the view composition's
    BASE-table manifest logs and cascades a refresh bottom-up per
    micro-batch (streaming/sink.start_view_cascade_refresh_stream).
    The stream always cascades — it wakes on base-leaf commits, so
    every intermediate registered view on the path refreshes in
    order; the optional CASCADE keyword documents that. Checkpoints
    live under ``<catalog root>/.streams/<view>`` so a restarted
    process resumes the tail instead of reprocessing."""
    e = catalog.get(name)
    if e["kind"] == "table":
        raise SqlError(f"{name} is a base table — refresh streams "
                       f"maintain views")
    key = _stream_key(catalog, name)
    old = _STREAMS.get(key)
    if old is not None and old.isActive:
        raise SqlError(f"a refresh stream on {name} is already "
                       f"running in this process — STOP REFRESH "
                       f"STREAM ON VIEW {name} first")
    from .streaming import sink

    ckpt = os.path.join(catalog.root, ".streams", name.lower())
    q = sink.start_view_cascade_refresh_stream(
        spark, e["path"], checkpoint_dir=ckpt,
        transforms=_mv_transforms(catalog))
    _STREAMS[key] = q
    return {"status": "stream_started", "name": name,
            "stream_id": str(q.id)}


def _stop_refresh_stream(catalog: Catalog, name: str) -> dict:
    catalog.get(name)  # unknown names error the same way everywhere
    q = _STREAMS.pop(_stream_key(catalog, name), None)
    if q is None:
        raise SqlError(f"no refresh stream on {name} was started in "
                       f"this process")
    q.stop()
    return {"status": "stream_stopped", "name": name}


def _stream_liveness(catalog: Catalog, name: str) -> dict:
    q = _STREAMS.get(_stream_key(catalog, name))
    if q is None:
        return {"live": False, "stream_id": None}
    return {"live": bool(q.isActive), "stream_id": str(q.id)}


def _writable_table(catalog: Catalog, name: str, verb: str) -> dict:
    """DML targets must be BASE tables: a maintained view's state is
    owned by its refresher — an INSERT/DELETE behind the cursor's back
    would silently diverge the view from its declared SQL forever."""
    e = catalog.get(name)
    if e["kind"] != "table":
        raise SqlError(
            f"{verb} targets a base table; {name} is a materialized "
            f"view ({e['kind']}) — mutate its SOURCES and run REFRESH "
            f"MATERIALIZED VIEW {name}")
    return e


def _insert(spark: SparkSession, catalog: Catalog, name: str,
            body: str, overwrite: bool = False) -> dict:
    """INSERT INTO = O(batch) append commit; INSERT OVERWRITE = one
    full-replace commit (versioned.overwrite — the full-reload path,
    old versions stay readable until VACUUM, RESTORE undoes it)."""
    df = _run_select(spark, body, catalog)
    verb = "INSERT OVERWRITE" if overwrite else "INSERT INTO"
    e = _writable_table(catalog, name, verb)
    target = _read_entry(spark, e).schema
    if len(df.columns) != len(target):
        raise SqlError(
            f"{verb} column count {len(df.columns)} != table "
            f"{name}'s {len(target)}")
    # positional alignment (SQL INSERT semantics): VALUES yields
    # col1/col2/... — rename+cast to the target schema
    df = df.select(*[
        F.col(c).cast(f.dataType).alias(f.name)
        for c, f in zip(df.columns, target.fields)])
    if overwrite:
        ver = V.overwrite(spark, e["path"], df)
        return {"status": "overwritten", "name": name, "version": ver}
    ver = V.append(spark, e["path"], df)
    return {"status": "inserted", "name": name, "version": ver}


def _delete(spark: SparkSession, catalog: Catalog, name: str,
            pred: str) -> dict:
    e = _writable_table(catalog, name, "DELETE FROM")
    key = e["meta"].get("key")
    if not key:
        raise SqlError(
            f"DELETE needs table {name}'s row-identity column — "
            f"recreate it with OPTIONS (key='id')")
    keys = _read_entry(spark, e).where(pred).select(key)
    ver = V.delete_rows(spark, e["path"], keys, key)
    return {"status": "deleted", "name": name, "version": ver}


def _split_top_level(text: str, fm: str, sep: str) -> list[str]:
    """Split ``text`` on ``sep`` occurrences that are OUTSIDE parens,
    string literals, and comments — positions judged against the
    length-preserving full mask ``fm``."""
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(fm):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return parts


def _update(spark: SparkSession, catalog: Catalog, name: str,
            set_clause: str, pred: str) -> dict:
    """``UPDATE t SET col = expr [, ...] WHERE pred`` via ONE
    delete-vector + append commit (versioned.delete_and_append): the
    matched rows' keys go into a delete vector scoped to the parent's
    segments and their updated images are appended — zero rewrite of
    untouched data, so cost is O(matched), not O(table). Assignment
    RHSs see the OLD row (single projection), standard SQL UPDATE
    semantics; the row-identity column itself may not be assigned."""
    e = _writable_table(catalog, name, "UPDATE")
    key = e["meta"].get("key")
    if not key:
        raise SqlError(
            f"UPDATE needs table {name}'s row-identity column — "
            f"recreate it with OPTIONS (key='id')")
    ver0 = V.current_version(e["path"])
    df = _read_entry(spark, e, version=ver0)
    by_lower = {c.lower(): c for c in df.columns}
    assigned: dict[str, str] = {}
    for piece in _split_top_level(set_clause, _mask(set_clause), ","):
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$",
                     piece, re.DOTALL)
        if not m:
            raise SqlError(f"bad SET assignment: {piece.strip()!r} "
                           f"(want col = <expr>)")
        col = by_lower.get(m.group(1).lower())
        if col is None:
            raise SqlError(f"UPDATE {name}: no column {m.group(1)!r} "
                           f"(columns: {df.columns})")
        if col.lower() == key.lower():
            raise SqlError(
                f"UPDATE may not assign the row-identity column "
                f"{key!r} — DELETE + INSERT to change identity")
        if col in assigned:
            raise SqlError(f"column {col!r} assigned twice")
        assigned[col] = m.group(2)
    updated = _update_plan(df, assigned, pred)
    ver = V.delete_and_append(spark, e["path"], updated.select(key),
                              key, updated, parent_version=ver0)
    return {"status": "updated", "name": name, "version": ver}


def _update_plan(df: DataFrame, assigned: dict, pred: str) -> DataFrame:
    """The UPDATE statement's row-image plan: filter + one projection
    where every assignment RHS sees the OLD row and is cast back to
    the column's declared type. Shared with tools/explain_audit.py so
    the audited keys-job plan IS the shipped plan, not a replica that
    can drift."""
    types = {f.name: f.dataType for f in df.schema.fields}
    return df.where(pred).select(*[
        (F.expr(assigned[c]).cast(types[c]) if c in assigned
         else F.col(c)).alias(c)
        for c in df.columns])


def _find_top_level_kw(fm: str, kw: str, start: int) -> re.Match | None:
    """First occurrence of keyword ``kw`` at paren depth 0, judged
    against the length-preserving full mask ``fm`` (literals/comments
    blanked, so counting parens on the mask is sound) — a USING
    subquery's inner ``ON``/``WHEN`` (JOIN ... ON, CASE WHEN) must
    not split the MERGE statement."""
    for m in re.finditer(rf"\b{kw}\b", fm[start:], re.IGNORECASE):
        upto = fm[start:start + m.start()]
        if upto.count("(") == upto.count(")"):
            return m
    return None


_MERGE_SYNTAX = (
    "MERGE INTO t [AS a] USING <table | (SELECT ...)> [AS b] "
    "ON t.k = s.k "
    "WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET col = expr, ... "
    "| WHEN MATCHED [AND <cond>] THEN DELETE "
    "| WHEN NOT MATCHED [AND <cond>] THEN INSERT * "
    "| INSERT (cols) VALUES (exprs)")

_MERGE_ACT = "__merge_action__"


def _matching_paren(fm: str, open_idx: int) -> int:
    """Index of the close paren matching ``fm[open_idx] == '('`` —
    judged on the length-preserving mask, so parens in literals don't
    count."""
    depth = 0
    for i in range(open_idx, len(fm)):
        if fm[i] == "(":
            depth += 1
        elif fm[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise SqlError("unbalanced parentheses")


def _parse_merge_source(src_text: str) -> tuple[str, str | None]:
    """``USING <table | (SELECT ...)> [AS] [alias]`` → (select_sql,
    alias_or_None)."""
    sm = _mask(src_text)
    alias_re = r"(?:\s+(?:as\s+)?([A-Za-z_][A-Za-z0-9_]*))?\s*$"
    if src_text.startswith("("):
        close = _matching_paren(sm, 0)
        am = re.match(alias_re, sm[close + 1:], re.IGNORECASE)
        if am is None or sm[close + 1:][am.end():].strip():
            raise SqlError(f"MERGE USING (SELECT ...) takes at most "
                           f"one trailing alias, got: "
                           f"{src_text[close + 1:].strip()!r}")
        alias = (src_text[close + 1:][am.start(1):am.end(1)]
                 if am.group(1) else None)
        return src_text[1:close], alias
    tm = re.match(rf"([A-Za-z_][A-Za-z0-9_]*){alias_re}", sm,
                  re.IGNORECASE)
    if not tm:
        raise SqlError(f"MERGE USING wants a table name or "
                       f"(SELECT ...), got: {src_text!r}")
    tbl = src_text[tm.start(1):tm.end(1)]
    alias = (src_text[tm.start(2):tm.end(2)] if tm.group(2) else tbl)
    return f"SELECT * FROM {tbl}", alias


def _parse_merge_clauses(rest: str) -> tuple[list, list]:
    """Split the ``WHEN ...`` tail into ordered clause lists
    ``(matched, not_matched)``; each entry is ``(cond_sql_or_None,
    action, payload)`` where action ∈ {update_star, update, delete,
    insert_star, insert} and payload carries SET assignments /
    INSERT column-value pairs. First-match-wins evaluation order is
    the list order, so only the LAST clause of each group may omit
    its condition (an earlier unconditional clause would make the
    rest unreachable — rejected, not silently dead)."""
    fmr = _mask(rest)
    starts, pos = [], 0
    while True:
        mm = _find_top_level_kw(fmr, "when", pos)
        if mm is None:
            break
        starts.append(pos + mm.start())
        pos = pos + mm.end()
    if not starts or rest[:starts[0]].strip():
        raise SqlError(_MERGE_SYNTAX)
    matched, not_matched = [], []
    for i, st in enumerate(starts):
        en = starts[i + 1] if i + 1 < len(starts) else len(rest)
        seg, segm = rest[st:en], fmr[st:en]
        hm = re.match(r"when\s+(not\s+)?matched\b", segm, re.IGNORECASE)
        if not hm:
            raise SqlError(f"bad WHEN clause: {seg.strip()!r} — "
                           f"{_MERGE_SYNTAX}")
        is_matched = not hm.group(1)
        tm = _find_top_level_kw(segm, "then", hm.end())
        if tm is None:
            raise SqlError(f"WHEN clause needs THEN: {seg.strip()!r}")
        between = seg[hm.end():hm.end() + tm.start()]
        cond = None
        if between.strip():
            am = re.match(r"\s*and\b", segm[hm.end():hm.end()
                                            + tm.start()],
                          re.IGNORECASE)
            if not am:
                raise SqlError(
                    f"expected AND <condition> or THEN after "
                    f"MATCHED, got: {between.strip()!r}")
            cond = between[am.end():].strip()
            if not cond:
                raise SqlError("empty condition after WHEN ... AND")
        action = seg[hm.end() + tm.end():].strip()
        parsed = _parse_merge_action(action, is_matched)
        (matched if is_matched else not_matched).append(
            (cond, *parsed))
    for grp, label in ((matched, "MATCHED"),
                       (not_matched, "NOT MATCHED")):
        for c in grp[:-1]:
            if c[0] is None:
                raise SqlError(
                    f"only the LAST WHEN {label} clause may omit "
                    f"AND <condition> — an unconditional clause "
                    f"makes the later {label} clauses unreachable")
    return matched, not_matched


def _parse_merge_action(action: str, is_matched: bool) -> tuple:
    """One clause's THEN body → (action, payload)."""
    am = _mask(action)
    if is_matched:
        if re.fullmatch(r"delete\s*", am, re.IGNORECASE):
            return ("delete", None)
        um = re.match(r"update\s+set\b", am, re.IGNORECASE)
        if not um:
            raise SqlError(
                f"WHEN MATCHED THEN takes UPDATE SET ... or DELETE, "
                f"got: {action!r}")
        body = action[um.end():].strip()
        if body == "*":
            return ("update_star", None)
        if not body:
            raise SqlError("UPDATE SET needs * or col = expr, ...")
        assigns = []
        for piece in _split_top_level(body, _mask(body), ","):
            pm = re.match(
                r"\s*(?:([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*)?"
                r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$",
                piece, re.DOTALL)
            if not pm:
                raise SqlError(f"bad SET assignment: "
                               f"{piece.strip()!r} (want [t.]col "
                               f"= <expr>)")
            assigns.append((pm.group(1), pm.group(2), pm.group(3)))
        return ("update", assigns)
    if re.fullmatch(r"insert\s*\*\s*", am, re.IGNORECASE):
        return ("insert_star", None)
    im = re.match(r"insert\s*\(", am, re.IGNORECASE)
    if not im:
        raise SqlError(
            f"WHEN NOT MATCHED THEN takes INSERT * or INSERT (cols) "
            f"VALUES (exprs), got: {action!r}")
    copen = am.index("(", im.start())
    cclose = _matching_paren(am, copen)
    cols = [c.strip() for c in action[copen + 1:cclose].split(",")]
    if not all(re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c)
               for c in cols):
        raise SqlError(f"INSERT column list must be plain "
                       f"identifiers, got: "
                       f"{action[copen + 1:cclose].strip()!r}")
    vm = re.match(r"\s*values\s*\(", am[cclose + 1:], re.IGNORECASE)
    if not vm:
        raise SqlError("INSERT (cols) needs VALUES (exprs)")
    vopen = cclose + 1 + vm.end() - 1
    vclose = _matching_paren(am, vopen)
    if am[vclose + 1:].strip():
        raise SqlError(f"trailing tokens after INSERT VALUES: "
                       f"{action[vclose + 1:].strip()!r}")
    vbody = action[vopen + 1:vclose]
    vals = [v.strip()
            for v in _split_top_level(vbody, _mask(vbody), ",")]
    if len(vals) != len(cols) or any(not v for v in vals):
        raise SqlError(
            f"INSERT column list ({len(cols)}) and VALUES "
            f"({len(vals)}) must pair up, every value non-empty")
    return ("insert", list(zip(cols, vals)))


def _merge(spark: SparkSession, catalog: Catalog, text: str) -> dict:
    """``MERGE INTO t USING src ON t.k = s.k WHEN ... THEN ...`` with
    the Delta MERGE clause surface: ``WHEN MATCHED [AND <cond>] THEN
    UPDATE SET * | SET col = expr, ...``, ``WHEN MATCHED [AND <cond>]
    THEN DELETE``, ``WHEN NOT MATCHED [AND <cond>] THEN INSERT * |
    INSERT (cols) VALUES (exprs)`` — the CDC-apply statement shape the
    reference's upsert loop (index_wikimedia.py:86-103) grows into at
    scale. Clauses evaluate in statement order, first match wins; a
    matched row that satisfies no clause is untouched. Conditions and
    expressions may qualify columns by the target/source names or
    their declared aliases. The ON column must be the table's
    DECLARED row-identity key: merging on a non-unique column would
    collapse every matched target row into one source row, and the
    delete vector must stay single-keyed.

    Scale shape: the unconditional SET */INSERT * full-upsert form
    needs NO target read at all — every source key goes into one
    delete vector and every source row into one appended segment
    (versioned.delete_and_append), so it costs O(source) against a
    100 TB table. The conditional/clause forms add ONE inner (or
    anti) join of the source against the target, column-pruned to the
    key plus whatever columns the conditions and assignments actually
    read (a matched-DELETE-only MERGE scans just the key column —
    plan-asserted), and the output stays O(matched + inserted): one
    delete-vector + append commit, never a table rewrite. NULL-keyed
    source rows never match (SQL NULL equality), so they fall to the
    WHEN NOT MATCHED clauses and are ignored by a matched-only
    MERGE."""
    fm = _mask(text)
    m = re.match(
        r"merge\s+into\s+([A-Za-z_][A-Za-z0-9_]*)"
        r"(?:\s+(?:as\s+)?(?!using\b)([A-Za-z_][A-Za-z0-9_]*))?"
        r"\s+using\s+", fm,
        re.IGNORECASE)
    if not m:
        raise SqlError(_MERGE_SYNTAX)
    name = text[m.start(1):m.end(1)]
    t_alias = text[m.start(2):m.end(2)] if m.group(2) else name
    on_m = _find_top_level_kw(fm, "on", m.end())
    when_m = _find_top_level_kw(fm, "when", m.end())
    if not on_m or not when_m or when_m.start() < on_m.start():
        raise SqlError("MERGE needs USING <src> ON <cond> WHEN ...")
    src_text = text[m.end():m.end() + on_m.start()].strip()
    on_text = text[m.end() + on_m.end():m.end() + when_m.start()].strip()
    rest = text[m.end() + when_m.start():]

    qi = r"(?:[A-Za-z_][A-Za-z0-9_]*\.)?([A-Za-z_][A-Za-z0-9_]*)"
    on_eq = re.match(rf"{qi}\s*=\s*{qi}\s*$", on_text)
    if not on_eq or on_eq.group(1).lower() != on_eq.group(2).lower():
        raise SqlError(
            f"MERGE ON must be a single same-named column equality "
            f"(t.k = s.k), got: {on_text!r}")
    on_key = on_eq.group(1)
    matched, not_matched = _parse_merge_clauses(rest)

    e = _writable_table(catalog, name, "MERGE INTO")
    decl_key = e["meta"].get("key")
    if not decl_key:
        raise SqlError(
            f"MERGE needs table {name}'s row-identity column — "
            f"recreate it with OPTIONS (key='id')")
    if on_key.lower() != decl_key.lower():
        raise SqlError(
            f"MERGE ON must use {name}'s declared row-identity "
            f"column {decl_key!r} (got {on_key!r}) — merging on a "
            f"non-unique column would collapse matched rows")
    src_sql, s_alias = _parse_merge_source(src_text)
    src = _run_select(spark, src_sql, catalog)

    ver0 = V.current_version(e["path"])
    target = _read_entry(spark, e, version=ver0)
    t_by_lower = {c.lower(): c for c in target.columns}
    key = t_by_lower.get(on_key.lower())
    if key is None:
        raise SqlError(f"MERGE ON column {on_key!r} not in {name}'s "
                       f"columns {target.columns}")

    star_upsert = (
        [c[:2] for c in matched] in ([], [(None, "update_star")])
        and [c[:2] for c in not_matched] in ([], [(None,
                                                   "insert_star")]))
    if not star_upsert:
        return _merge_general(spark, e, name, target, src, key,
                              t_alias, s_alias, matched, not_matched,
                              ver0)

    # ---- unconditional SET * / INSERT * fast paths (O(source)) ----
    s_by_lower = {c.lower(): c for c in src.columns}
    if set(t_by_lower) != set(s_by_lower):
        raise SqlError(
            f"MERGE SET */INSERT * needs matching column sets: "
            f"target {sorted(t_by_lower)} vs source "
            f"{sorted(s_by_lower)}")
    types = {f.name: f.dataType for f in target.schema.fields}
    src = src.select(*[
        F.col(s_by_lower[c.lower()]).cast(types[c]).alias(c)
        for c in target.columns]).persist()
    try:
        _merge_dup_key_check(src, key)
        if matched and not_matched:
            batch = src  # full upsert: no target read needed
        elif matched:
            batch = src.join(target.select(key).distinct(), [key],
                             "left_semi")
        else:
            batch = src.join(target.select(key).distinct(), [key],
                             "left_anti")
            ver = V.append(spark, e["path"], batch,
                           parent_version=ver0)
            return {"status": "merged", "name": name, "version": ver}
        ver = V.delete_and_append(spark, e["path"], batch.select(key),
                                  key, batch, parent_version=ver0)
        return {"status": "merged", "name": name, "version": ver}
    finally:
        src.unpersist()


def _merge_dup_key_check(src: DataFrame, key: str) -> None:
    # count(col) skips NULLs, so both sides of the one-match check
    # range over NON-NULL keys only: a NULL-keyed source row is legal
    # (it never matches — pure insert), duplicate non-null keys are
    # not
    nn, nk = src.agg(F.count(F.col(key)),
                     F.count_distinct(F.col(key))).first()
    if nn != nk:
        raise SqlError(
            f"MERGE source has duplicate {key!r} values "
            f"({nn} non-null keys, {nk} distinct) — each target "
            f"row may match at most one source row")


def _merge_stage_plans(target: DataFrame, src: DataFrame, key: str,
                       skey: str, t_alias: str, s_alias: str,
                       matched: list, not_matched: list):
    """The clause engine's DataFrame plans, shared with
    tools/explain_audit.py (the audited matched-DELETE keys job IS
    the shipped plan). Returns ``(del_keys, appends)`` — ``del_keys``
    is None when there are no matched clauses, ``appends`` None when
    nothing inserts/updates. Matched rows walk the clause list in
    order; the first true condition assigns the row to that clause
    (F.when chain — exactly first-match-wins); rows satisfying no
    clause are untouched. The delete-vector keys come off the SOURCE
    side of the join so a matched-DELETE whose condition reads only
    source columns prunes the target scan to the key column alone."""
    t_cols = target.columns
    types = {f.name: f.dataType for f in target.schema.fields}
    s_by_lower = {c.lower(): c for c in src.columns}
    for side, cols in (("target", t_cols), ("source", src.columns)):
        if _MERGE_ACT in cols:
            raise SqlError(f"MERGE {side} may not have a column "
                           f"named {_MERGE_ACT}")

    def _act_chain(df: DataFrame, clauses: list) -> DataFrame:
        acts = None
        for i, (cond, _a, _p) in enumerate(clauses):
            c = F.expr(cond) if cond else F.lit(True)
            acts = (F.when(c, F.lit(i)) if acts is None
                    else acts.when(c, F.lit(i)))
        return (df.withColumn(_MERGE_ACT, acts)
                .where(F.col(_MERGE_ACT).isNotNull()))

    def _resolve_assigns(assigns: list) -> dict:
        out: dict = {}
        for qual, col_raw, expr in assigns:
            if qual is not None and qual.lower() != t_alias.lower():
                raise SqlError(
                    f"SET {qual}.{col_raw}: assignments target "
                    f"{t_alias!r}'s columns (qualify with the "
                    f"target name/alias or not at all)")
            col = next((c for c in t_cols
                        if c.lower() == col_raw.lower()), None)
            if col is None:
                raise SqlError(f"SET {col_raw}: no such target "
                               f"column (columns: {t_cols})")
            if col.lower() == key.lower():
                raise SqlError(
                    f"MERGE may not assign the row-identity column "
                    f"{key!r} — DELETE + INSERT to change identity")
            if col in out:
                raise SqlError(f"column {col!r} assigned twice")
            out[col] = expr
        return out

    def _star_image(rows: DataFrame, what: str) -> DataFrame:
        missing = [c for c in t_cols if c.lower() not in s_by_lower]
        if missing:
            raise SqlError(
                f"{what} needs every target column in the source; "
                f"missing: {missing}")
        return rows.select(*[
            F.expr(f"{s_alias}.{s_by_lower[c.lower()]}")
            .cast(types[c]).alias(c) for c in t_cols])

    ta, sa = target.alias(t_alias), src.alias(s_alias)
    key_eq = F.expr(f"{t_alias}.{key} = {s_alias}.{skey}")
    del_keys, appends = None, []
    if matched:
        trig = _act_chain(sa.join(ta, key_eq, "inner"), matched)
        del_keys = trig.select(
            F.expr(f"{s_alias}.{skey}").cast(types[key]).alias(key))
        for i, (_cond, act, payload) in enumerate(matched):
            if act == "delete":
                continue
            rows = trig.where(F.col(_MERGE_ACT) == i)
            if act == "update_star":
                appends.append(_star_image(rows, "UPDATE SET *"))
                continue
            assigns = _resolve_assigns(payload)
            appends.append(rows.select(*[
                (F.expr(assigns[c]).cast(types[c]) if c in assigns
                 else F.expr(f"{t_alias}.{c}")).alias(c)
                for c in t_cols]))
    if not_matched:
        anti = sa.join(ta, key_eq, "left_anti")
        trig = _act_chain(anti, not_matched)
        for i, (_cond, act, payload) in enumerate(not_matched):
            rows = trig.where(F.col(_MERGE_ACT) == i)
            if act == "insert_star":
                appends.append(_star_image(rows, "INSERT *"))
                continue
            vals: dict = {}
            for col_raw, expr in payload:
                col = next((c for c in t_cols
                            if c.lower() == col_raw.lower()), None)
                if col is None:
                    raise SqlError(f"INSERT ({col_raw}): no such "
                                   f"target column (columns: "
                                   f"{t_cols})")
                if col in vals:
                    raise SqlError(f"column {col!r} inserted twice")
                vals[col] = expr
            appends.append(rows.select(*[
                (F.expr(vals[c]) if c in vals else F.lit(None))
                .cast(types[c]).alias(c) for c in t_cols]))
    batch = None
    for img in appends:
        batch = img if batch is None else batch.unionByName(img)
    return del_keys, batch


def _merge_general(spark: SparkSession, e: dict, name: str,
                   target: DataFrame, src: DataFrame, key: str,
                   t_alias: str, s_alias: str | None, matched: list,
                   not_matched: list, ver0: int) -> dict:
    """The conditional/clause MERGE engine: ONE inner join (matched
    clauses) + ONE anti join (not-matched clauses) of the source
    against the target — both column-pruned by Catalyst to the key
    plus the columns the conditions/assignments read — and ONE
    delete-vector + append commit sized O(matched + inserted)."""
    if s_alias is None:
        raise SqlError(
            "conditional MERGE clauses reference source columns — "
            "alias the source: USING (SELECT ...) AS s")
    if s_alias.lower() == t_alias.lower():
        raise SqlError(f"MERGE target and source aliases must "
                       f"differ (both {s_alias!r})")
    s_by_lower = {c.lower(): c for c in src.columns}
    skey = s_by_lower.get(key.lower())
    if skey is None:
        raise SqlError(f"MERGE ON column {key!r} not in the "
                       f"source's columns {src.columns}")
    src = src.persist()
    try:
        _merge_dup_key_check(src, skey)
        del_keys, batch = _merge_stage_plans(
            target, src, key, skey, t_alias, s_alias, matched,
            not_matched)
        if del_keys is None:
            ver = V.append(spark, e["path"], batch,
                           parent_version=ver0)
        elif batch is None:
            ver = V.delete_rows(spark, e["path"], del_keys, key,
                                parent_version=ver0)
        else:
            ver = V.delete_and_append(spark, e["path"], del_keys,
                                      key, batch,
                                      parent_version=ver0)
        return {"status": "merged", "name": name, "version": ver}
    finally:
        src.unpersist()


# ---------------------------------------------------------------------------
# statement dispatch
# ---------------------------------------------------------------------------


def _strip_statement(statement: str) -> str:
    """Strip surrounding whitespace, leading/trailing comment
    annotations, and trailing top-level semicolons — iterated so
    ``stmt; -- note`` reduces to ``stmt``. Bounds come from a
    COMMENT-only mask (string literals must survive the strip — the
    full mask would chop a statement ending in a literal); whether a
    trailing ``;`` is top-level comes from the full mask (a ``;``
    inside a literal is never stripped)."""
    cm = _MASK_RE.sub(
        lambda m: (" " * len(m.group(0))
                   if m.group(0).startswith(("--", "/*"))
                   else m.group(0)),
        statement)
    fm = _mask(statement)
    start = len(cm) - len(cm.lstrip())
    end = len(cm.rstrip())
    while end > start and fm[end - 1] == ";":
        end -= 1
        end = len(cm[:end].rstrip())
    return statement[start:end]


def execute_script(spark: SparkSession, script: str, catalog: Catalog
                   ) -> list:
    """Run a multi-statement script (statements separated by top-level
    ``;`` — semicolons inside string literals / comments don't split,
    thanks to the same mask the read path uses). Segments that are
    empty after comment stripping (a trailing ``-- done``, a
    ``/* note */`` between semicolons) are skipped, not errors.
    Returns one result per statement, in order — the .sql-file entry
    point."""
    results = []
    masked = _mask(script)
    last = 0
    for i, ch in enumerate(masked + ";"):
        if ch != ";":
            continue
        stmt = script[last:i]
        last = i + 1
        if _strip_statement(stmt):
            results.append(execute(spark, stmt, catalog))
    return results


def execute(spark: SparkSession, statement: str, catalog: Catalog):
    """Run one statement. Returns a DataFrame for SELECT, a dict (or
    list of dicts) for DDL/metadata statements."""
    text = _strip_statement(statement)
    head_m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", text)
    if not head_m:
        raise SqlError("empty statement")
    head = head_m.group(0).lower()

    # reads delegate to Spark SQL untokenized — the DDL mini-grammar
    # must never reject syntax that Spark accepts
    if head in ("select", "with", "values"):
        return _run_select(spark, text, catalog)

    if head == "explain":
        body = text[len(head_m.group(0)):].strip()
        df = _run_select(spark, body, catalog)
        jvm = spark.sparkContext._jvm
        return {"plan": jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")}

    # statements whose BODY is arbitrary Spark SQL are split by regex
    # (header) + delegation (body) for the same reason
    if head == "insert":
        m = re.match(
            r"insert\s+(into|overwrite)\s+([A-Za-z_][A-Za-z0-9_]*)"
            r"\s+(.+)$",
            text, re.IGNORECASE | re.DOTALL)
        if not m or not m.group(3).lower().lstrip().startswith(
                ("select", "with", "values")):
            raise SqlError("INSERT INTO|OVERWRITE t SELECT ... | "
                           "VALUES ...")
        return _insert(spark, catalog, m.group(2), m.group(3),
                       overwrite=m.group(1).lower() == "overwrite")

    if head == "delete":
        m = re.match(
            r"delete\s+from\s+([A-Za-z_][A-Za-z0-9_]*)\s+where\b\s*(.+)$",
            text, re.IGNORECASE | re.DOTALL)
        if not m:
            raise SqlError("DELETE FROM t WHERE <predicate>")
        return _delete(spark, catalog, m.group(1), m.group(2))

    if head == "update":
        fm = _mask(text)
        m = re.match(r"update\s+([A-Za-z_][A-Za-z0-9_]*)\s+set\b", fm,
                     re.IGNORECASE)
        # WHERE is found on the MASK, so a literal containing the word
        # can't split the statement (no scalar subqueries in SET)
        wm = re.search(r"\bwhere\b", fm, re.IGNORECASE)
        if not m or not wm or wm.start() < m.end():
            raise SqlError(
                "UPDATE t SET col = expr [, ...] WHERE <predicate>")
        return _update(spark, catalog, text[m.start(1):m.end(1)],
                       text[m.end():wm.start()], text[wm.end():])

    if head == "merge":
        return _merge(spark, catalog, text)

    if head == "create" and re.match(r"create\s+table\b", text,
                                     re.IGNORECASE):
        m = re.match(
            r"create\s+table\s+([A-Za-z_][A-Za-z0-9_]*)\s*"
            r"(options\s*\([^)]*\))?\s*as\b\s*(.+)$",
            text, re.IGNORECASE | re.DOTALL)
        if not m:
            raise SqlError("CREATE TABLE name [OPTIONS (...)] AS SELECT")
        name = m.group(1)
        catalog.check_available(name)
        opts = {}
        if m.group(2):
            opts = _parse_options(_Cursor(_tokenize(m.group(2)),
                                          m.group(2)))
        df = _run_select(spark, m.group(3), catalog)
        path = catalog.path_for(name)

        def _mk_table() -> dict:
            ver = V.create(spark, path, df)
            catalog.register(name, path, kind="table",
                             meta={"key": opts.get("key")}
                             if opts.get("key") else {},
                             require_path=True)
            return {"status": "created", "name": name, "path": path,
                    "version": ver}

        return _strand_proof(catalog, [path], _mk_table)

    toks = _tokenize(text)
    cur = _Cursor(toks, text)

    if head == "show":
        cur.take()
        cur.expect_kw("tables")
        return [{"name": n, **{k: catalog.get(n)[k]
                               for k in ("kind", "path")}}
                for n in catalog.names()]

    if head == "describe":
        cur.take()
        if cur.at_kw("history"):
            cur.take()
            return V.history(catalog.get(cur.expect_ident())["path"])
        if cur.at_kw("cascade"):
            cur.take()
            return MV.describe_cascade(
                catalog.get(cur.expect_ident())["path"])
        is_view = False
        if cur.at_kw("materialized"):
            cur.take()
            cur.expect_kw("view")
            is_view = True
        elif cur.at_kw("view"):
            cur.take()
            is_view = True
        name = cur.expect_ident()
        if not cur.done():
            raise SqlError("trailing tokens after DESCRIBE")
        if is_view:
            out = MV.describe_view(catalog.get(name)["path"])
            out["refresh_stream"] = _stream_liveness(catalog, name)
            return out
        # plain DESCRIBE t: the everyday "what is this?" — schema,
        # layout, row/segment counts (manifest-only, zero Spark jobs),
        # plus what the catalog knows (kind, declared key)
        e = catalog.get(name)
        out = V.describe(e["path"])
        out["name"] = name
        out["kind"] = e["kind"]
        if e["meta"].get("key"):
            out["key"] = e["meta"]["key"]
        return out

    if head == "refresh":
        cur.take()
        cur.expect_kw("materialized")
        cur.expect_kw("view")
        name = cur.expect_ident()
        cascade = False
        if cur.at_kw("cascade"):
            cur.take()
            cascade = True
        if not cur.done():
            raise SqlError("trailing tokens after REFRESH")
        e = catalog.get(name)
        path = e["path"]
        transforms = _mv_transforms(catalog)
        if cascade:
            refreshed = MV.refresh_cascade(spark, path,
                                           transforms=transforms)
            return {"status": "refreshed", "name": name,
                    "refreshed_paths": refreshed}
        # a stacked view (COUNT DISTINCT) is a chain — plain REFRESH
        # advances exactly its hidden levels then the top, NEVER other
        # user-registered upstream views (that's what CASCADE is for)
        stack = e["meta"].get("stack") or []
        for p in stack:
            MV.refresh_view(spark, p, transforms=transforms)
        ver = MV.refresh_view(spark, path, transforms=transforms)
        out = {"status": "refreshed", "name": name, "version": ver}
        if stack:
            out["refreshed_paths"] = stack + [path]
        return out

    if head == "create":
        cur.take()
        if cur.at_kw("materialized"):
            cur.take()
            cur.expect_kw("view")
            name = cur.expect_ident()
            if cur.at_kw("using"):
                # non-SQL-expressible maintained kinds declare a USING
                # clause instead of a SELECT body — currently the
                # banded-MinHash near-dup pair table
                cur.take()
                kind = cur.expect_ident().lower()
                opts = _parse_options(cur)
                if not cur.done():
                    raise SqlError("trailing tokens after OPTIONS")
                return _create_using(spark, catalog, name, kind, opts)
            opts = _parse_options(cur)
            cur.expect_kw("as")
            body = text[cur.peek().start:] if not cur.done() else ""
            plan = _parse_mv_body(cur)
            # name validation FIRST so an ordinary duplicate reports
            # "already exists — DROP it first", not an orphan warning
            catalog.check_available(name)
            # only the AGG kind self-wraps via its distinct chain —
            # mirror _create_mv's dispatch exactly (join TABLE plans
            # carry no select items at all: SELECT * shape)
            if plan.kind == "agg" and any(
                    i.kind == "count_distinct"
                    for i in getattr(plan, "items", None) or []):
                # the distinct chain wraps itself (it owns two extra
                # hidden paths) — no outer wrap, no double reap
                return _create_mv(spark, catalog, name, opts, plan,
                                  body)
            return _strand_proof(
                catalog, [catalog.path_for(name)],
                lambda: _create_mv(spark, catalog, name, opts, plan,
                                   body))
        raise SqlError("CREATE supports TABLE ... AS and "
                       "MATERIALIZED VIEW ... AS")

    if head == "drop":
        cur.take()
        want_view = False
        if cur.at_kw("materialized"):
            cur.take()
            cur.expect_kw("view")
            want_view = True
        else:
            cur.expect_kw("table")
        name = cur.expect_ident()
        e = catalog.get(name)
        # the statement form must match the entry's kind: "DROP TABLE
        # v" silently deleting a materialized view's state (or the
        # reverse) is how users lose data to a typo
        if want_view and e["kind"] == "table":
            raise SqlError(f"{name} is a base table — use DROP TABLE")
        if not want_view and e["kind"] != "table":
            raise SqlError(f"{name} is a materialized view "
                           f"({e['kind']}) — use DROP MATERIALIZED "
                           f"VIEW")
        # refuse to drop an object other registered views read: their
        # manifests would point at rmtree'd directories forever
        dependents = _dependents_of(catalog, name, e)
        if dependents:
            raise SqlError(
                f"cannot drop {name}: registered view(s) "
                f"{dependents} read it — DROP them first")
        live = _STREAMS.get(_stream_key(catalog, name))
        if live is not None and live.isActive:
            raise SqlError(
                f"cannot drop {name}: a refresh stream is "
                f"maintaining it — STOP REFRESH STREAM ON VIEW "
                f"{name} first")
        catalog.unregister(name)
        spark.catalog.dropTempView(name)  # no stale reads post-drop
        doomed = _entry_owned_paths(e)
        for d in doomed:
            if os.path.isdir(d):
                shutil.rmtree(d)
        return {"status": "dropped", "name": name}

    if head in ("start", "stop"):
        verb = cur.take().lower
        cur.expect_kw("refresh")
        cur.expect_kw("stream")
        cur.expect_kw("on")
        cur.expect_kw("view")
        name = cur.expect_ident()
        if verb == "start" and cur.at_kw("cascade"):
            cur.take()  # the stream always cascades; keyword is doc
        if not cur.done():
            raise SqlError(f"trailing tokens after "
                           f"{verb.upper()} REFRESH STREAM")
        if verb == "start":
            return _start_refresh_stream(spark, catalog, name)
        return _stop_refresh_stream(catalog, name)

    if head == "alter":
        # ALTER TABLE t ADD COLUMN c <type> — schema evolution via the
        # append path's drift guard: ONE zero-row segment carrying the
        # evolved schema is committed (O(1), no data read or rewritten;
        # OPTIMIZE folds it away later). Old segments read the new
        # column as NULL (mergeSchema), DESCRIBE shows the evolved
        # col_types from the new manifest, and the next INSERT must
        # supply the column positionally like any other.
        cur.take()
        cur.expect_kw("table")
        name = cur.expect_ident()
        cur.expect_kw("add")
        cur.expect_kw("column")
        col = cur.expect_ident()
        if cur.done():
            raise SqlError("ALTER TABLE t ADD COLUMN c <type>")
        type_text = text[cur.peek().start:].strip()
        e = _writable_table(catalog, name, "ALTER TABLE")
        df = _read_entry(spark, e)
        clash = next((c for c in df.columns
                      if c.lower() == col.lower()), None)
        if clash:
            raise SqlError(f"column {clash!r} already exists on "
                           f"{name} (names resolve case-"
                           f"insensitively)")
        try:
            empty = df.limit(0).withColumn(
                col, F.lit(None).cast(type_text))
        except Exception as ex:
            raise SqlError(
                f"bad column type {type_text!r} for ALTER TABLE "
                f"ADD COLUMN: {ex}") from ex
        ver = V.append(spark, e["path"], empty)
        return {"status": "altered", "name": name,
                "added": {col: type_text}, "version": ver}

    if head == "optimize":
        cur.take()
        name = cur.expect_ident()
        e = _writable_table(catalog, name, "OPTIMIZE")
        if cur.at_kw("zorder"):
            cur.take()
            cur.expect_kw("by")
            cur.expect_op("(")
            cols = _ident_list(cur)
            cur.expect_op(")")
            if len(cols) != 2:
                raise SqlError("OPTIMIZE t ZORDER BY (x, y) takes "
                               "exactly two columns (Morton key)")
            if not cur.done():
                raise SqlError("trailing tokens after ZORDER BY (...)")
            ver = V.cluster_zorder(spark, e["path"], cols[0], cols[1])
            return {"status": "optimized", "name": name,
                    "zorder_by": cols, "version": ver}
        if not cur.done():
            raise SqlError("OPTIMIZE t [ZORDER BY (x, y)]")
        ver = V.compact(spark, e["path"])
        return {"status": "optimized", "name": name, "version": ver}

    if head == "restore":
        # metadata-only rollback (Delta RESTORE semantics): a NEW
        # head whose manifest re-points to the old segments — the
        # "oops" recovery for a bad UPDATE/DELETE/MERGE, no data read
        # or copied, audit trail intact
        cur.take()
        cur.expect_kw("table")
        name = cur.expect_ident()
        if cur.at_kw("to"):
            cur.take()
        cur.expect_kw("version")
        cur.expect_kw("as")
        cur.expect_kw("of")
        t = cur.take()
        if t.kind != "num" or "." in t.text:
            raise SqlError("RESTORE TABLE t [TO] VERSION AS OF <int>")
        if not cur.done():
            raise SqlError("trailing tokens after RESTORE")
        e = _writable_table(catalog, name, "RESTORE")
        try:
            ver = V.restore(spark, e["path"], int(t.text))
        except (ValueError, FileNotFoundError) as ex:
            raise SqlError(str(ex)) from ex
        return {"status": "restored", "name": name,
                "restored_to": int(t.text), "version": ver}

    if head == "vacuum":
        cur.take()
        name = cur.expect_ident()
        keep = 1
        if cur.at_kw("keep"):
            cur.take()
            t = cur.take()
            if t.kind != "num" or "." in t.text:
                raise SqlError("VACUUM t KEEP <int>")
            keep = int(t.text)
        e = catalog.get(name)
        views = [catalog.get(n)["path"] for n in catalog.names()
                 if catalog.get(n)["kind"] != "table"]
        deleted = MV.vacuum_source_safely(e["path"], keep_last=keep,
                                          views=views)
        return {"status": "vacuumed", "name": name,
                "deleted_segments": len(deleted)}

    raise SqlError(
        f"unsupported statement head {toks[0].text!r}; supported: "
        "SELECT / WITH / EXPLAIN / CREATE [MATERIALIZED VIEW [USING "
        "near_dup]|TABLE] / REFRESH "
        "MATERIALIZED VIEW / INSERT INTO|OVERWRITE / DELETE FROM / UPDATE / "
        "MERGE INTO / ALTER TABLE ADD COLUMN / START|STOP REFRESH "
        "STREAM ON VIEW / DESCRIBE / SHOW TABLES "
        "/ VACUUM / OPTIMIZE / RESTORE TABLE / DROP")
