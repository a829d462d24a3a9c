"""The name -> path registry statements resolve against (one JSON
file next to the tables; cross-process, lock-arbitrated mutations)."""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid

from ._base import _IDENT_RE, _UNREGISTERABLE, SqlError

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
        self._sig: tuple | None = None
        self._load()

    def _load(self) -> None:
        try:
            st = os.stat(self._file)
            with open(self._file) as f:
                self._entries = json.load(f)
            self._sig = (st.st_mtime_ns, st.st_size)
        except OSError:
            # a deleted/reset catalog must not be resurrected from a
            # stale in-memory snapshot by the next mutation's _save
            self._entries = {}
            self._sig = None

    def _refresh(self) -> None:
        """Cross-process read freshness at one ``os.stat`` per call:
        reload only when the file's (mtime_ns, size) signature moved —
        per-name loops over a large catalog stay O(N), not O(N) JSON
        parses (``_save`` goes through os.replace, which updates the
        mtime atomically with the content)."""
        try:
            st = os.stat(self._file)
            sig = (st.st_mtime_ns, st.st_size)
        except OSError:
            self._entries, self._sig = {}, None
            return
        if sig != self._sig:
            self._load()

    def snapshot(self) -> dict[str, dict]:
        """One consistent view of all entries for a statement-scoped
        loop (SHOW TABLES, dependency walks, transform rebuilds):
        per-name get() after names() could see another process's
        concurrent DROP mid-listing and raise on a name it just
        listed. Shallow copy — callers must not mutate entries."""
        self._refresh()
        return dict(self._entries)

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
            # a waiter acquired in the window: two holders exist until
            # one releases — the ownership-checked release below keeps
            # either from deleting the other's lock, and the 30s
            # deadline remains the liveness backstop. Loud, because
            # this triple-interleaving should be vanishingly rare.
            import sys as _sys
            print(f"warning: catalog lock {self._lock} was "
                  f"re-acquired while reaping a stale incarnation; "
                  f"concurrent holders possible until release",
                  file=_sys.stderr)
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
                # OWNERSHIP-CHECKED release: if a reaper's triple-race
                # replaced our incarnation (see _try_reap_stale_lock),
                # a blind remove would delete the NEW holder's lock —
                # remove only while the file still records our pid
                try:
                    with open(self._lock) as f:
                        owner = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    owner = None  # already gone: nothing to release
                if owner == os.getpid():
                    with contextlib.suppress(OSError):
                        os.remove(self._lock)
                elif owner is not None:
                    import sys as _sys
                    print(f"warning: catalog lock {self._lock} "
                          f"changed hands mid-critical-section "
                          f"(now pid {owner}); leaving it in place",
                          file=_sys.stderr)
        finally:
            os.remove(tmp)

    def _save(self) -> None:
        tmp = self._file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self._file)
        try:  # stamp the sig so the next _refresh skips a reparse
            st = os.stat(self._file)
            self._sig = (st.st_mtime_ns, st.st_size)
        except OSError:
            self._sig = None

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
        # refresh from disk (stat-gated) so a long-lived session
        # sees another process's CREATE/DROP — the catalog is
        # advertised as cross-process, and serving the construction-
        # time snapshot would resolve DROPped entries to rmtree'd
        # directories
        self._refresh()
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
        self._refresh()
        clash = next((n for n in self._entries
                      if n.lower() == name.lower()), None)
        if clash:
            raise SqlError(
                f"{name!r} already exists as {clash!r} — DROP it "
                f"first (names resolve case-insensitively)")

    def names(self) -> list[str]:
        self._refresh()  # cross-process visibility, same as get()
        return sorted(self._entries)

    def path_for(self, name: str) -> str:
        """Default storage path for a NEW table created through SQL."""
        return os.path.join(self.root, name)

