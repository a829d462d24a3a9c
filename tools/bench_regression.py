"""Compare a fresh bench.py run against the committed per-query
floor (bench.FLOOR_SEC — round-4 numbers). Protocol: idle machine, best-of-2 (bench.py
already takes the min of two full runs). Exit 1 if any shared query is
slower than floor * (1 + slack).

Usage: python tools/bench_regression.py [slack]   (default slack 0.25 —
timings at sub-second magnitudes swing on GC/JIT luck; the floor rule is
about catching real plan regressions, not 50 ms of jitter)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    slack = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    run = json.loads(line)["queries"]

    from bench import FLOOR_SEC

    bad = []
    for name, floor in FLOOR_SEC.items():
        got = run.get(name)
        # relative slack for real queries PLUS 0.15s absolute grace: on a
        # 0.2s query, GC/JIT jitter alone exceeds any percentage band, and
        # the floor rule exists to catch plan regressions, not scheduler luck
        if got is not None and got > floor * (1 + slack) + 0.15:
            bad.append((name, floor, got))
    print(json.dumps({"queries": run, "floor_violations": [
        {"query": n, "floor_sec": f, "got_sec": g} for n, f, g in bad
    ]}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
