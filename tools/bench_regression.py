"""Compare a fresh bench.py run against the committed per-query
floor (bench.FLOOR_SEC). Protocol: idle machine, best-of-2 (bench.py
already takes the min of two full runs).

Contention normalization (r9 verdict task 3): the run's
``stage_floor_calib`` row — a fixed, data-independent 2-stage job —
divided by the committed ``bench.CALIB_FLOOR_SEC`` gives the host's
contention factor for THIS run. Each query is judged twice: absolute
(raw seconds vs floor, the historical rule) and normalized
(seconds / contention_factor vs floor). A busy host inflates both the
calib row and the queries together, so absolute violations with clean
normalized numbers read "host contention, not a plan regression" —
the adjudication r6/r8/r9 had to do by hand now lives in the
artifact. The exit code follows the NORMALIZED verdict, PLUS the
calib row's own floor: a regression of shared machinery (session
config, scheduler, shuffle) inflates the calib too and cannot
normalize itself away.

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
    artifact = json.loads(line)
    run = artifact["queries"]

    from bench import CALIB_FLOOR_SEC, FLOOR_SEC

    # r14: bench.py samples the calib row 3x per pass (start/middle/
    # end) and reports the MEDIAN — a single sample misses bursty
    # contention (the BENCH_r13 adjudication); the raw samples travel
    # through for the judge
    calib = run.get("stage_floor_calib")
    calib_samples = artifact.get("calib_samples", [])
    # the gate judges against the calib row's BEST sample — symmetric
    # with every query row's best-of-2. The mid/end-of-pass samples
    # systematically include the engine's own residual state after
    # heavy queries (shuffle cleanup, broadcast GC) that best-of-2
    # query timings get to dodge; judging the median against a floor
    # pinned from best-style measurements would flag a clean host.
    # The median + raw samples still travel through as the bursty-
    # contention evidence (host_dirty below).
    calib_best = min(calib_samples) if calib_samples else calib
    # a contention factor below 1 means this host ran FASTER than the
    # committed calib floor — dividing by it would loosen the absolute
    # rule, so clamp: normalization only ever explains slowness away,
    # never hides a real regression behind a fast calib sample
    k = max(calib_best / CALIB_FLOOR_SEC, 1.0) if calib_best else 1.0

    def _judge(scale: float) -> list:
        bad = []
        for name, floor in FLOOR_SEC.items():
            got = run.get(name)
            # relative slack for real queries PLUS 0.15s absolute
            # grace: on a 0.2s query, GC/JIT jitter alone exceeds any
            # percentage band; the floor rule exists to catch plan
            # regressions, not scheduler luck
            if got is not None and got / scale > floor * (1 + slack) + 0.15:
                bad.append({"query": name, "floor_sec": floor,
                            "got_sec": got,
                            "normalized_sec": round(got / scale, 3)})
        return bad

    absolute = _judge(1.0)
    normalized = _judge(k)
    # a session/scheduler-level regression inflates the calib row
    # itself and would otherwise normalize away — the calib row is
    # held to its OWN committed floor, so a dirty calib fails the run
    # outright (on the protocol's idle machine, calib inflation IS a
    # regression of shared machinery; on a contended host it correctly
    # demands the re-run the protocol already requires)
    calib_bad = (calib_best is not None
                 and calib_best > CALIB_FLOOR_SEC * (1 + slack) + 0.15)
    # second contention signal: the MEDIAN got/floor ratio across all
    # shared queries. Bursty host noise a single 0.5s calib sample
    # misses still shifts the whole distribution; a median well above
    # the calib factor reads "bursty contention (or a uniform global
    # regression — distinguishable: that would NOT move the calib on
    # a quiet host)". Diagnostic only — the exit code stays on the
    # calib-normalized verdict so a genuinely global regression can
    # never normalize itself away.
    ratios = sorted(run[n] / f for n, f in FLOOR_SEC.items()
                    if run.get(n))
    med = ratios[len(ratios) // 2] if ratios else 1.0
    # r14: the explicit "re-run, host dirty" verdict — the whole
    # shared-query distribution sits well above what the calib factor
    # explains, so this capture window is polluted and must not be
    # committed as the round's floor evidence. (Exit code still
    # follows the normalized verdict: a dirty host with clean
    # normalized numbers is a measurement problem, not a regression.)
    host_dirty = med > max(k, 1.0) * 1.15 + 0.05
    print(json.dumps({
        "queries": run,
        "calib_sec": calib,
        "calib_best_sec": calib_best,
        "calib_samples": calib_samples,
        "calib_floor_sec": CALIB_FLOOR_SEC,
        "contention_factor": round(k, 3),
        "median_floor_ratio": round(med, 3),
        "host_dirty": host_dirty,
        "hint": ("re-run, host dirty: median got/floor "
                 f"{round(med, 3)} >> calib factor {round(k, 3)}"
                 if host_dirty else None),
        "calib_violation": calib_bad,
        "floor_violations": absolute,
        "normalized_violations": normalized,
    }))
    return 1 if (normalized or calib_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
