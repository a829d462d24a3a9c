"""Calibrate the cost-dispatch default (matview recompute_fraction):
where does incremental refresh actually stop paying vs recompute?

The dispatcher compares the manifest-derived CDC row bound against
``fraction × head rows``. Two interval shapes matter:

* REWRITING intervals (upsert/delete/overwrite in the interval): the
  multiset diff scans old+new snapshots, so bound ≈ 2 × head — ANY
  fraction in (0, 2) sends them to recompute. The calibration question
  is only whether recompute really is cheaper there (it should be: one
  scan instead of two plus a netting shuffle).
* APPEND-ONLY intervals: bound = appended rows, so the fraction picks
  the ingest size (relative to the table) beyond which a refresh
  recomputes. Incremental reads only the new segments (O(batch));
  recompute scans the head but RESETS view-segment accretion — the
  crossover is where batch-proportional work + merge overhead meets
  head-proportional work.

This tool times both paths on agg views across base sizes (1x/8x/32x
replicas of the sf-dir events fixture) × append fractions (5%/30%/100%
of the base) and one rewriting interval per size, printing a JSON
table. BASELINE.md carries the measured crossover and the default the
five refreshers ship with.

Usage: python tools/fraction_crossover.py [sf_dir] [copies ...]
       (defaults: /root/testdata/sf0.1 and 1 8 32)  ->  one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table
from rclip_server_spark.sources import matview as MV
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 8, 32]
APPEND_FRACS = [0.05, 0.30, 1.00]


def _mk_view(spark, t, vw):
    MV.create_agg_view(spark, t, vw, key="event_id",
                       group_cols=["event_type"],
                       sum_cols=["value_cents"])


def _timed_refresh(spark, vw, fraction):
    t0 = time.monotonic()
    MV.refresh_agg_view(spark, vw, recompute_fraction=fraction)
    return round(time.monotonic() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="fraction_crossover")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    n0 = ev0.count()
    tmp = tempfile.mkdtemp(prefix="frac_xover_")
    results = {}
    try:
        for copies in COPIES:
            base = ev0
            for i in range(1, copies):
                base = base.unionByName(ev0.withColumn(
                    "event_id",
                    F.col("event_id") + F.lit(i * 1_000_000_000)))
            base = base.persist()
            n_base = base.count()
            row = {"base_rows": n_base, "appends": {}}
            for frac in APPEND_FRACS:
                n_batch = int(n_base * frac)
                batch = base.limit(n_batch).withColumn(
                    "event_id",
                    F.col("event_id") + F.lit(77_000_000_000))
                # two identical tables/views: one refreshes
                # incrementally, the twin recomputes the SAME interval
                ts, vws, secs = [], [], []
                for tag, fr in (("inc", None), ("rec", 0.0)):
                    t = os.path.join(tmp, f"t{copies}_{frac}_{tag}")
                    vw = t + "_v"
                    V.create(spark, t, base)
                    _mk_view(spark, t, vw)
                    V.append(spark, t, batch)
                    # fraction 0.0 forces recompute (bound > 0 = frac
                    # × head); None forces pure incremental
                    secs.append(_timed_refresh(spark, vw, fr))
                    ts.append(t)
                    vws.append(vw)
                inc_s, rec_s = secs
                row["appends"][f"{int(frac * 100)}%"] = {
                    "batch_rows": n_batch,
                    "incremental_sec": inc_s,
                    "recompute_sec": rec_s,
                    "winner": "incremental" if inc_s <= rec_s
                    else "recompute",
                }
                for p in ts + vws:
                    shutil.rmtree(p, ignore_errors=True)
            # one rewriting interval per size: upsert 1% of rows
            t = os.path.join(tmp, f"t{copies}_rw")
            V.create(spark, t, base)
            upd = base.limit(max(1, n_base // 100)).withColumn(
                "value_cents", F.col("value_cents") + F.lit(1))
            v1, v2 = t + "_vi", t + "_vr"
            _mk_view(spark, t, v1)
            _mk_view(spark, t, v2)
            V.upsert(spark, t, upd, "event_id")
            inc_s = _timed_refresh(spark, v1, None)
            rec_s = _timed_refresh(spark, v2, 0.0)
            row["rewrite_1pct"] = {
                "incremental_sec": inc_s, "recompute_sec": rec_s,
                "winner": "incremental" if inc_s <= rec_s
                else "recompute",
            }
            base.unpersist()
            results[f"x{copies}"] = row
            print(f"x{copies}: {row}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"tool": "fraction_crossover", "sf_dir": SF_DIR,
                      "results": results}))


if __name__ == "__main__":
    main()
