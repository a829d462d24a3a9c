"""Empirical backing for the matview O(delta) claim: refreshing an
incremental agg view after a FIXED-SIZE append must cost ~the same no
matter how large the base table is, while a full recompute grows with the
table. Base tables are 1x/4x/8x id-shifted replicas of the sf0.1 events
fixture committed as versioned tables; each gets the same ~2k-row append,
and we time (a) refresh_agg_view (cursor-derived O(new segments) CDC fast
path) vs (b) a from-scratch groupBy of the new head.

Usage: python tools/matview_scale_proof.py [sf_dir] [copies ...]
       (defaults: /root/testdata/sf0.1 and 1 4 8)   ->  one JSON line
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
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]


def main() -> None:
    spark = get_spark(app_name="matview_scale_proof")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    tmp = tempfile.mkdtemp(prefix="matview_proof_")
    results = {}
    try:
        for copies in COPIES:
            base = ev0
            for i in range(1, copies):
                base = base.unionByName(ev0.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)))
            t = os.path.join(tmp, f"t{copies}")
            vw = os.path.join(tmp, f"v{copies}")
            V.create(spark, t, base)
            MV.create_agg_view(spark, t, vw, key="event_id",
                               group_cols=["event_type"],
                               sum_cols=["value_cents"])
            batch = ev0.limit(2000).withColumn(
                "event_id", F.col("event_id") + F.lit(99_000_000_000))
            V.append(spark, t, batch)
            t0 = time.monotonic()
            MV.refresh_agg_view(spark, vw)
            refresh_s = time.monotonic() - t0
            t0 = time.monotonic()
            V.read(spark, t).groupBy("event_type").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("value_cents").alias("sum_value_cents"),
            ).collect()
            recompute_s = time.monotonic() - t0
            m = V._manifest(t, V.current_version(t))
            n_rows = sum(m["seg_rows"].values())  # metadata-only
            # --- the round-8 cost-based dispatcher, both interval shapes.
            # Append-only: the change bound is a subset of the head, so
            # the dispatcher must pick INCREMENTAL at every size. Then a
            # rewriting interval (upsert): the multiset diff scans BOTH
            # snapshots (bound = old+new > head), so the dispatcher must
            # pick RECOMPUTE — and we time both paths to show the pick
            # is the cheaper side.
            v0 = V.current_version(t)
            V.append(spark, t, batch.withColumn(
                "event_id", F.col("event_id") + F.lit(1)))
            app_pick = "recompute" if MV._should_recompute(
                MV._RECOMPUTE_BOUND_FRACTION,
                [(MV._change_bound(t, v0, V.current_version(t)),
                  MV._head_rows(t, V.current_version(t)))]) \
                else "incremental"
            MV.refresh_agg_view(
                spark, vw,
                recompute_fraction=MV._RECOMPUTE_BOUND_FRACTION)
            v1 = V.current_version(t)
            V.upsert(spark, t, batch.limit(500).withColumn(
                "value_cents", F.col("value_cents") + F.lit(1)),
                "event_id")
            rw_pick = "recompute" if MV._should_recompute(
                MV._RECOMPUTE_BOUND_FRACTION,
                [(MV._change_bound(t, v1, V.current_version(t)),
                  MV._head_rows(t, V.current_version(t)))]) \
                else "incremental"
            t0 = time.monotonic()
            MV.refresh_agg_view(spark, vw, recompute_fraction=None)
            rw_incremental_s = time.monotonic() - t0
            # replay the SAME rewrite interval through the dispatcher by
            # restoring the view cursor (fresh view over the pre-upsert
            # base would shift the data; a second identical view is
            # equivalent and cheap at proof scale)
            vw2 = os.path.join(tmp, f"v{copies}_b")
            MV.create_agg_view(spark, t, vw2, key="event_id",
                               group_cols=["event_type"],
                               sum_cols=["value_cents"])
            V.upsert(spark, t, batch.limit(500).withColumn(
                "value_cents", F.col("value_cents") + F.lit(2)),
                "event_id")
            t0 = time.monotonic()
            MV.refresh_agg_view(
                spark, vw2,
                recompute_fraction=MV._RECOMPUTE_BOUND_FRACTION)
            rw_dispatched_s = time.monotonic() - t0
            results[f"x{copies}"] = {
                "refresh_sec": round(refresh_s, 3),
                "full_recompute_sec": round(recompute_s, 3),
                "base_rows": n_rows,
                "append_interval_pick": app_pick,
                "rewrite_interval_pick": rw_pick,
                "rewrite_incremental_sec": round(rw_incremental_s, 3),
                "rewrite_dispatched_sec": round(rw_dispatched_s, 3),
            }
            print(f"x{copies}: refresh {refresh_s:.2f}s vs full recompute "
                  f"{recompute_s:.2f}s | dispatcher: append->{app_pick}, "
                  f"rewrite->{rw_pick} (incremental {rw_incremental_s:.2f}s"
                  f" vs dispatched {rw_dispatched_s:.2f}s)",
                  file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"tool": "matview_scale_proof", "sf_dir": SF_DIR,
                      "append_rows": 2000, "results": results}))


if __name__ == "__main__":
    main()
