"""Empirical backing for the shallow-CLONE cost claims (late r11):

* ``CREATE TABLE c CLONE t`` costs ~the same at every table size —
  the clone commit is one manifest write referencing the source's
  segments by absolute path (seg_rows seeded through, so not even the
  source's parquet footers are re-opened);
* the clone's first read answers from the SOURCE's segments (resolved
  input files identical — zero bytes were copied);
* the source's vacuum with a live clone registered stays
  manifest-sized: it reads the clone's manifests to compute the
  pinned set, never data.

Targets are 1x/4x/8x id-shifted replicas of the sf0.1 events fixture.
Equality is asserted at every size: the clone's rows == the source's
rows at clone time.

Usage: python tools/clone_scale_proof.py [sf_dir] [copies ...]
       (defaults: /root/testdata/sf0.1 and 1 4 8)  ->  one JSON line
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
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]


def main() -> None:
    spark = get_spark(app_name="clone_scale_proof")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    tmp = tempfile.mkdtemp(prefix="clone_proof_")
    results = {}
    try:
        # warm the JVM + write path once
        wsrc = os.path.join(tmp, "warm")
        V.create(spark, wsrc, ev0.limit(500))
        V.clone(wsrc, os.path.join(tmp, "warm_c"))
        V.read(spark, os.path.join(tmp, "warm_c")).count()

        for c in COPIES:
            ev = ev0
            for i in range(1, c):
                ev = ev.unionByName(ev0.withColumn(
                    "event_id", F.col("event_id") + i * 10_000_000))
            src = os.path.join(tmp, f"src{c}")
            V.create(spark, src, ev)
            # a couple of DML commits so the clone carries vectors too
            V.delete_rows(
                spark, src,
                ev.where(F.col("event_id") % 97 == 0)
                  .select("event_id"), "event_id")
            n_src = V.read(spark, src).count()

            dst = os.path.join(tmp, f"cl{c}")
            t0 = time.time()
            V.clone(src, dst)
            t_clone = time.time() - t0
            t0 = time.time()
            n_clone = V.read(spark, dst).count()
            t_read = time.time() - t0
            assert n_clone == n_src, (n_clone, n_src)
            assert set(V.read(spark, dst).inputFiles()) == \
                set(V.read(spark, src).inputFiles())
            # source vacuum with the live clone registered: the pinned
            # set comes from the clone's manifests (manifest-sized)
            t0 = time.time()
            V.vacuum(src, keep_last=1)
            t_vac = time.time() - t0
            assert V.read(spark, dst).count() == n_src
            results[f"{c}x"] = {
                "rows": n_src,
                "clone_sec": round(t_clone, 4),
                "first_read_sec": round(t_read, 3),
                "vacuum_with_clone_sec": round(t_vac, 4),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "clone_scale_proof", "sf_dir": SF_DIR,
                      "results": results}))


if __name__ == "__main__":
    main()
