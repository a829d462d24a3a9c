"""Empirical backing for the SQL MERGE O(source) claim: a full-upsert
``MERGE INTO t USING src ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
MATCHED THEN INSERT *`` against a FIXED-SIZE source must cost ~the same
no matter how large the target table is — the statement reads NOTHING
from the target (every source key goes into one delete vector, every
source row into one appended segment), while ``versioned.upsert`` (the
rewrite path) reads and rewrites the whole table, growing linearly.

Targets are 1x/4x/8x id-shifted replicas of the sf0.1 events fixture,
registered through the SQL catalog; each gets the same ~2k-row MERGE
(half updated images of existing rows, half brand-new ids). Final-state
equality vs the expected anti-join ∪ source is asserted at every size —
the proof is only meaningful if the zero-read path is exact. The
matched-only flavor (one key-column semi join against the target) is
timed too: it grows only with the column-pruned key scan.

Usage: python tools/merge_scale_proof.py [sf_dir] [copies ...]
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

from rclip_server_spark import sql as S
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
N_SRC = 2000


def main() -> None:
    spark = get_spark(app_name="merge_scale_proof")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    tmp = tempfile.mkdtemp(prefix="merge_proof_")
    cat = S.Catalog(os.path.join(tmp, "cat"))
    results = {}
    try:
        # JVM/stage warm-up so the first measured size isn't inflated
        wpath = os.path.join(tmp, "warm")
        V.create(spark, wpath, ev0.limit(100))
        cat.register("warm", wpath, meta={"key": "event_id"})
        ev0.limit(10).createOrReplaceTempView("warm_src")
        S.execute(spark, "MERGE INTO warm USING warm_src ON "
                         "warm.event_id = warm_src.event_id "
                         "WHEN MATCHED THEN UPDATE SET * "
                         "WHEN NOT MATCHED THEN INSERT *", cat)

        # fixed source: 1k updated images of base ids + 1k new ids
        src = (ev0.orderBy("event_id").limit(N_SRC // 2)
               .withColumn("value_cents", F.col("value_cents") * 10)
               .unionByName(
                   ev0.orderBy("event_id").limit(N_SRC // 2).select(
                       (F.col("event_id")
                        + F.lit(77_000_000_000)).alias("event_id"),
                       "event_type", "value_cents")))
        src.createOrReplaceTempView("merge_proof_src")
        src_keys = {r.event_id for r in src.select("event_id").collect()}

        for copies in COPIES:
            base = ev0
            for i in range(1, copies):
                base = base.unionByName(ev0.withColumn(
                    "event_id",
                    F.col("event_id") + F.lit(i * 1_000_000_000)))
            name = f"tgt{copies}"
            path = os.path.join(tmp, name)
            V.create(spark, path, base)
            cat.register(name, path, meta={"key": "event_id"})
            n_base = V.table_row_count(path)

            t0 = time.monotonic()
            S.execute(spark, f"MERGE INTO {name} USING merge_proof_src "
                             f"ON {name}.event_id = event_id "
                             f"WHEN MATCHED THEN UPDATE SET * "
                             f"WHEN NOT MATCHED THEN INSERT *", cat)
            merge_s = time.monotonic() - t0

            # exactness: final state == target-minus-source-keys ∪ src
            got = V.read(spark, path)
            n_got = got.count()
            assert n_got == n_base + N_SRC // 2, (n_got, n_base)
            lo = got.where(F.col("event_id").isin(list(src_keys)))
            diff = lo.exceptAll(src).count()
            assert diff == 0, f"{diff} merged rows diverge from source"

            # matched-only flavor: one semi join on the pruned key scan
            t0 = time.monotonic()
            S.execute(spark, f"MERGE INTO {name} USING merge_proof_src "
                             f"ON {name}.event_id = event_id "
                             f"WHEN MATCHED THEN UPDATE SET *", cat)
            matched_s = time.monotonic() - t0

            # the rewrite path for contrast: read + anti-join + union,
            # one full-table segment write
            t0 = time.monotonic()
            V.upsert(spark, path, src, "event_id")
            rewrite_s = time.monotonic() - t0

            results[f"x{copies}"] = {
                "target_rows": n_base,
                "merge_full_upsert_sec": round(merge_s, 3),
                "merge_matched_only_sec": round(matched_s, 3),
                "upsert_rewrite_sec": round(rewrite_s, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"proof": "sql_merge_o_source", "sf": SF_DIR,
                      "src_rows": N_SRC, **results}))


if __name__ == "__main__":
    main()
