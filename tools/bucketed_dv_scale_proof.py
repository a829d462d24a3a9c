"""Empirical backing for the bucketed conditional-DML cost claims
(r11): against a hash-BUCKETED target,

* ``DELETE FROM t WHERE <pred on k>`` with a FIXED-SIZE key set costs
  ~the same at every table size — one bucket-scoped delete vector,
  zero bucket rewrites (the keys job scans only the predicate
  columns);
* a FIXED-SIZE conditional MERGE (``WHEN MATCHED AND ... THEN DELETE
  | UPDATE | INSERT``) likewise: one inner + one anti join pruned to
  key + referenced columns, one vector + per-bucket appends;
* the read AFTER the deletes stays flat too: untouched buckets carry
  no anti-join (vector scoping), so the post-DML full scan tracks
  table size exactly as the pre-DML scan does.

Targets are 1x/4x/8x id-shifted replicas of the sf0.1 events fixture
as ``buckets=64`` SQL tables. Final-state equality is asserted at
every size against set algebra — the proof is only meaningful if the
zero-rewrite path is exact.

Usage: python tools/bucketed_dv_scale_proof.py [sf_dir] [copies ...]
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
N_KEYS = 1000


def main() -> None:
    spark = get_spark(app_name="bucketed_dv_scale_proof")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    tmp = tempfile.mkdtemp(prefix="bdv_proof_")
    cat = S.Catalog(os.path.join(tmp, "cat"))
    results = {}
    try:
        # JVM/stage warm-up so the first measured size isn't inflated
        ev0.limit(200).createOrReplaceTempView("bdv_warm_seed")
        S.execute(spark, "CREATE TABLE warm OPTIONS (key='event_id', "
                         "buckets=8) AS SELECT * FROM bdv_warm_seed",
                  cat)
        S.execute(spark, "DELETE FROM warm WHERE event_id % 2 = 0", cat)
        S.execute(spark, "SELECT count(*) AS n FROM warm", cat).collect()

        # fixed merge source: 500 updated images of ids the DELETE
        # below does NOT touch (so they genuinely match) + 500 new ids
        survivors = (ev0.where(F.col("event_id") > N_KEYS)
                     .orderBy("event_id").limit(N_KEYS // 2))
        src = (survivors
               .withColumn("value_cents", F.col("value_cents") * 3)
               .unionByName(survivors.select(
                   (F.col("event_id")
                    + F.lit(77_000_000_000)).alias("event_id"),
                   "event_type", "value_cents")))
        src.createOrReplaceTempView("bdv_src")

        for copies in COPIES:
            base = ev0
            for i in range(1, copies):
                base = base.unionByName(ev0.withColumn(
                    "event_id",
                    F.col("event_id") + F.lit(i * 1_000_000_000)))
            name = f"bt{copies}"
            base.createOrReplaceTempView(f"{name}_seed")
            S.execute(spark, f"CREATE TABLE {name} OPTIONS "
                             f"(key='event_id', buckets=64) AS "
                             f"SELECT * FROM {name}_seed", cat)
            path = cat.get(name)["path"]
            n_base = V.table_row_count(path)

            # fixed-size DELETE: the first N_KEYS base ids
            t0 = time.monotonic()
            S.execute(spark, f"DELETE FROM {name} WHERE event_id "
                             f"<= {N_KEYS}", cat)
            delete_s = time.monotonic() - t0
            m = V._manifest(path, V.current_version(path))
            assert m["delete_segs"], "vector expected"
            scoped = set(m["delete_scopes"][m["delete_segs"][-1]])
            n_scoped = len(scoped)

            # fixed-size conditional MERGE (D/U/I in one statement)
            t0 = time.monotonic()
            S.execute(spark, (
                f"MERGE INTO {name} t USING bdv_src AS s "
                f"ON t.event_id = s.event_id "
                f"WHEN MATCHED AND s.value_cents > 15000 THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET "
                f"value_cents = s.value_cents "
                f"WHEN NOT MATCHED THEN INSERT *"), cat)
            merge_s = time.monotonic() - t0

            # post-DML full scan: untouched buckets carry no anti-join
            t0 = time.monotonic()
            n_after = S.execute(
                spark, f"SELECT count(*) AS n FROM {name}",
                cat).first().n
            scan_s = time.monotonic() - t0

            # exactness by set algebra over the seed: matched source
            # rows delete (vc > 15000) or replace; the 77B ids insert
            matched = src.where(F.col("event_id") < 77_000_000_000)
            new = src.where(F.col("event_id") >= 77_000_000_000)
            want = (base.where(F.col("event_id") > N_KEYS)
                    .join(src.select("event_id"), "event_id",
                          "left_anti")
                    .unionByName(matched.where(
                        F.col("value_cents") <= 15000))
                    .unionByName(new))
            assert n_after == want.count(), (n_after, copies)

            results[f"x{copies}"] = {
                "target_rows": n_base,
                "delete_1k_keys_sec": round(delete_s, 3),
                "vector_scoped_segments": n_scoped,
                "conditional_merge_sec": round(merge_s, 3),
                "post_dml_scan_sec": round(scan_s, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"proof": "bucketed_conditional_dml", "sf": SF_DIR,
                      "n_keys": N_KEYS, **results}))


if __name__ == "__main__":
    main()
