"""Empirical backing for the join-view O(delta) claim: refreshing an
incremental JOIN view after a FIXED-SIZE append to the left source must
cost ~the same no matter how large the left table is (the delta term is
ΔL ⋈ key-pruned R), while recomputing the join grows with the table.

Left tables are 1x/4x/8x id-shifted replicas of the sf0.1 events fixture
joined on a synthetic user dimension (one row per user_id residue); each
left table gets the same ~2k-row append and we time (a) refresh_join_view
(signed delta rule, CDC fast path, broadcast-semi-pruned right snapshot)
vs (b) a from-scratch join+groupBy of the new heads. Row-count equality
of view vs recompute is asserted at every size — the proof is only
meaningful if the fast path is exact.

Also times the ROW-LEVEL join table flavor (refresh_join_table_view) on
the same bases: its append-only fast path must be flat too (delta pairs
appended, no netting shuffle).

Usage: python tools/join_view_scale_proof.py [sf_dir] [copies ...]
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
from rclip_server_spark.sources import matview as MV
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
N_DIM = 1000  # right-side dimension rows (user_id % N_DIM)


def main() -> None:
    spark = get_spark(app_name="join_view_scale_proof")
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", (F.col("user_id") % N_DIM).alias("uk"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    dim = spark.range(N_DIM).select(
        F.col("id").alias("u_id"), F.col("id").alias("uk"),
        (F.col("id") % 7).cast("string").alias("cohort"))
    tmp = tempfile.mkdtemp(prefix="jv_proof_")
    results = {}
    try:
        for copies in COPIES:
            base = ev0
            for i in range(1, copies):
                base = base.unionByName(ev0.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)))
            lt = os.path.join(tmp, f"l{copies}")
            rt = os.path.join(tmp, f"r{copies}")
            vw = os.path.join(tmp, f"v{copies}")
            V.create(spark, lt, base)
            V.create(spark, rt, dim)
            MV.create_join_view(spark, lt, rt, vw, on="uk",
                                left_key="event_id", right_key="u_id",
                                group_cols=["cohort"],
                                sum_cols=["value_cents"])
            # the row-level flavor shares the SAME source and the same
            # append-only interval (independent cursors, one data copy)
            jt = os.path.join(tmp, f"jt{copies}")
            MV.create_join_table_view(spark, lt, rt, jt, on="uk",
                                      left_key="event_id",
                                      right_key="u_id")
            # LEFT-outer flavor (r8): a HALF-coverage dimension so half
            # the left rows are genuinely null-extended; its refresh
            # adds the anti-semijoin term and must stay flat too
            rth = os.path.join(tmp, f"rh{copies}")
            lv = os.path.join(tmp, f"lv{copies}")
            V.create(spark, rth, dim.where(F.col("u_id") < N_DIM // 2))
            MV.create_join_view(spark, lt, rth, lv, on="uk",
                                left_key="event_id", right_key="u_id",
                                group_cols=["cohort"],
                                sum_cols=["value_cents"], how="left")
            batch = ev0.limit(2000).withColumn(
                "event_id", F.col("event_id") + F.lit(99_000_000_000))
            V.append(spark, lt, batch)
            t0 = time.monotonic()
            MV.refresh_join_view(spark, vw)
            refresh_s = time.monotonic() - t0
            t0 = time.monotonic()
            direct = (
                V.read(spark, lt).join(V.read(spark, rt), "uk")
                .groupBy("cohort").agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("value_cents").alias("sum_value_cents"))
                .collect())
            recompute_s = time.monotonic() - t0
            view = {(r.cohort, r.cnt, r.sum_value_cents) for r in
                    V.read(spark, vw)
                    .select("cohort", "cnt",
                            F.col("sum_value_cents").alias("sum_value_cents"))
                    .collect()}
            want = {(r.cohort, r.cnt, r.sum_value_cents) for r in direct}
            assert view == want, "join view diverged from direct recompute"
            t0 = time.monotonic()
            MV.refresh_join_view(spark, lv)
            left_refresh_s = time.monotonic() - t0
            lview = {(r.cohort, r.cnt, r.sum_value_cents) for r in
                     V.read(spark, lv).select(
                         "cohort", "cnt", "sum_value_cents").collect()}
            lwant = {(r.cohort, r.cnt, r.sum_value_cents) for r in
                     V.read(spark, lt)
                     .join(V.read(spark, rth), "uk", "left")
                     .groupBy("cohort").agg(
                         F.count(F.lit(1)).alias("cnt"),
                         F.sum("value_cents").alias("sum_value_cents"))
                     .collect()}
            assert lview == lwant, "LEFT join view diverged"
            t0 = time.monotonic()
            MV.refresh_join_table_view(spark, jt)
            jt_refresh_s = time.monotonic() - t0
            # the claim under proof: the append-only interval committed
            # a PLAIN APPEND (no netting, no vector) with EXACT content
            m_jt = V._manifest(jt, V.current_version(jt))
            assert m_jt["op"] == "append", m_jt["op"]
            diff = (
                V.read(spark, jt).drop("_pair_key")
                .exceptAll(V.read(spark, lt).join(V.read(spark, rt), "uk"))
                .count())
            assert diff == 0, f"{diff} extra rows in join table"
            n_view = V.table_row_count(jt)
            n_direct = V.read(spark, lt).join(
                V.read(spark, rt), "uk").count()
            assert n_view == n_direct, (n_view, n_direct)
            m = V._manifest(lt, V.current_version(lt))
            results[f"x{copies}"] = {
                "refresh_sec": round(refresh_s, 3),
                "full_recompute_sec": round(recompute_s, 3),
                "left_outer_refresh_sec": round(left_refresh_s, 3),
                "join_table_refresh_sec": round(jt_refresh_s, 3),
                "left_rows": sum(m["seg_rows"].values()),
            }
            print(f"x{copies}: agg refresh {refresh_s:.2f}s vs recompute "
                  f"{recompute_s:.2f}s; LEFT-outer refresh "
                  f"{left_refresh_s:.2f}s; row-level refresh "
                  f"{jt_refresh_s:.2f}s", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"tool": "join_view_scale_proof", "sf_dir": SF_DIR,
                      "append_rows": 2000, "results": results}))


if __name__ == "__main__":
    main()
