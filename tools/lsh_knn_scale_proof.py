"""Falsify-or-confirm the lsh_knn_join "fixed stage floor" claim
(VERDICT r5): at sf0.1 scale the operator runs ~3x the DuckDB oracle, with
the gap attributed to local-mode stage floors, not plan shape. This tool
measures the SAME operator and the SAME oracle SQL on 1x / 4x / 8x
replicas of the sf0.1 embeddings (id-shifted distinct copies, both engines
reading identical parquet), under the documented 100 TB sizing discipline
(2^n_planes tracks |right|, so per-left-row candidate volume is constant).

Claim being tested: the Spark/oracle wall-clock ratio falls below 2x once
the data outgrows the fixed floor. One JSON line out; the measured table
is committed to BASELINE.md (§ lsh_knn_join scale proof).

r13 addition: at every scale the proof ALSO times knn_join_via_index —
the same join served from a MAINTAINED bucketed ANN index (same
planes/seed, row-identical output, asserted by count) — and records
indexed vs ad-hoc. The indexed path should never lose: it skips
exactly the per-call full-corpus bucketing pass the ad-hoc operator
pays (the bucket column is precomputed at write time), and its scale
guard plans from the manifest row count instead of a count() job.

Usage: python tools/lsh_knn_scale_proof.py [sf_dir] [copies ...]
       (defaults: /root/testdata/sf0.1 and 1 4 8)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from rclip_server_spark.contract import EMB_DIM, bucket_sql, dot2_sql
from rclip_server_spark.operators import ann
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
K = 5


def oracle_sql(table: str, n_planes: int) -> str:
    planes = ann.hyperplanes(n_planes, EMB_DIM, seed=42)
    masks = [0] + [1 << i for i in range(n_planes)]  # n_probe_bits=1
    masks_sql = ", ".join(str(m) for m in masks)
    return f"""
    WITH l AS (
      SELECT vec_id AS id_a, embedding AS va,
             {bucket_sql('embedding', planes)} AS b0
      FROM {table} WHERE vec_id % 17 = 0),
    lp AS (
      SELECT id_a, va, CAST(xor(b0, m) AS BIGINT) AS bucket
      FROM l CROSS JOIN (SELECT unnest([{masks_sql}]) AS m)),
    r AS (
      SELECT vec_id AS id_b, embedding AS vb,
             {bucket_sql('embedding', planes)} AS bucket
      FROM {table} WHERE vec_id % 17 <> 0),
    c AS (
      SELECT id_a, id_b, {dot2_sql('va', 'vb')} AS cosine
      FROM lp JOIN r USING (bucket)),
    ranked AS (
      SELECT id_a, id_b, cosine,
             row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b)
               AS rnk
      FROM c)
    SELECT count(*) FROM ranked WHERE rnk <= {K}
    """


def main() -> None:
    spark = get_spark(app_name="lsh_knn_scale_proof")
    emb0 = load_table(spark, SF_DIR, "embeddings")
    tmp = tempfile.mkdtemp(prefix="lsh_knn_proof_")
    results = {}

    # one warm-up at tiny size so Spark timings exclude JVM/codegen/python
    # worker spin-up (one-time-per-executor costs, amortized to noise over
    # any real workload — same protocol as bench.py)
    ann.lsh_knn_join(emb0.limit(32), emb0.limit(64), k=2, n_planes=4,
                     dim=EMB_DIM, n_left=32, n_right=64).count()

    try:
        for copies in COPIES:
            rep = emb0
            for i in range(1, copies):
                rep = rep.unionByName(
                    emb0.withColumn(
                        "vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000)
                    )
                )
            path = os.path.join(tmp, f"x{copies}")
            rep.write.mode("overwrite").parquet(path)

            data = spark.read.parquet(path)
            left = data.where(F.col("vec_id") % 17 == 0)
            right = data.where(F.col("vec_id") % 17 != 0)
            n_left = left.count()
            n_right = right.count()
            # sizing discipline: 2^n_planes ∝ |right| (512 buckets over the
            # 2000-row sf0.1 right side -> 9 planes; +log2(copies) beyond)
            n_planes = 9 + round(math.log2(copies))

            spark_secs = []
            for _ in range(2):
                t0 = time.monotonic()
                n_out = ann.lsh_knn_join(
                    left, right, k=K, n_planes=n_planes, n_probe_bits=1,
                    dim=EMB_DIM, n_left=n_left, n_right=n_right,
                ).count()
                spark_secs.append(time.monotonic() - t0)

            # indexed twin: corpus side served from the maintained
            # bucketed ANN index (same planes/seed => row-identical);
            # the build is write-time cost, NOT part of the serving
            # measurement — that asymmetry IS the operator's point
            from rclip_server_spark.sources import annindex as AIX
            from rclip_server_spark.sources import versioned as VT

            src_p = os.path.join(tmp, f"src_x{copies}")
            idx_p = os.path.join(tmp, f"idx_x{copies}")
            VT.create(spark, src_p, right)
            AIX.create_ann_index(spark, src_p, idx_p, key="vec_id",
                                 n_planes=n_planes, dim=EMB_DIM)
            AIX.convert_index_to_bucketed(spark, idx_p, n_buckets=64)
            idx_secs = []
            for _ in range(2):
                t0 = time.monotonic()
                n_idx = AIX.knn_join_via_index(
                    spark, left, idx_p, k=K, n_probe_bits=1,
                    n_left=n_left,
                ).count()
                idx_secs.append(time.monotonic() - t0)
            assert n_idx == n_out, (copies, n_idx, n_out)

            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
            sql = oracle_sql("t", n_planes)
            duck_secs = []
            for _ in range(2):
                t0 = time.monotonic()
                n_duck = con.execute(sql).fetchone()[0]
                duck_secs.append(time.monotonic() - t0)
            con.close()

            assert n_out == n_duck, (copies, n_out, n_duck)
            s, d = min(spark_secs), min(duck_secs)
            si = min(idx_secs)
            results[f"x{copies}"] = {
                "n_left": n_left, "n_right": n_right, "n_planes": n_planes,
                "rows_out": n_out, "spark_sec": round(s, 3),
                "indexed_sec": round(si, 3),
                "indexed_le_adhoc": si <= s,
                "duckdb_sec": round(d, 3),
                "ratio": round(s / d, 2) if d > 0 else None,
                "indexed_ratio": round(si / d, 2) if d > 0 else None,
            }
            print(f"x{copies}: spark {s:.2f}s indexed {si:.2f}s "
                  f"duckdb {d:.2f}s ratio {s / d:.2f} "
                  f"indexed_ratio {si / d:.2f} ({n_out} rows)",
                  file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"tool": "lsh_knn_scale_proof", "sf_dir": SF_DIR,
                      "k": K, "results": results}))


if __name__ == "__main__":
    main()
