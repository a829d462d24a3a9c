"""Round-14 optimization profiler: per-row wall time + Spark JOB COUNT +
optional sub-phase decomposition for the heaviest bench rows.

Job count matters because at this fixture scale every Spark job carries a
~20-60 ms scheduling/stage floor: a 1.9 s DML row that runs 25 jobs is
bounded by job count, not by data. Usage:

    python tools/opt_profile14.py [row ...]      # default: the heavy set

Prints one line per measured phase: name, seconds, jobs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclip_server_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def job_count(spark) -> int:
    """Monotone job counter: DAGScheduler's nextJobId AtomicInteger."""
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


class prof:
    """with prof(spark, 'name'): ... -> prints wall sec + jobs run."""

    results: list[tuple[str, float, int]] = []

    def __init__(self, spark, name: str):
        self.spark, self.name = spark, name

    def __enter__(self):
        self.j0 = job_count(self.spark)
        self.t0 = time.time()
        self.spark.sparkContext.setJobDescription(self.name)
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        jobs = job_count(self.spark) - self.j0
        self.spark.sparkContext.setJobDescription(None)
        prof.results.append((self.name, dt, jobs))
        print(f"{self.name:45s} {dt:8.3f}s {jobs:4d} jobs", flush=True)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="opt_profile14")
    from rclip_server_spark.contract import _QUERIES, QV_FLAGSHIP
    from rclip_server_spark.operators import ann as ann_ops
    from rclip_server_spark.operators import dedup
    from rclip_server_spark.sources import load_table
    from rclip_server_spark.sources.catalog import table_row_count

    only = set(sys.argv[1:])

    def want(name: str) -> bool:
        return not only or any(name.startswith(o) for o in only)

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_emb = table_row_count(os.path.join(SF_DIR, "embeddings.parquet"))

    # ---------- minhash decomposition ----------
    if want("minhash"):
        from rclip_server_spark.functions import text as TXT
        from rclip_server_spark.functions.hashing import (
            hash32_from_md5,
            hash60_from_md5,
            minhash_params,
            minhash_signature_over_hashed,
        )

        # warm plan shapes once
        dedup.minhash_near_dup(docs.limit(16)).count()

        with prof(spark, "minhash: full (count)"):
            dedup.minhash_near_dup(docs, threshold=0.7).count()
        spark.catalog.clearCache()

        params = minhash_params(32, 42)
        m5 = dedup._spread(docs).select(
            F.col("doc_id").alias("id"),
            F.transform(TXT.char_shingles(F.col("text"), 5), F.md5).alias("m5"),
        )
        with prof(spark, "minhash: md5 pass only"):
            noop(m5)
        hashed = m5.select("id", F.transform("m5", hash32_from_md5).alias("hs"))
        with prof(spark, "minhash: md5+hash32"):
            noop(hashed)
        sig = hashed.select(
            "id", minhash_signature_over_hashed("hs", params).alias("sig"))
        with prof(spark, "minhash: md5+hash32+sig"):
            noop(sig)
        gs = m5.select(
            "id",
            F.array_distinct(F.transform("m5", hash60_from_md5)).alias("gs"))
        with prof(spark, "minhash: md5+gs60"):
            noop(gs)
        with prof(spark, "minhash: full again (count)"):
            dedup.minhash_near_dup(docs, threshold=0.7).count()
        spark.catalog.clearCache()

    if want("simhash"):
        dedup.simhash_groups(docs.limit(16)).count()
        with prof(spark, "simhash: full (count)"):
            dedup.simhash_groups(docs).count()
        from rclip_server_spark.functions import text as TXT
        from rclip_server_spark.functions.hashing import portable_hash32

        hashed = docs.select(
            "doc_id",
            F.transform(TXT.tokens(F.col("text")), portable_hash32).alias("hs"))
        with prof(spark, "simhash: tokens+hash32 only"):
            noop(hashed)

    if want("containment"):
        dedup.containment_pairs(docs.limit(16)).count()
        with prof(spark, "containment: full (count)"):
            dedup.containment_pairs(docs, threshold=0.8).count()

    if want("train_lr"):
        _QUERIES["ml_train_quality_lr"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "train_lr: full"):
            _QUERIES["ml_train_quality_lr"](spark, SF_DIR).count()

    if want("bm25"):
        _QUERIES["text_bm25_topk"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "bm25_topk: full (collect)"):
            _QUERIES["text_bm25_topk"](spark, SF_DIR).collect()

    if want("lsh_knn"):
        ann_ops.lsh_knn_join(emb.limit(32), emb.limit(64), k=2, n_planes=4,
                             n_probe_bits=1, dim=64, n_left=32,
                             n_right=64).count()
        left = emb.where(F.col("vec_id") % 17 == 0)
        with prof(spark, "lsh_knn_join: full (count)"):
            ann_ops.lsh_knn_join(left, emb, k=5, n_planes=9, n_probe_bits=1,
                                 dim=64, n_left=n_emb // 17 + 1,
                                 n_right=n_emb).count()
        with prof(spark, "lsh_knn_join: 2nd run"):
            ann_ops.lsh_knn_join(left, emb, k=5, n_planes=9, n_probe_bits=1,
                                 dim=64, n_left=n_emb // 17 + 1,
                                 n_right=n_emb).count()
        planes = ann_ops.hyperplanes(9, 64, 42)
        r = emb.select(
            "vec_id",
            ann_ops.hyperplane_bucket_col(F.col("embedding"), planes)
            .alias("bucket"))
        with prof(spark, "lsh_knn_join: right buckets only"):
            noop(r)

    if want("semdedup"):
        _QUERIES["dedup_semantic_semdedup"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "semdedup: full (count)"):
            _QUERIES["dedup_semantic_semdedup"](spark, SF_DIR).count()

    if want("hist"):
        _QUERIES["sketch_histogram_quantiles"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "hist_quantiles: full (collect)"):
            _QUERIES["sketch_histogram_quantiles"](spark, SF_DIR).collect()

    if want("funnel"):
        _QUERIES["ev_funnel_counts"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "event_funnel: full (collect)"):
            _QUERIES["ev_funnel_counts"](spark, SF_DIR).collect()

    if want("q1"):
        _QUERIES["rel_q1_pricing_summary"](spark, "/root/testdata/sf0.001").count()
        with prof(spark, "q1_pricing_summary: full"):
            _QUERIES["rel_q1_pricing_summary"](spark, SF_DIR).collect()

    # ---------- lakehouse DML rows ----------
    if want("dml"):
        import shutil as _sh
        import tempfile as _tf

        from rclip_server_spark import sql as SQ
        from rclip_server_spark.sources import matview as MV
        from rclip_server_spark.sources import versioned as VT

        vt_tmp = _tf.mkdtemp(prefix="prof_vt_")
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", F.col("o_custkey").alias("custkey"),
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("price_cents"))
        cust = load_table(spark, SF_DIR, "customer").select(
            "c_custkey", F.col("c_custkey").alias("custkey"), "c_mktsegment")
        _batch_no = iter(range(1, 1000))

        def _fresh_batch():
            return orders.limit(2000).withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.lit(next(_batch_no) * 1_000_000_000))

        with prof(spark, "dml: VT.create(orders)"):
            VT.create(spark, os.path.join(vt_tmp, "ord"), orders)
        jv_l = os.path.join(vt_tmp, "ord")
        jv_r = os.path.join(vt_tmp, "cus")
        jv = os.path.join(vt_tmp, "jv")
        VT.create(spark, jv_r, cust)
        MV.create_join_view(spark, jv_l, jv_r, jv, on="custkey",
                            left_key="o_orderkey", right_key="c_custkey",
                            group_cols=["c_mktsegment"],
                            sum_cols=["price_cents"])
        # warm one cycle
        VT.append(spark, jv_l, _fresh_batch())
        MV.refresh_join_view(spark, jv)
        with prof(spark, "dml: jv append 2k"):
            VT.append(spark, jv_l, _fresh_batch())
        with prof(spark, "dml: jv refresh"):
            MV.refresh_join_view(spark, jv)

        mrgb = os.path.join(vt_tmp, "mrgb")
        VT.create_bucketed(spark, mrgb, orders, key="o_orderkey",
                           n_buckets=16)
        _cat = SQ.Catalog(os.path.join(vt_tmp, "cat"))
        _cat.register("mrgb", mrgb, meta={"key": "o_orderkey"})

        def _dml(tag: int):
            shift = next(_batch_no) * 1_000_000_000
            src = orders.limit(1000).withColumn(
                "price_cents", F.col("price_cents") + tag).unionByName(
                orders.limit(1000).withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(shift)))
            src.createOrReplaceTempView("prof_src")
            SQ.execute(spark, (
                "MERGE INTO mrgb t USING prof_src AS s "
                "ON t.o_orderkey = s.o_orderkey "
                "WHEN MATCHED AND s.price_cents % 97 = 0 THEN DELETE "
                "WHEN MATCHED THEN UPDATE SET price_cents = s.price_cents "
                "WHEN NOT MATCHED THEN INSERT *"), _cat)

        def _merge(tag: int):
            shift = next(_batch_no) * 1_000_000_000
            src = orders.limit(1000).withColumn(
                "price_cents", F.col("price_cents") + tag).unionByName(
                orders.limit(1000).withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(shift)))
            src.createOrReplaceTempView("prof_src2")
            SQ.execute(spark, "MERGE INTO mrgb USING prof_src2 "
                              "ON mrgb.o_orderkey = o_orderkey "
                              "WHEN MATCHED THEN UPDATE SET * "
                              "WHEN NOT MATCHED THEN INSERT *", _cat)

        _merge(1)  # warm
        with prof(spark, "dml: bucketed_merge_2k"):
            _merge(2)
        _dml(3)  # warm
        with prof(spark, "dml: bucketed_conditional_dml_2k"):
            _dml(4)
        _sh.rmtree(vt_tmp, ignore_errors=True)

    print("\nsummary:")
    for name, dt, jobs in prof.results:
        print(f"  {name:45s} {dt:8.3f}s {jobs:4d} jobs")
    spark.stop()


if __name__ == "__main__":
    main()
