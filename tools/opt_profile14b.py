"""Round-14 optimization profiler, part 2: the bench rows opt_profile14.py
does not cover — shard export, SQL full-upsert MERGE, hybrid RRF fusion,
join-TABLE refresh, session windows, indexed bm25, weighted fixed-k,
text-quality stats, as-of view, weighted mixture, broadcast-agg join.

Usage: python tools/opt_profile14b.py [prefix ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclip_server_spark.session import get_spark
from tools.opt_profile14 import noop, prof

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="opt_profile14b")
    only = set(sys.argv[1:])

    def want(name: str) -> bool:
        return not only or any(name.startswith(o) for o in only)

    import shutil as _sh
    import tempfile as _tf

    from rclip_server_spark.contract import _QUERIES, QV_FLAGSHIP
    from rclip_server_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    if want("export"):
        from rclip_server_spark.operators import sampling as SAMP

        SAMP.export_training_shards(
            docs.limit(64).select("doc_id", "text"), "doc_id", 2,
            _tf.mkdtemp(prefix="prof_shards_warm_"), overwrite=True)
        for i in range(2):
            out = _tf.mkdtemp(prefix="prof_shards_")
            with prof(spark, f"export_shards_docs #{i}"):
                SAMP.export_training_shards(
                    docs.select("doc_id", "text"), "doc_id", 8, out,
                    overwrite=True)
            _sh.rmtree(out, ignore_errors=True)

    if want("merge") or want("hybrid") or want("jt") or want("bm25i"):
        from rclip_server_spark import sql as SQ
        from rclip_server_spark.sources import matview as MV
        from rclip_server_spark.sources import versioned as VT

        vt_tmp = _tf.mkdtemp(prefix="prof_vt_")
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", F.col("o_custkey").alias("custkey"),
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("price_cents"))
        cust = load_table(spark, SF_DIR, "customer").select(
            "c_custkey", F.col("c_custkey").alias("custkey"),
            "c_mktsegment")
        _batch_no = iter(range(1, 1000))

        def _fresh_batch():
            return orders.limit(2000).withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.lit(next(_batch_no) * 1_000_000_000))

        if want("merge"):
            mrg = os.path.join(vt_tmp, "mrg")
            VT.create(spark, mrg, orders)
            _cat = SQ.Catalog(os.path.join(vt_tmp, "cat"))
            _cat.register("mrg", mrg, meta={"key": "o_orderkey"})

            def _merge_2k(tag):
                shift = next(_batch_no) * 1_000_000_000
                src = orders.limit(1000).withColumn(
                    "price_cents", F.col("price_cents") + tag).unionByName(
                    orders.limit(1000).withColumn(
                        "o_orderkey", F.col("o_orderkey") + F.lit(shift)))
                src.createOrReplaceTempView("prof_mrg_src")
                SQ.execute(spark, "MERGE INTO mrg USING prof_mrg_src "
                                  "ON mrg.o_orderkey = o_orderkey "
                                  "WHEN MATCHED THEN UPDATE SET * "
                                  "WHEN NOT MATCHED THEN INSERT *", _cat)

            _merge_2k(1)
            for i in range(2):
                with prof(spark, f"sql_merge_upsert_2k #{i}"):
                    _merge_2k(2 + i)

        if want("jt"):
            jt_l = os.path.join(vt_tmp, "ord2")
            jv_r = os.path.join(vt_tmp, "cus")
            jt = os.path.join(vt_tmp, "jt")
            VT.create(spark, jt_l, orders)
            VT.create(spark, jv_r, cust)
            MV.create_join_table_view(spark, jt_l, jv_r, jt, on="custkey",
                                      left_key="o_orderkey",
                                      right_key="c_custkey")
            VT.append(spark, jt_l, _fresh_batch())
            MV.refresh_join_table_view(spark, jt)
            for i in range(2):
                with prof(spark, f"jt append 2k #{i}"):
                    VT.append(spark, jt_l, _fresh_batch())
                with prof(spark, f"jt refresh #{i}"):
                    MV.refresh_join_table_view(spark, jt)

        if want("hybrid") or want("bm25i"):
            from rclip_server_spark.operators import retrieval as RETR
            from rclip_server_spark.sources import annindex as AIX
            from rclip_server_spark.sources import textindex as TI

            ti_src = os.path.join(vt_tmp, "tidocs")
            ti_idx = os.path.join(vt_tmp, "tiidx")
            VT.create(spark, ti_src, docs.select("doc_id", "text"))
            TI.create_text_index(spark, ti_src, ti_idx, key="doc_id")
            TI.convert_index_to_bucketed(spark, ti_idx, n_buckets=64)
            ai_src = os.path.join(vt_tmp, "aivecs")
            ai_idx = os.path.join(vt_tmp, "aiidx")
            VT.create(spark, ai_src, emb.select("vec_id", "embedding"))
            AIX.create_ann_index(spark, ai_src, ai_idx, key="vec_id",
                                 n_planes=6)
            AIX.convert_index_to_bucketed(spark, ai_idx, n_buckets=64)

            if want("bm25i"):
                TI.query_text_index(spark, ti_idx,
                                    ["vector", "join", "spark"],
                                    k=10).collect()
                for i in range(2):
                    with prof(spark, f"bm25_indexed_topk #{i}"):
                        TI.query_text_index(
                            spark, ti_idx, ["vector", "join", "spark"],
                            k=10).collect()

            if want("hybrid"):
                def _hybrid():
                    t = TI.query_text_index(
                        spark, ti_idx, ["vector", "join", "spark"], k=50)
                    v = AIX.query_ann_index(
                        spark, ai_idx, QV_FLAGSHIP, k=50,
                        n_probe_bits=1).withColumnRenamed(
                        "vec_id", "doc_id")
                    return RETR.rrf_fusion(t, v, k=10, pool=50).collect()

                _hybrid()
                for i in range(2):
                    with prof(spark, f"hybrid_indexed_rrf #{i}"):
                        _hybrid()

    if want("q1x"):
        _QUERIES["rel_q1_pricing_summary"](
            spark, "/root/testdata/sf0.001").count()
        for i in range(2):
            with prof(spark, f"q1_pricing_summary #{i}"):
                _QUERIES["rel_q1_pricing_summary"](spark, SF_DIR).collect()

    if want("sessions"):
        from rclip_server_spark.streaming import windows as SW

        events = load_table(spark, SF_DIR, "events")
        SW.session_windows(events.limit(16)).count()
        for i in range(2):
            with prof(spark, f"event_session_windows #{i}"):
                SW.session_windows(events).count()

    if want("fixedk"):
        _QUERIES["samp_weighted_fixed_k"](
            spark, "/root/testdata/sf0.001").collect()
        for i in range(2):
            with prof(spark, f"weighted_fixed_k #{i}"):
                _QUERIES["samp_weighted_fixed_k"](spark, SF_DIR).collect()

    if want("tstats"):
        _QUERIES["text_stats"](spark, "/root/testdata/sf0.001").count()
        for i in range(2):
            with prof(spark, f"text_quality_stats #{i}"):
                _QUERIES["text_stats"](spark, SF_DIR).count()

    if want("asof"):
        _QUERIES["ev_asof_click_view"](
            spark, "/root/testdata/sf0.001").count()
        for i in range(2):
            with prof(spark, f"asof_click_view #{i}"):
                _QUERIES["ev_asof_click_view"](spark, SF_DIR).count()

    if want("mixture"):
        _QUERIES["samp_weighted_mixture"](
            spark, "/root/testdata/sf0.001").count()
        for i in range(2):
            with prof(spark, f"sample_weighted_mixture #{i}"):
                _QUERIES["samp_weighted_mixture"](spark, SF_DIR).count()

    if want("bjoin"):
        _QUERIES["rel_join_broadcast_agg"](
            spark, "/root/testdata/sf0.001").collect()
        for i in range(2):
            with prof(spark, f"join_broadcast_agg #{i}"):
                _QUERIES["rel_join_broadcast_agg"](spark, SF_DIR).collect()

    print("\nsummary:")
    for name, dt, jobs in prof.results:
        print(f"  {name:45s} {dt:8.3f}s {jobs:4d} jobs")
    spark.stop()


if __name__ == "__main__":
    main()
