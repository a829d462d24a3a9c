"""Empirical backing for the maintained-index cost claims (late r11):

* a FIXED-SIZE source change (delete 200 docs + insert 200 docs)
  refreshes the BM25 postings index in ~the same time at every corpus
  size — the refresh is retract-by-delete-vector + append-new-postings
  over the CDC interval, never a corpus re-tokenization;
* the indexed query stays ~flat too (it reads the query terms'
  postings, pruned by the pushed IN-list, not the corpus);
* the from-scratch rebuild (what a non-incremental engine pays per
  change) grows linearly — the gap IS the index's value;
* (r13) the bucketed AT-REST layout answers the same query
  row-identically while naming only the query terms' hash buckets'
  segment FILES in the plan — files-opened counts recorded and
  asserted strictly smaller than the flat read's at every size.

Targets are 1x/4x/8x id-shifted replicas of the sf0.1 documents
fixture. Postings equality vs a full rebuild is asserted at every
size — the proof is only meaningful if the O(delta) path is exact.

Usage: python tools/textindex_scale_proof.py [sf_dir] [copies ...]
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
from rclip_server_spark.sources import textindex as TI
from rclip_server_spark.sources import versioned as V

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = [int(c) for c in sys.argv[2:]] or [1, 4, 8]
BATCH = 200


def main() -> None:
    spark = get_spark(app_name="textindex_scale_proof")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id",
                                                          "text")
    tmp = tempfile.mkdtemp(prefix="ti_proof_")
    results = {}
    try:
        # warm the plan shapes once
        wsrc = os.path.join(tmp, "warm")
        widx = os.path.join(tmp, "warm_i")
        V.create(spark, wsrc, docs0.limit(500))
        TI.create_text_index(spark, wsrc, widx, key="doc_id")
        V.append(spark, wsrc, docs0.limit(50).withColumn(
            "doc_id", F.col("doc_id") + 90_000_000))
        TI.refresh_text_index(spark, widx)
        TI.query_text_index(spark, widx, ["vector", "join"], k=10) \
            .collect()

        for c in COPIES:
            d = docs0
            for i in range(1, c):
                d = d.unionByName(docs0.withColumn(
                    "doc_id", F.col("doc_id") + i * 10_000_000))
            src = os.path.join(tmp, f"src{c}")
            idx = os.path.join(tmp, f"idx{c}")
            V.create(spark, src, d)
            t0 = time.time()
            TI.create_text_index(spark, src, idx, key="doc_id")
            t_build = time.time() - t0
            # fixed-size churn: delete BATCH docs, insert BATCH new
            del_keys = d.orderBy("doc_id").limit(BATCH).select("doc_id")
            ins = d.orderBy("doc_id").limit(BATCH).withColumn(
                "doc_id", F.col("doc_id") + 500_000_000)
            V.delete_and_append(spark, src, del_keys, "doc_id", ins)
            t0 = time.time()
            TI.refresh_text_index(spark, idx)
            t_refresh = time.time() - t0
            def _scan_bytes(q) -> tuple[int, int]:
                files = {f for f in q.inputFiles()
                         if "/del-" not in f}
                paths = [f.replace("file:", "") for f in files]
                return len(files), sum(os.path.getsize(p)
                                       for p in paths
                                       if os.path.exists(p))

            terms = ["vector", "join", "spark"]
            q_flat = TI.query_text_index(spark, idx, terms, k=10)
            files_flat, bytes_flat = _scan_bytes(q_flat)
            t0 = time.time()
            flat_rows = [(r[0], round(r[1], 9))
                         for r in q_flat.collect()]
            t_query = time.time() - t0
            # r13: the bucketed AT-REST layout — the same query then
            # names only the query terms' hash buckets' segment FILES
            # in its plan (conversion is write-time cost, one rewrite)
            TI.convert_index_to_bucketed(spark, idx, n_buckets=64)
            q_bk = TI.query_text_index(spark, idx, terms, k=10)
            files_bk, bytes_bk = _scan_bytes(q_bk)
            t0 = time.time()
            bk_rows = [(r[0], round(r[1], 9)) for r in q_bk.collect()]
            t_bquery = time.time() - t0
            assert bk_rows == flat_rows, f"{c}x bucketed != flat"
            # BYTES is the honest cross-layout metric (a flat index is
            # few BIG files, a bucketed one many SMALL per-bucket
            # files): the probe read must plan strictly less IO than
            # the flat full-postings read
            assert bytes_bk < bytes_flat, \
                f"{c}x: bucketed read plans {bytes_bk}B vs flat " \
                f"{bytes_flat}B — no at-rest pruning"
            # exactness at every size: postings == full rebuild
            cur = V.read(spark, src)
            got = TI.read_text_index(spark, idx)
            want = TI._postings(cur, "doc_id", "text")
            assert got.exceptAll(want).count() == 0 \
                and want.exceptAll(got).count() == 0, f"{c}x mismatch"
            results[f"{c}x"] = {
                "docs": cur.count(),
                "build_sec": round(t_build, 2),
                "refresh_200_sec": round(t_refresh, 2),
                "indexed_query_sec": round(t_query, 2),
                "bucketed_query_sec": round(t_bquery, 2),
                "files_flat": files_flat,
                "files_bucketed": files_bk,
                "scan_mb_flat": round(bytes_flat / 1e6, 2),
                "scan_mb_bucketed": round(bytes_bk / 1e6, 2),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "textindex_scale_proof",
                      "sf_dir": SF_DIR, "batch": BATCH,
                      "results": results}))


if __name__ == "__main__":
    main()
