"""Scale-tier bench: the top multi-second headline rows on 1x/4x/8x
id-shifted replicas of the sf-dir fixtures, printing ONE JSON line —
the driver-runnable parallelism artifact (r14 verdict task 4).

Why it exists: at sf0.1 every row is seconds-or-less, so the driver's
8-core run BEATS its 32-core run (scheduling overhead > compute) and the
8v32 block cannot demonstrate parallelism. At 8x replicas the heavy rows
carry enough per-core work that the core-count ratio becomes visible.

Modes
  python tools/scale_bench.py [copies ...]
      run at local[$SPARK_GRAFT_CPUS] on $SPARK_GRAFT_SF_DIR (bench.py's
      contract) for each replica factor (default: 1 8); prints
      {"metric": "scale_bench_wall_sec", "value": total, "unit": "sec",
       "queries": {"<row>@<c>x": sec, ...}, "cpus": N, "sf": ...}
  python tools/scale_bench.py --cores A B [copies ...]
      self-contained core-scaling proof: runs itself at
      SPARK_GRAFT_CPUS=A and =B via subprocesses and adds
      "tA_over_tB" per-row ratios (t(A cores)/t(B cores); with A=8 B=32,
      ratio ≈ 4 is perfect scaling, > 2 = real parallelism).

Replicas are id-shifted and letter-permuted (tools/scale_sweep.replicate
rationale: verbatim copies would fabricate k^2 true near-dup pairs), so
per-row work grows ~linearly with the factor and dedup semantics stay
realistic.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _run(copies_list: list[int]) -> dict:
    from pyspark.sql import functions as F

    from rclip_server_spark.functions import text as TXT
    from rclip_server_spark.operators import ann, dedup, retrieval, stats
    from rclip_server_spark.session import get_spark
    from rclip_server_spark.sources import load_table
    from tools.scale_sweep import replicate

    spark = get_spark(app_name="scale_bench")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")

    timings: dict[str, float] = {}
    for copies in copies_list:
        docs = replicate(docs0, copies, "doc_id", text_col="text").persist()
        emb = replicate(emb0, copies, "vec_id").persist()
        docs.count()
        n_emb = emb.count()
        knn_left = emb.where(F.col("vec_id") % 17 == 0)
        n_knn_left = n_emb // 17 + copies
        # 2^n_planes tracks |right| (the documented sizing discipline)
        knn_planes = 9 + {1: 0, 2: 1, 4: 2, 8: 3}.get(copies, 3)
        feats = docs.select(
            F.log(F.size(TXT.tokens(F.col("text"))) + 1).alias("f_logtok"),
            (F.length("text") / (F.size(TXT.tokens(F.col("text"))) + 1))
            .alias("f_len"),
            (F.col("doc_id") % 7 == 0).cast("double").alias("label"),
        )
        ops = {
            "minhash_near_dup_docs": lambda: dedup.minhash_near_dup(
                docs, threshold=0.7).count(),
            "dedup_containment": lambda: dedup.containment_pairs(
                docs, threshold=0.8).count(),
            "train_quality_lr": lambda: stats.train_logistic(
                feats, ["f_logtok", "f_len"], "label", iters=8, lr=0.3),
            "bm25_topk": lambda: retrieval.bm25_topk(
                docs, ["data", "model", "training"], k=10).collect(),
            "lsh_knn_join": lambda: ann.lsh_knn_join(
                knn_left, emb, k=5, n_planes=knn_planes, n_probe_bits=1,
                dim=64, n_left=n_knn_left, n_right=n_emb).count(),
        }
        for name, fn in ops.items():
            fn()  # warm the plan/codegen shape at this size
            best = None
            for _ in range(2):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            timings[f"{name}@{copies}x"] = round(best, 3)
        docs.unpersist(), emb.unpersist()
    spark.stop()
    return {
        "metric": "scale_bench_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cpus": cpus,
        "sf": sf,
    }


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--cores":
        lo, hi = int(args[1]), int(args[2])
        copies = [int(c) for c in args[3:]] or [1, 8]
        outs = {}
        for cores in (hi, lo):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)]
                + [str(c) for c in copies],
                env=env, capture_output=True, text=True, check=True)
            outs[cores] = json.loads(p.stdout.strip().splitlines()[-1])
        ratios = {
            q: round(outs[lo]["queries"][q] /
                     max(outs[hi]["queries"][q], 1e-9), 2)
            for q in outs[hi]["queries"]
        }
        print(json.dumps({
            "metric": "scale_bench_core_ratio",
            "value": outs[hi]["value"],
            "unit": "sec",
            "queries": outs[hi]["queries"],
            f"queries_c{lo}": outs[lo]["queries"],
            f"t{lo}_over_t{hi}": ratios,
            "cpus": hi, "cpus_low": lo,
            "sf": outs[hi]["sf"],
        }))
        return
    copies = [int(c) for c in args] or [1, 8]
    print(json.dumps(_run(copies)))


if __name__ == "__main__":
    main()
