"""r15 task 5 evidence: job count + wall for the batched ANN serving query
(bench row ann_batch32_topk), plan capture before/after."""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rclip_server_spark.operators import ann as ann_ops
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import annindex as AIX
from rclip_server_spark.sources import load_table
from rclip_server_spark.sources import versioned as VT

SF = "/root/testdata/sf0.1"
TAG = sys.argv[1] if len(sys.argv) > 1 else "run"

spark = get_spark(app_name=f"opt_r15_annbatch_{TAG}")
emb = load_table(spark, SF, "embeddings")
tmp = tempfile.mkdtemp(prefix="annbatch_")
src, idx = tmp + "/vecs", tmp + "/idx"
VT.create(spark, src, emb.select("vec_id", "embedding"))
AIX.create_ann_index(spark, src, idx, key="vec_id", n_planes=6)
AIX.convert_index_to_bucketed(spark, idx, n_buckets=64)

QB = [(int(i), [float(x) for x in v]) for i, v in
      enumerate(ann_ops.hyperplanes(32, 64, seed=5))]

# warm plan shape
AIX.query_ann_index_batch(spark, idx, QB[:2], k=2).count()
spark.catalog.clearCache()


def _job_id() -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


best, jobs = None, None
for i in range(4):
    spark.catalog.clearCache()
    j0 = _job_id()
    t0 = time.time()
    n = AIX.query_ann_index_batch(spark, idx, QB, k=10, n_probe_bits=1).count()
    dt = time.time() - t0
    jobs = _job_id() - j0
    print(f"run {i}: {dt:.3f}s  rows={n}  jobs={jobs}")
    best = dt if best is None or dt < best else best
print(f"best: {best:.3f}s  jobs/run: {jobs}")

plan_df = AIX.query_ann_index_batch(spark, idx, QB, k=10, n_probe_bits=1)
with open(f"/root/repo/plans/r15/ann_batch32_topk_{TAG}.txt", "w") as f:
    f.write(plan_df._sc._jvm.PythonSQLUtils.explainString(
        plan_df._jdf.queryExecution(), "formatted"))
import shutil

shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
