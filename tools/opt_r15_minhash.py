"""r15 task 3 evidence: time minhash_near_dup at sf0.1 (best-of-3, noop-style
count), capture the plan, and read total shuffle read/write bytes for the
query's jobs from the UI REST API (guide §1.4/§2.3)."""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from rclip_server_spark.operators import dedup
from rclip_server_spark.session import get_spark
from rclip_server_spark.sources import load_table

SF = "/root/testdata/sf0.1"
TAG = sys.argv[1] if len(sys.argv) > 1 else "run"

conf = {"spark.ui.enabled": "true"}
if "noBroadcast" in TAG:
    # scale-shape mode: disable broadcast so every join runs as a shuffle
    # join, making the band join's exchange bytes measurable (at 100 TB the
    # sides exceed any broadcast threshold — this is the real shape)
    conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
spark = get_spark(app_name=f"opt_r15_minhash_{TAG}", extra_conf=conf)
docs = load_table(spark, SF, "documents")

# warm
dedup.minhash_near_dup(docs.limit(16)).count()
spark.catalog.clearCache()

best = None
for i in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    n = dedup.minhash_near_dup(docs, threshold=0.7).count()
    dt = time.time() - t0
    print(f"run {i}: {dt:.3f}s  pairs={n}")
    best = dt if best is None or dt < best else best
print(f"best: {best:.3f}s")

# shuffle byte census over the whole app (all runs identical in shape)
app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
print(f"app shuffle write total: {sw/1e6:.2f} MB  read: {sr/1e6:.2f} MB "
      f"(3 timed runs + warm)")

plan_df = dedup.minhash_near_dup(docs, threshold=0.7)
with open(f"/root/repo/plans/r15/minhash_near_dup_docs_{TAG}.txt", "w") as f:
    f.write(plan_df._sc._jvm.PythonSQLUtils.explainString(
        plan_df._jdf.queryExecution(), "formatted"))
spark.stop()
