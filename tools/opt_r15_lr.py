"""r15 task 1 isolation: time ml_train_quality_lr best-of-3 at sf0.1 and
count the rows the gradient pass collects per iteration."""
import sys
import time

sys.path.insert(0, "/root/repo")

from rclip_server_spark.contract import _QUERIES
from rclip_server_spark.session import get_spark

SF = "/root/testdata/sf0.1"

spark = get_spark(app_name="opt_r15_lr")
# warm codegen/python workers
_QUERIES["ml_train_quality_lr"](spark, "/root/testdata/sf0.001").count()

best = None
for i in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    _QUERIES["ml_train_quality_lr"](spark, SF).count()
    dt = time.time() - t0
    print(f"run {i}: {dt:.3f}s")
    best = dt if best is None or dt < best else best
print(f"best: {best:.3f}s")

# collected-row census: rebuild the same features and count partial rows
import numpy as np
from pyspark.sql import functions as F

from rclip_server_spark.functions import text as TXT
from rclip_server_spark.operators import stats as ST
from rclip_server_spark.sources import load_table

docs = load_table(spark, SF, "documents")
feats = docs.select(
    F.log(F.size(TXT.tokens(F.col("text"))) + 1).alias("f_logtok"),
    (F.length("text") / (F.size(TXT.tokens(F.col("text"))) + 1)).alias("f_len"),
    (F.col("doc_id") % 7 == 0).cast("double").alias("label"),
)
n_parts = feats.rdd.getNumPartitions()
n_partial = ST._gradient_partials(
    feats, ["f_logtok", "f_len"], "label", np.zeros(2), 0.0).count()
print(f"partial rows collected per iteration: {n_partial} "
      f"(input partitions: {n_parts})")
w, b, losses = ST.train_logistic(feats, ["f_logtok", "f_len"], "label",
                                 iters=8, lr=0.3)
print("weights:", repr(float(w[0])), repr(float(w[1])), repr(float(b)),
      repr(float(losses[-1])))
spark.stop()
