"""Cross-PROCESS commit safety for versioned tables: the commit
protocol's arbitration is ``os.link`` (atomic + exclusive on the same
filesystem), so two INDEPENDENT processes must never both publish
version N — the loser gets ConcurrentWriteError and rebases onto the
new head. The in-process OCC tests (test_write_and_streaming) cover
racing threads; this hammers the same table from 4 separate Python
processes (spawn, no shared state beyond the directory) plus the
Spark-driver appender, ≥100 contended commits total, and asserts no
lost update, a gapless monotonic history, and every row present."""

import multiprocessing as mp
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rclip_server_spark.sources import versioned as V

N_PROCS = 4
COMMITS_PER_PROC = 30
DRIVER_APPENDS = 10
MAX_REBASES = 2000


def _hammer(path: str, worker_id: int, n_commits: int, q) -> None:
    """One writer process: pre-write a parquet segment (pyarrow — no
    JVM in the workers), then run append's read-head → commit loop,
    rebasing on ConcurrentWriteError. Reports committed versions."""
    committed = []
    try:
        for i in range(n_commits):
            seg = f"seg-{uuid.uuid4().hex[:12]}"
            os.makedirs(os.path.join(path, seg))
            pq.write_table(
                pa.table({"event_id": pa.array(
                    [worker_id * 1_000_000 + i], type=pa.int64()),
                    "writer": pa.array([worker_id], type=pa.int64())}),
                os.path.join(path, seg, "part-0.parquet"))
            for attempt in range(MAX_REBASES):
                v = V.current_version(path)
                m = V._manifest(path, v)
                try:
                    V._commit(path, v + 1, m["segments"] + [seg],
                              "append",
                              extra={"col_types": m["col_types"]})
                    committed.append(v + 1)
                    break
                except V.ConcurrentWriteError:
                    continue  # loser rebases onto the advanced head
            else:
                raise RuntimeError(f"worker {worker_id} starved after "
                                   f"{MAX_REBASES} rebases")
        q.put(("ok", worker_id, committed))
    except Exception as e:  # surface worker failures in the parent
        q.put(("err", worker_id, f"{type(e).__name__}: {e}"))


def test_multiprocess_commit_contention(spark, tmp_path):
    path = str(tmp_path / "contended")
    seed = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit(-1).cast("long").alias("writer"))
    V.create(spark, path, seed)

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_hammer,
                         args=(path, w, COMMITS_PER_PROC, q))
             for w in range(N_PROCS)]
    for p in procs:
        p.start()
    # the Spark driver contends too, through the REAL append + rebase
    driver_ok = 0
    for i in range(DRIVER_APPENDS):
        batch = spark.range(1).select(
            (F.lit(9_000_000 + i)).cast("long").alias("event_id"),
            F.lit(99).cast("long").alias("writer"))
        for _ in range(MAX_REBASES):
            try:
                V.append(spark, path, batch)
                driver_ok += 1
                break
            except V.ConcurrentWriteError:
                continue
        else:
            raise RuntimeError("driver appender starved")
    results = [q.get(timeout=120) for _ in range(N_PROCS)]
    for p in procs:
        p.join(timeout=120)
    errs = [r for r in results if r[0] == "err"]
    assert not errs, errs

    total = N_PROCS * COMMITS_PER_PROC + DRIVER_APPENDS
    assert total >= 100  # the contention bar this test exists to meet
    head = V.current_version(path)
    assert head == 1 + total  # gapless: every commit won exactly one v

    # no two processes ever published the same version
    all_versions = sorted(v for r in results for v in r[2])
    assert len(set(all_versions)) == len(all_versions)
    hist = V.history(path)
    assert [h["version"] for h in hist] == list(range(1, head + 1))

    # no lost update: every writer's every row is in the final state
    final = V.read(spark, path)
    per_writer = {r["writer"]: r["n"] for r in
                  final.groupBy("writer").agg(F.count("*").alias("n"))
                  .collect()}
    assert per_writer[-1] == 10
    assert per_writer[99] == DRIVER_APPENDS == driver_ok
    for w in range(N_PROCS):
        assert per_writer[w] == COMMITS_PER_PROC
    assert final.count() == 10 + total
