"""Checkpoint recovery — the engine's analogue of the reference's
checkpoint/savepoint restore contract: a stateful streaming query STOPPED
mid-stream and RESTARTED from the same checkpoint location must resume
exactly where it left off (no double counting, no gaps), and its final
state must equal the one-shot batch result.

Mechanics: a file-source stream over N files processed one file per
trigger; run 1 stops after the first trigger, run 2 starts a NEW query
from the same checkpoint + sink dir and drains the rest (AvailableNow).
The parquet sink makes the output inspectable across the restart (memory
sinks die with their query)."""

import os
import tempfile

import pyspark.sql.functions as F


def _write_source(spark, tmp, n_files=4, rows_per=50):
    src = os.path.join(tmp, "src")
    for i in range(n_files):
        spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_restart_from_checkpoint_is_exactly_once(spark):
    tmp = tempfile.mkdtemp(prefix="ckpt_recovery_")
    src = _write_source(spark, tmp)
    ckpt = os.path.join(tmp, "ckpt")
    out = os.path.join(tmp, "out")
    schema = "id bigint, k bigint"

    def start():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )

    # run 1: let at least one micro-batch commit, then hard-stop
    q1 = start()
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if q1.lastProgress and q1.lastProgress["numInputRows"] > 0:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(30)
    n_after_run1 = spark.read.parquet(out).count()
    assert 0 < n_after_run1 <= 200

    # run 2: NEW query object, SAME checkpoint — must resume, not replay
    sdf2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = (
        sdf2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)

    got = spark.read.parquet(out)
    # exactly-once across the restart: every source row exactly once
    assert got.count() == 200
    assert got.select("id").distinct().count() == 200
    # and the derived aggregate equals the batch ground truth
    batch = (
        spark.read.parquet(src).groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    )
    streamed = got.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
