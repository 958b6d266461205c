"""Subprocess body for tests/test_fault_injection.py — the
RainStormWithFail analogue (reference main.go:223-243 kills 2 op workers
1.5 s into the job; rainstorm/server.go:553-572 KillRandom), re-expressed
in Spark's failure domain: every first TASK ATTEMPT of the Python
operator stage raises, task retry (spark.task.maxFailures=2, the
``local[4, 2]`` master) re-runs it, and the sinks must show EXACTLY-ONCE
output — identical to a no-failure run and to batch ground truth.

Runs in its own process because the test-session SparkSession is
local[32] with maxFailures=1 (first failure is fatal there, as in any
default local master).

Two legs, both driven by a 3-chunk file stream (one micro-batch per
chunk):
  1. stateless: failing mapInPandas identity -> transactional parquet
     APPEND sink. The retried task re-writes its file; the sink's
     manifest commit log must expose each record exactly once.
  2. stateful: failing kernel -> running count per event_type (complete
     mode) -> idempotent foreachBatch overwrite. Final counts must equal
     the batch ground truth.

Prints one JSON line the test asserts on.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def main(scratch: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4, 2]")  # maxFailures=2
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fault-injection")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from streamprocessing_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "event_type")
    src = os.path.join(scratch, "src")
    os.makedirs(src, exist_ok=True)
    import shutil

    for i in range(3):
        d = os.path.join(scratch, f"chunk{i}")
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        shutil.copyfile(os.path.join(d, part), os.path.join(src, f"c{i}.parquet"))

    schema = spark.read.parquet(src).schema
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    marker_dir = os.path.join(scratch, "fired")
    os.makedirs(marker_dir, exist_ok=True)

    def kernel(batches):
        # First attempt of EVERY task in this stage dies — strictly more
        # hostile than the reference's "kill 2 of N workers once".
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.attemptNumber() == 0:
            open(
                os.path.join(marker_dir, f"p{tc.partitionId()}-{os.getpid()}"), "a"
            ).close()
            raise RuntimeError("injected first-attempt task failure")
        for pdf in batches:
            yield pdf

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .mapInPandas(kernel, ddl)
        )

    # leg 1: stateless -> transactional parquet append sink
    q1 = (
        stream()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "sink1"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()

    # leg 2: stateful running count, idempotent overwrite per batch
    counts = stream().groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def upsert(batch_df, _bid):
        batch_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(scratch, "sink2")
        )

    q2 = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(scratch, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    truth_rows = sorted(tuple(r) for r in ev.collect())
    got_rows = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(scratch, "sink1")).collect()
    )
    truth_counts = sorted(
        tuple(r) for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    got_counts = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(scratch, "sink2")).collect()
    )
    print(
        json.dumps(
            {
                "n_truth": len(truth_rows),
                "n_sink": len(got_rows),
                "stateless_exact": got_rows == truth_rows,
                "stateful_exact": got_counts == truth_counts,
                "n_injected_failures": len(os.listdir(marker_dir)),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
