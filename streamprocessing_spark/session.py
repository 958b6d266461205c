"""SparkSession factory with scale-oriented defaults.

Tuned for the driver's local[32] harness but written for a real cluster:
AQE on (runtime coalescing + skew-join splitting), partition counts sized
from cores, Arrow enabled for the few Pandas-UDF paths, UTC session time
so timestamp semantics match the (naive-timestamp) parquet test data.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(app_name: str = "streamprocessing-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster, drop ``master`` and submit with spark-submit; every
    other setting below is cluster-safe:

    - ``spark.sql.adaptive.*``: AQE re-plans at runtime — coalesces tiny
      post-shuffle partitions and splits skewed ones, which is exactly what
      a 100 TB join with hot keys needs.
    - ``spark.sql.shuffle.partitions``: a static floor; AQE coalesces down
      from it. At cluster scale this should be ~2-3x total cores.
    - Arrow: vectorized Python<->JVM transfer for the Pandas-UDF operators
      (similarity search, multimodal decode) — the only places we leave the
      JVM.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Legacy testdata generations wrote events.ts as TIMESTAMP(NANOS);
        # this conf makes those read as long (rebuilt into a micros
        # timestamp by sources.readers.normalize_timestamps). Current
        # generations write micros NTZ and ignore it.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # broadcast builds are collected THROUGH the driver and count
        # against maxResultSize (default 1g): a join side that AQE sizes
        # at ~100 MB on disk can serialize past 1 GB row-form, killing
        # the job even though the driver heap would hold it. 0 = bounded
        # by driver memory alone, the setting a real cluster uses when
        # the driver is sized for its broadcasts.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        # shuffle/blockmgr scratch OUT of /tmp: the harness box reaps /tmp
        # mid-run (observed twice: shuffle_*.data FileNotFound cascades
        # killing multi-minute jobs). A real cluster sets SPARK_LOCAL_DIRS
        # to provisioned scratch disks for the same reason.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                str(Path(__file__).resolve().parent.parent / ".spark-local"),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner only reclaims dead localCheckpoint/persist
        # blocks after a JVM GC, and its default periodic GC is 30min —
        # longer than a whole multi-query session here, so dead blocks
        # accumulate (measured: one ~26 MB shingle checkpoint per pair
        # build). 5min bounds the leak for long sessions; bench.py
        # additionally pulses between timed queries.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        # local[n, 2]: allow one task retry, like a real cluster
        # (spark.task.maxFailures defaults to 4 there but 1 in plain
        # local mode) — required for the mid-run failure-injection tests
        # (the RainStormWithFail analogue) and generally truer to the
        # deployment the engine targets.
        builder = builder.master(f"local[{cpus},2]")
    return builder.getOrCreate()
