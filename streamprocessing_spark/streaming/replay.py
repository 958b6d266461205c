"""Structured Streaming replay of the driver's bounded tables.

The reference's notion of a "stream" is a bounded replay of a DFS file
(rainstorm/server.go:411-448): records flow through the pipeline and the
job ends when the file is exhausted. The Structured Streaming equivalent
is a file source driven with Trigger.AvailableNow — the same incremental,
stateful, checkpointed execution a live stream gets, but terminating when
the backlog is drained. Results land in a memory sink so the caller gets
an ordinary DataFrame back; correctness is defined against the batch
oracle at end-of-stream (SURVEY.md §4.3.1/§5).

On a real deployment the source line is the only thing that changes
(readStream.format("kafka")...): every transformation, watermark and sink
below is production Structured Streaming.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from streamprocessing_spark.sources.readers import _ensure_confs, normalize_timestamps


_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the same ts normalization as the
    batch loader (see readers.normalize_timestamps). Schema comes from a
    batch peek (memoized per session+path — file stream sources need it
    declared, and the peek costs a footer read per query otherwise)."""
    _ensure_confs(spark)
    path = f"{sf_dir}/events.parquet"
    cache_key = (spark.sparkContext.applicationId, path)
    schema = _SCHEMA_CACHE.get(cache_key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[cache_key] = schema
    # The file stream source lists a DIRECTORY; events.parquet is a single
    # file, so stream the parent dir with a glob restricted to it.
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_timestamps(df, table="events")


def run_to_memory_sink(
    df: DataFrame,
    output_mode: str,
    query_name: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the sink contents as a DataFrame.

    Memory sinks are a test/driver harness device — production jobs write
    parquet/Kafka with the same trigger + checkpointLocation arguments.
    """
    q, name, cleanup = start_memory_sink(df, output_mode, query_name, checkpoint_dir)
    q.awaitTermination()
    cleanup()
    return df.sparkSession.table(name)


def start_memory_sink(
    df: DataFrame,
    output_mode: str,
    query_name: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Start (without awaiting) a streaming DataFrame into a memory sink.

    Returns ``(query, sink_name, cleanup)``; the caller awaits termination
    then calls ``cleanup()`` to drop the throwaway checkpoint. Splitting
    start from await lets independent replays run CONCURRENTLY — n bounded
    drains cost roughly the slowest one instead of the sum (each query is
    its own checkpointed Structured Streaming job; concurrency is the
    normal multi-query deployment shape, not a test trick)."""
    name = query_name or f"sink_{uuid.uuid4().hex[:12]}"
    spark = df.sparkSession
    # A previous run under the same name would leave its memory table
    # pinned in driver heap; replace rather than accumulate.
    try:
        spark.catalog.dropTempView(name)
    except Exception:  # noqa: BLE001
        pass
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sp_ckpt_")
    writer = writer.option("checkpointLocation", ckpt)
    q = writer.start()

    def cleanup() -> None:
        if own_ckpt:
            # the replay is complete and the result lives in the memory
            # sink; a throwaway checkpoint has no further use
            shutil.rmtree(ckpt, ignore_errors=True)

    return q, name, cleanup
