"""CompactingParquetSink: exactly-once micro-batch writes + small-file
compaction (the production sink pattern SCALE.md prescribes for the
streaming small-file problem)."""

from __future__ import annotations

import pytest
import shutil
import tempfile

from streamprocessing_spark.sources.readers import load_table
from streamprocessing_spark.streaming.compaction import CompactingParquetSink

from conftest import stage_single_file_chunks


@pytest.mark.slow
def test_compacting_sink_exactly_once_and_compaction(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="sp_compact_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
        src = stage_single_file_chunks(ev, base, n_chunks=3)
        sink = CompactingParquetSink(base=f"{base}/table")

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        expected = sorted(map(tuple, ev.collect()))
        assert sorted(map(tuple, sink.read_table(spark).collect())) == expected
        files_before = sink.data_files()
        assert len(files_before) >= 3, "expected one file per micro-batch"

        # Retried micro-batch: Spark re-invokes foreachBatch with the SAME
        # batch_id after a failure. The per-batch overwrite must leave the
        # table unchanged — no duplicated rows, no extra files.
        batch0_rows = (
            spark.read.option("basePath", sink.data_dir)
            .parquet(f"{sink.data_dir}/batch=0")
            .drop("batch")
            .collect()
        )
        # coalesce(1): the original micro-batch was one file; a real retry
        # re-runs the same single-partition batch plan
        retry_df = spark.createDataFrame(batch0_rows, ev.schema).coalesce(1)
        sink.foreach_batch(retry_df, 0)
        assert sorted(map(tuple, sink.read_table(spark).collect())) == expected
        assert len(sink.data_files()) == len(files_before)

        # Compaction folds everything into target_files files, same rows.
        sink.compact(spark, target_files=1)
        assert len(sink.data_files()) == 1
        assert sorted(map(tuple, sink.read_table(spark).collect())) == expected

        # The sink keeps working after compaction: a later batch id lands
        # alongside the compacted data, and a second compaction folds it in.
        sink.foreach_batch(retry_df, 99)
        assert len(sink.read_table(spark).collect()) == len(expected) + len(batch0_rows)
        sink.compact(spark, target_files=1)
        assert len(sink.data_files()) == 1
        assert len(sink.read_table(spark).collect()) == len(expected) + len(batch0_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compaction_crash_recovery(spark, sf_dir):
    """A compaction crash between the two swap renames leaves the data in
    .old; the next compact() must restore it and proceed — no data loss,
    no stuck leftovers."""
    import os

    base = tempfile.mkdtemp(prefix="sp_compact_crash_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id").limit(100)
        sink = CompactingParquetSink(base=f"{base}/table")
        sink.foreach_batch(ev.coalesce(1), 0)
        expected = sorted(map(tuple, sink.read_table(spark).collect()))

        # simulate the worst crash point: data_dir renamed away, new
        # fileset not yet swapped in, stale temp dir also present
        os.rename(sink.data_dir, f"{sink.data_dir}.old")
        os.makedirs(f"{sink.data_dir}.compacting/batch=-1", exist_ok=True)

        sink.compact(spark, target_files=1)
        assert sorted(map(tuple, sink.read_table(spark).collect())) == expected
        assert not os.path.exists(f"{sink.data_dir}.old")
        assert not os.path.exists(f"{sink.data_dir}.compacting")
    finally:
        shutil.rmtree(base, ignore_errors=True)
