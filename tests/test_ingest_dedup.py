"""Streaming ingest-time dedup (streaming/ingest_dedup.py): each
micro-batch of documents is deduplicated against the corpus ingested so
far via the persisted band-bucket store. The end state must equal the
batch-computed expectation: every full-corpus MinHash pair relabeled
(later-batch doc, earlier-batch doc), cross-batch pairs only."""

from __future__ import annotations

import pytest
import shutil
import tempfile

from pyspark.sql import functions as F

from streamprocessing_spark.sources.readers import load_table

N_CHUNKS = 3


def _chunk(doc_id: int) -> int:
    return doc_id % N_CHUNKS


@pytest.mark.slow
def test_streaming_ingest_dedup_equals_batch_expectation(spark, sf_dir):
    from conftest import stage_single_file_chunks

    from streamprocessing_spark.queries.dedup import JACCARD_THRESHOLD
    from streamprocessing_spark.registry import all_specs
    from streamprocessing_spark.streaming.ingest_dedup import IngestDedup

    base = tempfile.mkdtemp(prefix="sp_ingest_dedup_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        sink = IngestDedup(base=f"{base}/state", threshold=JACCARD_THRESHOLD)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(
                stage_single_file_chunks(docs, base, n_chunks=N_CHUNKS, key_col="doc_id")
            )
        )
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        got = {
            (r.id_a, r.id_b, r.jaccard) for r in sink.dup_pairs(spark).collect()
        }
        full = all_specs()["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
        expected = set()
        for r in full:
            ca, cb = _chunk(r.id_a), _chunk(r.id_b)
            if ca == cb:
                continue  # same micro-batch: ingest dedup sees prior corpus only
            later, earlier = (r.id_a, r.id_b) if ca > cb else (r.id_b, r.id_a)
            expected.add((later, earlier, r.jaccard))
        assert expected, "fixture yields no cross-batch duplicate pairs"
        assert got == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)


@pytest.mark.slow
def test_ingest_dedup_batch_retry_is_idempotent(spark, sf_dir):
    """Spark re-runs foreachBatch with the SAME batch_id after a failure:
    replaying a batch must overwrite its own batch= directories, leaving
    the dup pairs, doc store, and bucket store unchanged."""
    import tempfile

    from streamprocessing_spark.queries.dedup import JACCARD_THRESHOLD
    from streamprocessing_spark.streaming.ingest_dedup import IngestDedup

    base = tempfile.mkdtemp(prefix="sp_ingest_retry_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        sink = IngestDedup(base=f"{base}/state", threshold=JACCARD_THRESHOLD)
        b0 = docs.where(F.col("doc_id") % 3 == 0)
        b1 = docs.where(F.col("doc_id") % 3 == 1)
        sink.foreach_batch(b0, 0)
        sink.foreach_batch(b1, 1)
        first = sorted(map(tuple, sink.dup_pairs(spark).collect()))
        n_docs = spark.read.parquet(f"{sink.docs_dir}/batch=*").count()
        # retry both batches (same ids, same data)
        sink.foreach_batch(b1, 1)
        sink.foreach_batch(b0, 0)
        assert sorted(map(tuple, sink.dup_pairs(spark).collect())) == first
        assert spark.read.parquet(f"{sink.docs_dir}/batch=*").count() == n_docs
    finally:
        shutil.rmtree(base, ignore_errors=True)
