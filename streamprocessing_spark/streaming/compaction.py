"""Exactly-once streaming parquet sink with small-file compaction.

The 100 TB problem this solves: a streaming job triggering every few
seconds writes a handful of small files per micro-batch; after a day a
table holds millions of KB-sized files and every downstream scan drowns
in open()/footer overhead. Production fixes are (a) make the per-batch
write idempotent so retries never duplicate, and (b) periodically rewrite
accumulated small files into scan-sized ones without breaking (a).

This module implements both with plain parquet + directory layout (the
same contract Delta/Iceberg provide transactionally — documented in
SCALE.md; the writer line is the only thing that changes):

- ``CompactingParquetSink.foreach_batch`` writes micro-batch N to its own
  ``batch=N`` subdirectory with mode=overwrite. A retried batch (Spark
  re-runs foreachBatch with the SAME batch_id after a failure) overwrites
  its own directory instead of appending duplicates — idempotence comes
  from the batch_id in the path, the reference's dedup-by-record-ID
  contract (rainstorm/server.go:292-298) at file granularity.
- ``compact`` rewrites all current data into ``target_files`` files via
  write-then-swap: the new fileset is fully materialized under a temp
  directory before the directory swap. Compacted data lands in a
  ``batch=-1`` directory — the sink keeps accepting post-compaction
  batches (their ids keep growing, never colliding) and repeated
  compactions fold everything down again.

Concurrency contract: ``compact`` must run while no stream is WRITING
(between runs, or during a maintenance quiesce) — a batch committed
between the compaction read and the swap would be deleted by the swap
while the checkpoint believes it durable. Concurrent READERS can race
the two-rename swap window; the swap is crash-recoverable (leftover
``.compacting``/``.old`` directories are healed on the next call) but
not atomic for readers. At distributed scale both gaps close by making
the swap a metastore/manifest pointer flip (Delta OPTIMIZE / Iceberg
rewrite_data_files run exactly this read-rewrite-commit loop under
optimistic concurrency); the parquet layout here keeps the batch-id
idempotence and rewrite mechanics, not the transaction log.

Read the table with ``read_table`` (plain ``spark.read.parquet`` over the
base dir, partition-discovery column dropped).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

COMPACTED_BATCH_ID = -1


@dataclass(frozen=True)
class CompactingParquetSink:
    base: str

    @property
    def data_dir(self) -> str:
        return os.path.join(self.base, "data")

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """writeStream.foreachBatch hook: idempotent per-batch parquet
        write (overwrite of the batch's own directory)."""
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.data_dir, f"batch={batch_id}")
        )

    def read_table(self, spark: SparkSession) -> DataFrame:
        """Current table contents (all batches + compacted data)."""
        return (
            spark.read.option("basePath", self.data_dir)
            .parquet(self.data_dir)
            .drop("batch")
        )

    def data_files(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self.data_dir):
            out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        return sorted(out)

    def _recover(self) -> None:
        """Heal leftovers of a compaction that crashed mid-swap:
        - data dir present → any .old/.compacting remnants are stale;
        - data dir missing but .old present → the crash hit between the
          two renames; the original data is intact in .old — restore it.
        """
        tmp = f"{self.data_dir}.compacting"
        old = f"{self.data_dir}.old"
        if not os.path.exists(self.data_dir) and os.path.exists(old):
            os.rename(old, self.data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    def compact(self, spark: SparkSession, target_files: int = 1) -> None:
        """Rewrite the whole table into ``target_files`` files.

        Write-then-swap with crash recovery: the compacted fileset is
        fully materialized in a sibling temp dir before the swap, so a
        crash at any point leaves the original data recoverable (healed
        by ``_recover`` on the next call). MUST NOT run concurrently with
        an active writer — see the module docstring's contract.
        """
        self._recover()
        tmp = f"{self.data_dir}.compacting"
        old = f"{self.data_dir}.old"
        (
            self.read_table(spark)
            .repartition(target_files)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"batch={COMPACTED_BATCH_ID}"))
        )
        os.rename(self.data_dir, old)
        os.rename(tmp, self.data_dir)
        shutil.rmtree(old)
