"""Streaming ingest-time dedup: every micro-batch of documents is
deduplicated against the corpus ingested so far — the streaming twin of
``queries.dedup.dedup_incremental_batch`` (the daily-crawl pattern run
continuously instead of nightly).

Mechanics per micro-batch (foreachBatch):

1. signature the batch (same shingle → 64-minhash → band-bucket pipeline
   as the batch tier — ``operators.dedup``);
2. probe the PERSISTED bucket store with the batch's buckets on
   (band, sig) — candidate work is O(batch × bands) against bucketed
   state, independent of corpus size; the corpus is never re-paired;
3. exact-Jaccard verify candidates (corpus shingles re-derived from the
   stored docs for just the candidate ids — an id-pushdown read);
4. append the batch's docs and buckets to the stores.

Exactly-once: all four writes land under ``batch=<id>`` subdirectories
with mode=overwrite — a retried batch (Spark re-runs foreachBatch with
the same batch_id) overwrites its own directories instead of appending
duplicates, the CompactingParquetSink idempotence contract. Reads glob
the whole store, so a half-written retry directory is healed by its
overwrite.

At 100 TB the bucket store is written bucketed by (band, sig)
(sources/bucketing) so the probe join is a zero-shuffle bucket lookup,
and the doc store is the ingested table itself. Dedup policy (drop the
new duplicate, link it, or keep-with-weight) is the caller's choice —
this emits the verified (new_id, dup_of, jaccard) pairs per batch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_spark.functions.text import portable_round
from streamprocessing_spark.operators.dedup import (
    _band_buckets,
    jaccard_on_pairs,
    minhash_signature_df,
    shingle_df,
)


@dataclass(frozen=True)
class IngestDedup:
    base: str
    threshold: float
    id_col: str = "doc_id"
    text_col: str = "text"

    @property
    def docs_dir(self) -> str:
        return os.path.join(self.base, "docs")

    @property
    def buckets_dir(self) -> str:
        return os.path.join(self.base, "buckets")

    @property
    def dups_dir(self) -> str:
        return os.path.join(self.base, "dups")

    def _read(
        self, spark: SparkSession, path: str, before_batch: int | None = None
    ) -> DataFrame | None:
        """Read the store; with ``before_batch``, only batches < it — the
        state a batch is allowed to see. A RETRIED batch (same batch_id
        after a failure) must not probe its own half-written output as
        'prior corpus', or the replay would emit self-matches the
        original run never saw."""
        if not os.path.isdir(path):
            return None
        dirs = [
            e.name for e in os.scandir(path)
            if e.name.startswith("batch=")
            and (before_batch is None or int(e.name.split("=", 1)[1]) < before_batch)
        ]
        if not dirs:
            return None
        return spark.read.option("basePath", path).parquet(
            *[f"{path}/{d}" for d in sorted(dirs)]
        )

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select(self.id_col, self.text_col).localCheckpoint(eager=True)
        sh_new = shingle_df(batch, self.id_col, self.text_col)
        b_new = _band_buckets(minhash_signature_df(sh_new)).localCheckpoint(eager=True)

        stored_buckets = self._read(spark, self.buckets_dir, before_batch=batch_id)
        if stored_buckets is not None:
            cand = (
                b_new.alias("a")
                .join(
                    stored_buckets.select("id", "band", "sig").alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig")),
                )
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                .distinct()
            )
            # corpus shingles only for candidate ids: id-pushdown read of
            # the doc store (a semi-join; with a bucketed store, a lookup)
            old_ids = cand.select(F.col("id_b").alias(self.id_col)).distinct()
            old_docs = self._read(spark, self.docs_dir, before_batch=batch_id)
            assert old_docs is not None  # buckets exist => docs exist
            sh_old = shingle_df(
                old_docs.join(old_ids, self.id_col, "left_semi"),
                self.id_col,
                self.text_col,
            )
            dups = (
                jaccard_on_pairs(sh_new.unionByName(sh_old), cand)
                .where(F.col("jaccard") >= self.threshold)
                .select(
                    "id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard")
                )
            )
        else:
            dups = spark.createDataFrame(
                [], "id_a bigint, id_b bigint, jaccard double"
            )
        dups.write.mode("overwrite").parquet(f"{self.dups_dir}/batch={batch_id}")
        batch.write.mode("overwrite").parquet(f"{self.docs_dir}/batch={batch_id}")
        b_new.write.mode("overwrite").parquet(f"{self.buckets_dir}/batch={batch_id}")

    def dup_pairs(self, spark: SparkSession) -> DataFrame:
        """All (new_id, dup_of, jaccard) pairs emitted so far."""
        df = self._read(spark, self.dups_dir)
        if df is None:
            return spark.createDataFrame([], "id_a bigint, id_b bigint, jaccard double")
        return df.drop("batch")


@dataclass(frozen=True)
class ParagraphIngestDedup(IngestDedup):
    """Ingest-time PARAGRAPH dedup over the persisted band store (round
    10, VERDICT r09 next #4) — CCNet's unit of near-duplication run at
    the cadence a crawl actually arrives. Each micro-batch of documents
    explodes into deterministic PARA_TOKENS-token windows
    (operators.dedup.paragraph_df — the same packing law as the batch
    tier), signatures them under the COUNT-SCALED banding law with (r, b)
    derived OFFLINE from the corpus paragraph count (`n_total_units` —
    the ivf_pairs_stream precedent: the quantizer/banding is a
    broadcast-sized artifact trained before serving; the law is
    log-scale, so a decade-class estimate suffices in production), and
    emits every verified pair exactly once:

    * new×stored — the batch's buckets probe the persisted band store on
      (band, sig): O(batch × bands) against bucketed state, corpus never
      re-paired;
    * new×new — the batch's buckets self-join (a.id < b.id), so
      same-batch duplicates are not deferred.

    Because the banding is byte-identical to the batch tier's and every
    bucket collision between two paragraphs is seen either when they
    share a batch (self-join) or when the later one arrives (probe), the
    END-OF-STREAM pair set equals queries.dedup's ``parapairs`` view
    exactly — the strongest check a stateful ingest operator can carry
    (pinned by streaming_paragraph_dedup_ingest's shared oracle and the
    checkpoint-restart test). Exactly-once via the same batch=<id>
    overwrite contract as the document tier."""

    n_total_units: int = 0

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        from streamprocessing_spark.operators.dedup import (
            paragraph_df,
            scaled_band_buckets,
        )

        spark = batch.sparkSession
        paras = (
            paragraph_df(
                batch.select(self.id_col, self.text_col), self.id_col, self.text_col
            )
            .select(F.col("pid").alias("id"), F.col("ptext").alias("text"))
            .localCheckpoint(eager=True)
        )
        sh_new = shingle_df(paras, "id", "text")
        b_new = scaled_band_buckets(sh_new, self.n_total_units).localCheckpoint(
            eager=True
        )

        # the scaled tier's sig is one xxhash64 bigint with the band
        # index folded in (round 11, operators.dedup.scaled_band_buckets)
        # — both probes key on the single bigint, byte-identical to the
        # batch tier's band join
        a, b = b_new.alias("a"), b_new.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        stored_buckets = self._read(spark, self.buckets_dir, before_batch=batch_id)
        sh_all = sh_new
        if stored_buckets is not None:
            cross = (
                b_new.alias("a")
                .join(
                    stored_buckets.select("id", "band", "sig").alias("b"),
                    F.col("a.sig") == F.col("b.sig"),
                )
                .select(
                    F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                )
            )
            cand = cand.unionByName(cross)
            old_ids = (
                cross.select(F.explode(F.array("id_a", "id_b")).alias("id"))
                .join(paras.select("id"), "id", "left_anti")
                .distinct()
            )
            old_paras = self._read(spark, self.docs_dir, before_batch=batch_id)
            assert old_paras is not None
            sh_all = sh_new.unionByName(
                shingle_df(
                    old_paras.join(old_ids, "id", "left_semi"), "id", "text"
                )
            )
        dups = (
            jaccard_on_pairs(sh_all, cand.distinct())
            .where(F.col("jaccard") >= self.threshold)
            .select(
                "id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard")
            )
        )
        dups.write.mode("overwrite").parquet(f"{self.dups_dir}/batch={batch_id}")
        paras.write.mode("overwrite").parquet(f"{self.docs_dir}/batch={batch_id}")
        b_new.write.mode("overwrite").parquet(f"{self.buckets_dir}/batch={batch_id}")


CDC_ID_STRIDE = 1_000_000  # chunks per doc bound; docs are « 8M tokens


@dataclass(frozen=True)
class CdcIngestDedup(IngestDedup):
    """Ingest-time CONTENT-DEFINED-CHUNK dedup over a persisted
    fingerprint store (round 10) — the streaming twin of
    ``queries.dedup.dedup_cdc_chunks``, the chunk-store write path run
    at crawl cadence. Each micro-batch chunks its documents under the
    shared boundary law (operators.dedup.cdc_chunk_df — boundaries are
    a pure function of LOCAL content, so a batch chunks identically no
    matter how the stream was split), fingerprints each chunk, and
    emits MIN-LINKS instead of all pairs:

    * batch-local — every instance links to its batch-min instance of
      the same fp (one link per non-min instance);
    * cross — one link per fp shared with the store, connecting the
      stored GLOBAL min and the batch min (the store holds per-batch
      per-fp min instance ids; the global min is their min).

    The link forest carries the keep-first law exactly: an instance is
    a duplicate iff it appears as the GREATER side of some link —
    induction over batches: local links cover all but the batch min,
    and the cross link demotes whichever of (stored global min, batch
    min) is larger, so after every batch each instance except the
    global fp-min has been demoted exactly where the batch tier's
    row_number() > 1 would mark it. Work per batch is O(batch) chunking
    plus one probe of the fp-keyed min store (16-byte keys — at 100 TB
    the store is bucketed by fp and the probe is a bucket lookup);
    links are O(instances), never quadratic in copy count. Exactly-once
    via the inherited batch=<id> overwrite contract; instance ids pack
    (doc_id, chunk_idx) as doc_id·CDC_ID_STRIDE + chunk_idx."""

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        from streamprocessing_spark.operators.dedup import cdc_chunk_df

        spark = batch.sparkSession
        inst = (
            cdc_chunk_df(
                batch.select(self.id_col, self.text_col), self.id_col, self.text_col
            )
            .select(
                (F.col("doc_id") * CDC_ID_STRIDE + F.col("chunk_idx")).alias("id"),
                F.md5(F.col("ctext").cast("binary")).alias("fp"),
            )
            .localCheckpoint(eager=True)
        )
        w = Window.partitionBy("fp")
        marked = inst.withColumn("bmin", F.min("id").over(w))
        links_local = marked.where(F.col("id") > F.col("bmin")).select(
            F.col("bmin").alias("id_a"), F.col("id").alias("id_b")
        )
        bmins = (
            inst.groupBy("fp").agg(F.min("id").alias("id")).localCheckpoint(eager=True)
        )
        stored = self._read(spark, self.buckets_dir, before_batch=batch_id)
        links = links_local
        if stored is not None:
            smin = stored.groupBy("fp").agg(F.min("id").alias("sid"))
            cross = bmins.join(smin, "fp").select(
                F.least(F.col("id"), F.col("sid")).alias("id_a"),
                F.greatest(F.col("id"), F.col("sid")).alias("id_b"),
            )
            links = links.unionByName(cross)
        links.write.mode("overwrite").parquet(f"{self.dups_dir}/batch={batch_id}")
        bmins.write.mode("overwrite").parquet(f"{self.buckets_dir}/batch={batch_id}")

    def dup_instances(self, spark: SparkSession) -> DataFrame:
        """Distinct instance ids demoted so far (the greater side of any
        link) — exactly the batch tier's rn > 1 set at end of stream."""
        df = self._read(spark, self.dups_dir)
        if df is None:
            return spark.createDataFrame([], "id bigint")
        return df.select(F.col("id_b").alias("id")).distinct()


@dataclass(frozen=True)
class ContainmentIngestDedup(IngestDedup):
    """Ingest-time EXACT-CONTAINMENT dedup over a persisted positional-
    shingle store (round 10) — the streaming twin of
    ``queries.dedup.dedup_substring_containment``, completing the
    streaming coverage of every dedup granularity (document, paragraph,
    chunk, and now contiguous substring). Each micro-batch extracts
    positional 3-shingles under the shared law
    (operators.dedup.positional_shingles) and runs the per-offset
    alignment verify (operators.dedup.containment_verify) in three
    directional slices, each emitted exactly once — in the batch where
    the LATER document of the pair arrives:

    * new ⊂ new — the batch-local self case;
    * new ⊂ stored — the batch's shingles probe the store as INNER;
    * stored ⊂ new — the store probes the batch as INNER (a newly
      arrived superstring demotes documents ingested long ago — the
      direction a fingerprint store cannot see).

    Containment needs the INNER side's total shingle count, so the
    store keeps (id, i, sh) plus a per-doc size table; the probe join
    volume is Σ f_new·f_stored over shared shingle VALUES — cost
    concentrates on duplicated spans exactly as in the batch tier (at
    100 TB the store is bucketed by shingle hash and the probe is a
    bucket join). END state equals the batch pair relation bit-for-bit
    (same oracle; checkpoint-restart pinned). Exactly-once via the
    inherited batch=<id> overwrite contract; the sizes store rides the
    docs_dir slot."""

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        from streamprocessing_spark.operators.dedup import (
            containment_verify,
            positional_shingles,
        )

        spark = batch.sparkSession
        pos_new = positional_shingles(
            batch.select(self.id_col, self.text_col), self.id_col, self.text_col
        ).localCheckpoint(eager=True)
        sizes_new = (
            pos_new.groupBy("id")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        stored_pos = self._read(spark, self.buckets_dir, before_batch=batch_id)
        if stored_pos is not None:
            stored_pos = stored_pos.select("id", "i", "sh")
            stored_sizes = self._read(
                spark, self.docs_dir, before_batch=batch_id
            ).select("id", "n")
            pos_outer_all = pos_new.unionByName(stored_pos)
            dups = containment_verify(pos_new, pos_outer_all, sizes_new).unionByName(
                containment_verify(stored_pos, pos_new, stored_sizes)
            )
        else:
            dups = containment_verify(pos_new, pos_new, sizes_new)
        dups.write.mode("overwrite").parquet(f"{self.dups_dir}/batch={batch_id}")
        pos_new.write.mode("overwrite").parquet(f"{self.buckets_dir}/batch={batch_id}")
        sizes_new.write.mode("overwrite").parquet(f"{self.docs_dir}/batch={batch_id}")

    def containment_pairs(self, spark: SparkSession) -> DataFrame:
        """All directional containment pairs emitted so far."""
        df = self._read(spark, self.dups_dir)
        if df is None:
            return spark.createDataFrame(
                [],
                "id_inner bigint, id_outer bigint, "
                "n_occurrences bigint, n_shingles bigint",
            )
        return df.drop("batch")
