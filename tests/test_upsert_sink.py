"""foreachBatch upsert sink + AQE skew handling — the two production
patterns SCALE.md prescribes that aren't expressible as oracle queries."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessing_spark.sources.readers import load_table

def _latest_w():
    # built lazily: Column construction needs the JVM, absent at import
    return Window.partitionBy("user_id").orderBy(F.desc("event_id"))


def test_foreachbatch_upsert_latest_per_key(spark, sf_dir):
    """Changelog → keyed table via foreachBatch: each micro-batch merges
    into a latest-per-key parquet state (read-modify-overwrite; at scale a
    Delta/Iceberg MERGE). Batch ids make the writer idempotent under
    micro-batch retry. End state must equal the batch latest-per-key
    compaction over the whole stream."""
    base = tempfile.mkdtemp(prefix="sp_upsert_")
    table = f"{base}/state"
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")

        def upsert(batch_df, batch_id):
            batch_latest = (
                batch_df.withColumn(
                    "rn",
                    F.row_number().over(_latest_w()),
                )
                .where(F.col("rn") == 1)
                .drop("rn")
            )
            if os.path.exists(table):
                current = batch_df.sparkSession.read.parquet(table)
                merged = (
                    current.unionByName(batch_latest)
                    .withColumn(
                        "rn",
                        F.row_number().over(_latest_w()),
                    )
                    .where(F.col("rn") == 1)
                    .drop("rn")
                )
            else:
                merged = batch_latest
            # write-then-swap: never read and overwrite the same path in
            # one job (the read is lazy)
            tmp = f"{table}.tmp{batch_id}"
            merged.write.mode("overwrite").parquet(tmp)
            if os.path.exists(table):
                shutil.rmtree(table)
            os.rename(tmp, table)

        from conftest import stage_single_file_chunks

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage_single_file_chunks(ev, base, n_chunks=2))
        )
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        expected = (
            ev.withColumn("rn", F.row_number().over(_latest_w()))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        got = spark.read.parquet(table)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_aqe_splits_skewed_join(spark, sf_dir):
    """A pathologically hot join key is split by AQE's skew-join handling
    (thresholds lowered to trigger at test scale); the join result must be
    identical to the unskewed-machinery result."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # hot key: every lineitem row mapped to key 0; a few cold keys
        li = load_table(spark, sf_dir, "lineitem").select(
            F.when(F.col("l_linenumber") == 1, F.col("l_orderkey") % 5).otherwise(0).alias("k"),
            "l_quantity",
        )
        dim = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = li.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("l_quantity") * F.col("w")), 2).alias("s")
        )
        row = joined.first()
        expected = (
            li.join(dim.hint("broadcast"), "k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("l_quantity") * F.col("w")), 2).alias("s"),
            )
            .first()
        )
        assert row.n == expected.n
        # the weighted sum catches row-content corruption (dup/drop with a
        # compensating count would still differ here); rounded to absorb
        # accumulation-order differences between the two plans
        assert row.s == expected.s
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_foreachbatch_cdc_merge_with_deletes(spark, sf_dir):
    """Delete-aware streaming MERGE: the events changelog streams in
    time-ordered micro-batches against the customer base ('error' =
    DELETE, else UPSERT in cents — the cdc_apply_changes contract).
    Deletes are TOMBSTONES in the keyed state (production retention
    pattern), so a later batch can re-upsert a deleted key and the
    change counter survives; the serving read filters tombstones. End
    state must equal the registered batch query cdc_apply_changes
    exactly — streaming and batch MERGE converge."""
    import tempfile

    from streamprocessing_spark.registry import all_specs

    base = tempfile.mkdtemp(prefix="sp_cdcmerge_")
    table = f"{base}/state"
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "ts",
            F.col("user_id").alias("c_custkey"),
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("new_cents"),
        )
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("balance_cents"),
        )
        cust.select(
            "c_custkey",
            "balance_cents",
            F.lit(0).cast("long").alias("n_changes"),
            F.lit(True).alias("in_base"),
            F.lit(False).alias("deleted"),
        ).write.mode("overwrite").parquet(table)

        def merge(batch_df, batch_id):
            w = Window.partitionBy("c_custkey").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
            b = (
                batch_df.withColumn("rn", F.row_number().over(w))
                .withColumn(
                    "batch_changes",
                    F.count(F.lit(1)).over(Window.partitionBy("c_custkey")),
                )
                .where(F.col("rn") == 1)
                .select("c_custkey", "op", "new_cents", "batch_changes")
            )
            cur = batch_df.sparkSession.read.parquet(table).alias("s")
            merged = cur.join(b.alias("b"), "c_custkey", "full_outer").select(
                "c_custkey",
                F.when(F.col("b.op") == "U", F.col("b.new_cents"))
                .when(F.col("b.op") == "D", F.lit(None).cast("long"))
                .otherwise(F.col("s.balance_cents"))
                .alias("balance_cents"),
                (
                    F.coalesce(F.col("s.n_changes"), F.lit(0))
                    + F.coalesce(F.col("b.batch_changes"), F.lit(0))
                ).cast("long").alias("n_changes"),
                F.coalesce(F.col("s.in_base"), F.lit(False)).alias("in_base"),
                F.when(F.col("b.op") == "D", F.lit(True))
                .when(F.col("b.op") == "U", F.lit(False))
                .otherwise(F.col("s.deleted"))
                .alias("deleted"),
            )
            tmp = f"{table}.tmp{batch_id}"
            merged.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(table)
            os.rename(tmp, table)

        # chunk into two TIME slices (event_id is assigned in ts order in
        # the fixture), so the replay is an ordered changelog tail
        n_ev = ev.count()
        src = f"{base}/src"
        os.makedirs(src, exist_ok=True)
        for i in range(2):
            d = f"{base}/chunk{i}"
            half = ev.where(
                ((F.col("event_id") * 2) >= n_ev).cast("int") == i
            )
            half.coalesce(1).write.mode("overwrite").parquet(d)
            part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
            shutil.copyfile(f"{d}/{part}", f"{src}/c{i}.parquet")

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        served = (
            spark.read.parquet(table)
            .where(~F.col("deleted"))
            .select(
                "c_custkey",
                "balance_cents",
                F.when(~F.col("in_base"), F.lit("inserted"))
                .when(F.col("n_changes") == 0, F.lit("unchanged"))
                .otherwise(F.lit("updated"))
                .alias("status"),
                "n_changes",
            )
        )
        got = {
            (r.c_custkey, r.balance_cents, r.status, r.n_changes)
            for r in served.collect()
        }
        want = {
            (r.c_custkey, r.balance_cents, r.status, r.n_changes)
            for r in all_specs()["cdc_apply_changes"].fn(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
