"""Skew-join strategy bench: naive sort-merge vs AQE skew-join vs salting.

ROADMAP item "salted-vs-unsalted skew join wall clock at sf1+": the sf0.1
correctness test (tests/test_upsert_sink.py) proves the three strategies
agree; this tool measures whether the mitigation WINS, on data big enough
for one hot key to dominate a reducer.

Deterministic workload (no RNG), built once on disk so every variant reads
identical input:
- fact: REPLICAS x lineitem(sf0.1) rows (~12M). Join key: ~HOT_PCT of rows
  (chosen by md5-derived hash of the row id, not position) collapse onto
  key 0; the rest spread over NKEYS keys. This is the canonical "one
  customer is 30% of traffic" shape.
- dim: NKEYS + 1 small rows — but broadcast is DISABLED for the naive and
  AQE variants (autoBroadcastJoinThreshold=-1) to force the shuffle join
  that skew actually breaks; real dims are often too big to broadcast.

Variants (same logical join + aggregation, forced end-to-end with a noop
write):
- naive : AQE skew-join OFF -> classic SMJ; the hot key's rows land on ONE
  reducer task, wall clock ~= that task.
- aqe   : AQE skew-join ON (lowered thresholds so the 10x-scale proxy
  qualifies) -> the hot partition is split into parallel sub-tasks at
  runtime. Zero code changes — the reason AQE stays on in session.py.
- salted: explicit 32-way salting — fact rows get a deterministic salt,
  the dim side is exploded x32, join key becomes (key, salt). The manual
  fallback when AQE can't help (e.g. skewed AGGREGATION feeding the join,
  or pre-3.0 engines).

Prints one JSON line {"naive_s": ..., "aqe_s": ..., "salted_s": ...,
"rows": N} and asserts all three variants return identical aggregates.

Usage: python tools/skew_bench.py [--base /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streamprocessing_spark.session import get_spark  # noqa: E402

REPLICAS = 40
NKEYS = 1000
SALTS = 32
HOT_NUM, HOT_DEN = 3, 10  # ~30% of fact rows on key 0
WORK_DIR = str(Path(__file__).resolve().parent.parent / ".skewbench")


def build(spark, base: str) -> None:
    li = spark.read.parquet(f"{base}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    parts = []
    for k in range(REPLICAS):
        parts.append(
            li.withColumn("rep", F.lit(k)).withColumn(
                "rid",
                F.col("l_orderkey") * 10000 + F.col("l_linenumber") * 100 + F.lit(k),
            )
        )
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p)
    # md5-derived hot-key choice: ~30% of rows, independent of layout
    h = F.conv(F.substring(F.md5(F.col("rid").cast("string")), 1, 8), 16, 10).cast("long")
    fact = fact.select(
        F.when(h % HOT_DEN < HOT_NUM, F.lit(0))
        .otherwise((F.col("rid") % NKEYS) + 1)
        .alias("k"),
        # integral in TPC-H; kept as long so the checksum is
        # accumulation-order-independent across join strategies
        F.col("l_quantity").cast("long").alias("q"),
        F.col("rid"),
    )
    fact.repartition(32).write.mode("overwrite").parquet(f"{WORK_DIR}/fact.parquet")
    dim = spark.range(0, NKEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("w")
    )
    dim.coalesce(1).write.mode("overwrite").parquet(f"{WORK_DIR}/dim.parquet")


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _agg(joined):
    # integer checksum: identical across join strategies regardless of
    # row order (a double sum would differ by accumulation order)
    return joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("q") * F.col("w")).cast("long")).alias("s"),
    )


def run_variant(spark, variant: str) -> tuple[float, int]:
    fact = spark.read.parquet(f"{WORK_DIR}/fact.parquet")
    dim = spark.read.parquet(f"{WORK_DIR}/dim.parquet")
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if variant == "aqe":
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    else:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    if variant == "salted":
        # murmur3 of the row id: deterministic, per-row-uniform salt
        fact = fact.withColumn("salt", F.pmod(F.hash("rid"), F.lit(SALTS)).cast("int"))
        dim = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALTS - 1)))
        ).withColumn("salt", F.col("salt").cast("int"))
        joined = fact.join(dim, ["k", "salt"])
    else:
        joined = fact.join(dim, "k")
    t0 = time.time()
    row = _agg(joined).collect()[0]
    dt = time.time() - t0
    return dt, (row.n, float(row.s))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark()
    build(spark, args.base)
    results, checks = {}, {}
    # warm the file-system cache so variant order doesn't matter
    _noop_write(spark.read.parquet(f"{WORK_DIR}/fact.parquet"))
    for variant in ("naive", "aqe", "salted"):
        dt, chk = run_variant(spark, variant)
        results[f"{variant}_s"] = round(dt, 2)
        checks[variant] = chk
    assert checks["naive"] == checks["aqe"] == checks["salted"], checks
    results["rows"] = checks["naive"][0]
    results["checksum"] = checks["naive"][1]
    print(json.dumps(results))
    shutil.rmtree(WORK_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
