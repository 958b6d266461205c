"""Scale-adaptive fan-out for hash/explode-heavy map pipelines.

The dedup/text tiers do orders of magnitude more per-row work than a
plain scan (tokenize, k-shingle explode, md5-derived minhashing), and
ALL of it runs before the pipeline's first shuffle — i.e. at the
parallelism of the file scan. Parquet splits by row group, so a
single-row-group input (every local fixture; any small cluster table)
pins the whole pre-aggregation chain to ONE core while the other 31
idle (guide §2: stragglers are a partitioning property, not a data
property).

``fan_out`` hash-repartitions the SOURCE relation on its id column
(pre-explode, so the shuffled bytes are the small side of the
expansion) up to the session's default parallelism — but only when the
input actually carries fewer partitions than that, so on a real
cluster where the scan already yields >= cores splits it is a plan
no-op and costs nothing. Hash (not round-robin) partitioning because
``repartition(n)`` triggers Spark's determinism sort
(spark.sql.execution.sortBeforeRepartition): every row — including
the full document text — is sorted within each input partition before
redistribution, which measurably taxes the light consumers; keyed
hash partitioning is deterministic without the sort, and doc ids are
unique so it balances. The explicit partition count keeps AQE from
coalescing the tiny exchange back to one partition (its advisory
target is byte-, not CPU-, based). Derived from runtime facts (input
split count, ``defaultParallelism``), never a constant tuned for
either local mode or the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def fan_out(df: DataFrame, key: Column | str) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to the session's default
    parallelism iff it has fewer partitions than that; identity for
    streaming relations (their micro-batch planner re-derives
    partitioning every trigger)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_parts >= target:
        return df
    return df.repartition(target, key)
