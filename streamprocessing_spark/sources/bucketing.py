"""Bucketed table layout — the co-located-join storage path.

At 100 TB the dominant cost of a fact-fact join (orders × lineitem,
events × events) is the shuffle of both sides. Bucketing removes it:
``bucketBy(n, key)`` hash-partitions FILES by the join key at WRITE
time, so a later join on that key is bucket-to-bucket — Spark's scan
reports the hashed output partitioning and the planner elides both
Exchanges (and, with ``sortBy``, both Sorts). The one-time write cost
is amortized over every subsequent join/aggregation on the key — the
standard layout for a fact table that is repeatedly joined on its key,
and the Spark-native analogue of the reference's HyDFS partition
placement (SURVEY.md §2.1 O8: hash repartition is RainStorm's only
physical layout primitive; bucketing is the same hash placement made
durable).

Bucketed tables live in the session catalog (saveAsTable) because the
bucketing metadata does — plain ``.parquet(path)`` writes cannot record
it. tests/test_bucketing.py asserts the zero-Exchange plan property.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table in the session catalog. Sorting by the bucket key lets
    a sort-merge join skip its Sort as well — the fully pre-arranged
    layout. Pass ``path`` to create the table EXTERNAL at that location:
    the in-memory catalog dies with the session but a managed table's
    warehouse directory does not, so a second session writing the same
    managed name hits 'location already exists' — an explicit
    session-scoped path sidesteps the mismatch."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
