"""Core dataflow operators — the reference's operator inventory, Spark-first.

The reference (SatyamS17/StreamProcessing) runs a fixed SOURCE→OP1→OP2
pipeline where each op is an external executable forked per record and its
stdout line-count selects filter / stateful-count / flatMap semantics
(rainstorm/server.go:282-370). Here every operator is a declarative
DataFrame transformation: Catalyst fuses them into whole-stage-codegen'd
stages, pushes filters into the scan, and prunes columns — none of which
the reference can do.

Scale notes are in each docstring: these run identically on local[32] and
on a 1000-executor cluster; the only knobs are partition counts and
broadcast thresholds, both handled by AQE.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_scan(df: DataFrame, source_label: str, id_col: str, value_col: str) -> DataFrame:
    """Keyed source scan: emit ``(key, value)`` with a deterministic key.

    Reference: the source task reads a HyDFS file line-by-line and emits
    ``Record{uuid, "<file>:<lineNo>", line}`` (rainstorm/server.go:411-448).
    Line numbers are only meaningful for a single byte stream; at 100 TB the
    stable analogue is a key derived from the data itself (here: the row's
    unique id; for raw text files, file path + byte offset). Using a data
    key keeps the scan embarrassingly parallel — no global line numbering
    pass, no zipWithIndex barrier.
    """
    return df.select(
        F.concat(F.lit(source_label), F.lit(":"), F.col(id_col).cast("string")).alias("key"),
        F.col(value_col).alias("value"),
    )


def filter_contains(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """Substring-predicate filter.

    Reference: app1 op1 emits the record iff the value contains the pattern
    (ops/app1op1/app1op1.go:9-18) — one fork/exec per record. Here it is a
    single Catalyst ``Contains`` predicate, pushed into the parquet scan
    (shows under PushedFilters), so non-matching row groups are skipped via
    min/max + dictionary stats.
    """
    return df.filter(F.col(column).contains(pattern))


def project_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Projection with rename — ``{out_name: in_col}``.

    Reference: app1 op2 re-parses the CSV value and emits (col2, col3)
    (ops/app1op2/app1op2.go:10-19), re-keying the stream. Columnar input
    makes this a zero-cost column pruning: the scan never materializes the
    other columns.
    """
    return df.select(*[F.col(src).alias(dst) for dst, src in mapping.items()])


def filter_equality_project(
    df: DataFrame, eq_col: str, eq_value, out_cols: Mapping[str, str]
) -> DataFrame:
    """Equality filter + projection (reference app2 op1,
    ops/app2op1/app2op1.go:10-22: ``col6 == pattern → emit (col8, 1)``).
    Equality predicates are the best case for pushdown: parquet dictionary
    and min/max pruning can skip whole row groups."""
    return df.filter(F.col(eq_col) == F.lit(eq_value)).select(
        *[F.col(src).alias(dst) for dst, src in out_cols.items()]
    )


def count_by_key(df: DataFrame, key: str | Sequence[str], out: str = "cnt") -> DataFrame:
    """Grouped count — the reference's only aggregate.

    Reference: the framework keeps ``state[key] += 1`` in memory and emits
    the running count per input (rainstorm/server.go:344-355), recovering
    state by WAL replay. Batch semantics are the final counts; the true
    streaming equivalent (update-mode emission per input) lives in
    streaming/keyed_count.py. Spark computes this with a partial (map-side)
    aggregate before the shuffle, so bytes shuffled are O(distinct keys),
    not O(rows) — the property that makes it survive 100 TB.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def flatmap_tokens(df: DataFrame, id_col: str, text_col: str, out: str = "word") -> DataFrame:
    """1→N transform (flatMap): explode a text column into tokens.

    Reference: an op whose stdout has N≥2 lines fans out into N/2 records
    (rainstorm/server.go:356-361). ``explode`` is the declarative flatMap —
    no Python boundary, stays inside whole-stage codegen.
    """
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.explode(F.filter(toks, lambda x: x != F.lit(""))).alias(out),
    )


def repartition_by_key(df: DataFrame, num_partitions: int, key: str) -> DataFrame:
    """Hash repartition by key.

    Reference: every record is routed to task ``fnv1a(key) % numTasks`` by
    one RPC per record (rainstorm/server.go:376-408). Spark's HashPartitioner
    moves whole compressed blocks instead. Note: any groupBy/join already
    hash-partitions implicitly — an explicit repartition is only worth a
    shuffle when several downstream ops reuse the same partitioning.
    """
    return df.repartition(num_partitions, F.col(key))


def dedup_by_id(df: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """Exact dedup by id — the reference's exactly-once dedup
    (rainstorm/server.go:292-298: drop record if UUID already seen; its
    dedup set grows unboundedly, SURVEY.md §4.3.4). Batch: a shuffle on the
    id; streaming: ``withWatermark().dropDuplicates()`` bounds the state.
    """
    return df.dropDuplicates(list(id_cols))
