"""Reference-derived operator queries (SURVEY.md §2.2) bound to the driver's
test tables, each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_spark.operators import core as ops
from streamprocessing_spark.registry import register
from streamprocessing_spark.sources.readers import load_table


@register(
    "source_scan",
    oracle="""
    SELECT 'documents:' || CAST(doc_id AS VARCHAR) AS key, text AS value
    FROM documents
    """,
    tags=("reference", "source"),
)
def source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 (rainstorm/server.go:411-448): keyed source scan with
    deterministic per-row keys."""
    return ops.source_scan(load_table(spark, sf_dir, "documents"), "documents", "doc_id", "text")


@register(
    "filter_contains",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%AND%'
    """,
    tags=("reference", "filter"),
)
def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 (ops/app1op1/app1op1.go:9-18): substring filter, pushed into the
    parquet scan."""
    df = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type")
    return ops.filter_contains(df, "p_type", "AND")


@register(
    "project_columns",
    oracle="""
    SELECT o_orderkey AS key, o_orderpriority AS value FROM orders
    """,
    tags=("reference", "project"),
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (ops/app1op2/app1op2.go:10-19): projection + re-key; columnar
    scans make this pure column pruning."""
    return ops.project_columns(
        load_table(spark, sf_dir, "orders"), {"key": "o_orderkey", "value": "o_orderpriority"}
    )


@register(
    "filter_equality_project",
    oracle="""
    SELECT o_orderkey AS key, o_custkey AS custkey
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
    tags=("reference", "filter"),
)
def filter_equality_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 (ops/app2op1/app2op1.go:10-22): equality filter + projection."""
    return ops.filter_equality_project(
        load_table(spark, sf_dir, "orders"),
        "o_orderstatus",
        "F",
        {"key": "o_orderkey", "custkey": "o_custkey"},
    )


@register(
    "count_by_key",
    oracle="""
    SELECT l_returnflag AS key, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("reference", "aggregate"),
)
def count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (rainstorm/server.go:344-355): keyed count; map-side partial agg
    keeps the shuffle O(distinct keys)."""
    df = load_table(spark, sf_dir, "lineitem").select(F.col("l_returnflag").alias("key"))
    return ops.count_by_key(df, "key", out="cnt")


@register(
    "flatmap_explode",
    oracle="""
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM documents
    """,
    tags=("reference", "flatmap"),
)
def flatmap_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 (rainstorm/server.go:356-361): 1→N flatMap via explode — stays in
    whole-stage codegen, no Python boundary."""
    return ops.flatmap_tokens(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "repartition_by_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    """,
    tags=("reference", "partitioning"),
)
def repartition_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 (rainstorm/server.go:376-408): explicit hash partitioning; content
    is unchanged (the oracle checks that), placement is by hash(key)."""
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    return ops.repartition_by_key(df, 32, "l_orderkey")


@register(
    "dedup_by_id",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("reference", "dedup"),
)
def dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 (rainstorm/server.go:292-298): at-least-once delivery simulated by
    doubling the input; dedup-by-id restores exactly-once. event_id is
    unique in the fixture, so the result must equal the original table."""
    df = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return ops.dedup_by_id(df.unionByName(df), ["event_id"])


@register(
    "app1_pipeline",
    oracle="""
    SELECT doc_id AS objectid, source AS sign_type
    FROM documents
    WHERE text LIKE '%spark%'
    """,
    tags=("reference", "pipeline"),
)
def app1_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """App1 end-to-end (SURVEY.md §5): substring filter → projection/re-key.
    Catalyst fuses both into one scan stage with the predicate pushed down."""
    df = load_table(spark, sf_dir, "documents")
    filtered = ops.filter_contains(df, "text", "spark")
    return ops.project_columns(filtered, {"objectid": "doc_id", "sign_type": "source"})


@register(
    "app2_pipeline",
    oracle="""
    SELECT o_orderpriority AS category, count(*) AS cnt
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("reference", "pipeline"),
)
def app2_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """App2 end-to-end (SURVEY.md §5): equality filter → keyed count.
    The reference hand-ordered the filter before the count
    (ops/app2op1/app2op1.go:18); Catalyst would do that pushdown anyway."""
    df = load_table(spark, sf_dir, "orders")
    projected = ops.filter_equality_project(
        df, "o_orderstatus", "F", {"category": "o_orderpriority"}
    )
    return ops.count_by_key(projected, "category", out="cnt")
