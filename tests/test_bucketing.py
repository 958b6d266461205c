"""Bucketed-layout plan properties: a join (and aggregation) on the
bucket key must run with ZERO shuffle Exchanges — the storage-level
shuffle elimination that makes repeated fact-fact joins affordable at
100 TB (sources/bucketing.py)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from streamprocessing_spark.plans import explain as X
from streamprocessing_spark.sources.bucketing import write_bucketed
from streamprocessing_spark.sources.readers import load_table


def test_bucketed_join_and_agg_have_no_shuffle(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_line = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
            t_orders,
            ["o_orderkey"],
            8,
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
            t_line,
            ["l_orderkey"],
            8,
            sort_cols=["l_orderkey"],
        )
        o, li = spark.table(t_orders), spark.table(t_line)
        # hint forces sort-merge (a broadcast of the small test side would
        # trivially show zero Exchanges and prove nothing about bucketing)
        joined = (
            o.hint("merge")
            .join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert X.count_exchanges(joined) == 0, X.formatted_plan(joined)

        # and the co-located plan returns the same rows as the plain scan
        plain = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_line}")


def test_bucketed_groupby_alone_has_no_shuffle(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t = f"b_line_{suffix}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
            t,
            ["l_orderkey"],
            8,
        )
        agg = spark.table(t).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert X.count_exchanges(agg) == 0, X.formatted_plan(agg)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
