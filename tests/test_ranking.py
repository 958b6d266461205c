"""operators/ranking — the distributed global rank must reproduce the
single-window row_number/ntile numbers bit-for-bit (the oracle queries
rfm_customer_segments / bot_rate_flags depend on exactly this equality)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streamprocessing_spark.operators.ranking import global_row_number, ntile_from_rank


def _fixture(spark, n=997):
    # non-unique metric (forces tiebreak to matter) + unique id
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("metric"),
    )


def test_global_row_number_matches_window(spark):
    df = _fixture(spark)
    order = [F.desc("metric"), F.asc("id")]
    got = global_row_number(df, order, out="rk")
    want = df.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
    assert got.columns != [] and set(got.columns) == set(want.columns)
    diff = got.exceptAll(want)
    assert diff.count() == 0, diff.limit(5).collect()


@pytest.mark.slow
def test_ntile_from_rank_matches_sql_ntile(spark):
    # N values that exercise remainder handling: divisible, remainder 1-3,
    # and N < tiles (empty trailing buckets)
    for n in (3, 16, 17, 18, 19, 97):
        df = _fixture(spark, n)
        order = [F.desc("metric"), F.asc("id")]
        nt = df.agg(F.count(F.lit(1)).alias("nu"))
        got = (
            global_row_number(df, order, out="rk")
            .crossJoin(F.broadcast(nt))
            .select("id", ntile_from_rank(F.col("rk"), F.col("nu"), 4).alias("t"))
        )
        want = df.select(
            "id", F.ntile(4).over(Window.orderBy(*order)).cast("long").alias("t")
        )
        assert got.exceptAll(want).count() == 0, n


def test_ranked_output_preserves_all_rows_and_uniqueness(spark):
    df = _fixture(spark)
    got = global_row_number(df, [F.desc("metric"), F.asc("id")], out="rk")
    n = df.count()
    ranks = [r.rk for r in got.select("rk").collect()]
    assert sorted(ranks) == list(range(1, n + 1))
