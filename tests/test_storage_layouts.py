"""Storage-layout scale patterns: bucketed co-located joins (no shuffle)
and partitioned writes with partition pruning. These are the physical
designs SCALE.md prescribes for 100 TB; asserted here on real (small)
tables so the plans are proven, not just described."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from streamprocessing_spark.plans import explain as X
from streamprocessing_spark.sources.readers import load_table


@pytest.fixture()
def bucketed_tables(spark):
    """warehouse.dir is a static conf — use the session default (cwd
    ./spark-warehouse, gitignored) and drop the tables afterwards."""
    yield
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_avoids_shuffle(spark, sf_dir, bucketed_tables):
    """Both fact tables bucketed on the join key → sort-merge join with
    ZERO exchanges: the co-located join layout for repeated 100 TB joins."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("t_orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("t_lineitem_b")
    ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    assert X.count_exchanges(joined) == 0, X.formatted_plan(joined)
    # and it still computes the right thing
    expected = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_partitioned_write_prunes_partitions(spark, sf_dir):
    """Writing events partitioned by event_type: a type-filtered read must
    list only the matching partition directory (partition pruning — the
    layout analogue of predicate pushdown)."""
    out = tempfile.mkdtemp(prefix="sp_part_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
        rd = spark.read.parquet(out).where(F.col("event_type") == "purchase")
        plan = X.formatted_plan(rd)
        assert "PartitionFilters" in plan and "event_type" in plan, plan
        expected = ev.where(F.col("event_type") == "purchase").count()
        assert rd.count() == expected
    finally:
        shutil.rmtree(out, ignore_errors=True)
