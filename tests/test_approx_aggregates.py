"""Error bounds for the approximate aggregates (the constant-memory scale
paths): HLL distinct counts and KLL/GK approximate percentiles must land
within their advertised tolerance of the exact tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


def test_hll_distinct_within_rsd(spark, sf_dir):
    exact = {
        r.event_type: r.n_users
        for r in SPECS["distinct_users_per_type"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in SPECS["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        # rsd=0.02 configured; allow 4 sigma
        assert abs(approx[k] - v) <= max(4 * 0.02 * v, 2), (k, v, approx[k])


def test_approx_percentile_close_to_exact(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    rows = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(c_acctbal, 0.5, 10000)").alias("approx_p50"),
    ).collect()
    for r in rows:
        spread = abs(r.exact_p50) + 1
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * spread, r
