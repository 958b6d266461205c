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
    exact = {
        r.c_mktsegment: (r.p50, r.p95)
        for r in SPECS["percentiles_by_segment"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.c_mktsegment: (r.p50_approx, r.p95_approx)
        for r in SPECS["approx_percentiles_by_segment"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, (e50, e95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - e50) <= 0.05 * (abs(e50) + 1), (k, e50, a50)
        assert abs(a95 - e95) <= 0.05 * (abs(e95) + 1), (k, e95, a95)
