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


def test_hll_sketch_rollup_merge_correctness(spark, sf_dir):
    """The union of per-day register tables must (a) land within HLL
    tolerance of the exact distinct count (m=256 → sigma ~6.5%; linear
    counting handles the small range) and (b) estimate EXACTLY what a
    single-pass sketch over the same rows estimates — merging loses
    nothing (the property that makes materialized per-partition register
    tables answer any later rollup). Also asserts the exact audit column
    the query carries matches the exact query."""
    from streamprocessing_spark.queries.analytics import _hll_estimate, _hll_registers

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n_users
        for r in SPECS["distinct_users_per_type"].fn(spark, sf_dir).collect()
    }
    res = SPECS["hll_sketch_rollup_users"].fn(spark, sf_dir).collect()
    rolled = {r.event_type: r.n_users_est for r in res}
    carried_exact = {r.event_type: r.n_users_exact for r in res}
    single = {
        r.event_type: r.n_users_est
        for r in _hll_estimate(_hll_registers(ev, "event_type")).collect()
    }
    assert set(exact) == set(rolled)
    for k, v in exact.items():
        assert carried_exact[k] == v, (k, v, carried_exact[k])
        assert abs(rolled[k] - v) <= max(0.3 * v, 5), (k, v, rolled[k])
        assert rolled[k] == single[k], (k, rolled[k], single[k])
