"""Error bounds for the approximate aggregates (the constant-memory scale
paths): HLL distinct counts and KLL/GK approximate percentiles must land
within their advertised tolerance of the exact tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


@pytest.mark.slow
def test_hll_distinct_within_rsd(spark, sf_dir):
    """The promoted row carries the exact count + a 5% tolerance flag;
    both must hold, and the exact audit column must equal the exact
    tier's answer."""
    exact = {
        r.event_type: r.n_users
        for r in SPECS["distinct_users_per_type"].fn(spark, sf_dir).collect()
    }
    rows = SPECS["approx_distinct_users"].fn(spark, sf_dir).collect()
    assert set(exact) == {r.event_type for r in rows}
    for r in rows:
        assert r.n_users_exact == exact[r.event_type]
        assert r.approx_within_5pct, r


@pytest.mark.slow
def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The promoted row asserts the GK rank guarantee (returned element
    is a true discrete p-quantile) per segment; n_vals must equal the
    segment's non-null count."""
    c = load_table(spark, sf_dir, "customer")
    n_by_seg = {
        r.c_mktsegment: r.n
        for r in c.groupBy("c_mktsegment").agg(F.count("c_acctbal").alias("n")).collect()
    }
    rows = SPECS["approx_percentiles_by_segment"].fn(spark, sf_dir).collect()
    assert set(n_by_seg) == {r.c_mktsegment for r in rows}
    for r in rows:
        assert r.n_vals == n_by_seg[r.c_mktsegment]
        assert r.p50_valid and r.p95_valid, r


@pytest.mark.slow
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
