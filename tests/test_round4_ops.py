"""Structural properties of the round-2 final-continuation operators
(attribution, time-weighted mean, seasonal anomaly map, k-anonymity,
exact two-factor regression): the invariants the DuckDB oracle
comparison can't express — conservation laws, privacy guarantees,
minimality, and agreement with an independent float solver."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocessing_spark.queries.curation import K_ANON
from streamprocessing_spark.queries.timeseries import ATTR_WINDOW_US
from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


def test_attribution_conserves_revenue(spark, sf_dir):
    """Largest-remainder allocation: per purchase, the attributed cents
    must sum EXACTLY to the purchase amount (floor(value*100+0.5)), the
    shares must differ by at most one cent, and every touch must fall
    strictly inside the 7-day lookback."""
    out = SPECS["attribution_linear_multi_touch"].fn(spark, sf_dir)
    per_purchase = (
        out.groupBy("purchase_event_id")
        .agg(
            F.sum("attributed_cents").alias("total"),
            F.max("attributed_cents").alias("mx"),
            F.min("attributed_cents").alias("mn"),
            F.count(F.lit(1)).alias("n"),
            F.max("n_touches").alias("n_decl"),
        )
        .collect()
    )
    assert per_purchase, "fixture must produce attributed purchases"
    ev = load_table(spark, sf_dir, "events")
    cents = {
        r.event_id: int(r.cents)
        for r in ev.where(F.col("event_type") == "purchase")
        .select("event_id", F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"))
        .collect()
    }
    for r in per_purchase:
        assert r.total == cents[r.purchase_event_id], "revenue must be conserved"
        assert r.mx - r.mn <= 1, "linear split differs by at most one cent"
        assert r.n == r.n_decl, "declared touch count must match actual rows"


def test_attribution_touches_inside_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    out = SPECS["attribution_linear_multi_touch"].fn(spark, sf_dir)
    joined = (
        out.join(ev.withColumnRenamed("us", "pus"), out.purchase_event_id == ev.event_id)
        .drop("event_id")
        .join(
            ev.withColumnRenamed("us", "cus"),
            out.click_event_id == ev.event_id,
        )
    )
    bad = joined.where(
        (F.col("cus") >= F.col("pus")) | (F.col("cus") < F.col("pus") - F.lit(ATTR_WINDOW_US))
    ).count()
    assert bad == 0


def test_time_weighted_avg_bounds(spark, sf_dir):
    """The time-weighted mean must lie within [min, max] of the user's
    observed cents, the rational must reduce to the quotient, and the
    total duration must equal last-minus-first timestamp exactly
    (telescoping of the segment durations)."""
    out = {r.user_id: r for r in SPECS["time_weighted_avg_value"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.floor(F.col("value") * 100.0 + 0.5)).alias("mn"),
            F.max(F.floor(F.col("value") * 100.0 + 0.5)).alias("mx"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("span"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for s in stats:
        if s.n < 2:
            assert s.user_id not in out
            continue
        r = out[s.user_id]
        assert s.mn <= r.twa_cents <= s.mx
        assert r.twa_cents == r.twa_num // r.dur_us_total
        assert r.dur_us_total == s.span, "segment durations must telescope to the span"


def test_seasonal_anomaly_grid_covers_silent_cells(spark, sf_dir):
    """The anomaly map must include zero-count cells ('low' outages the
    raw scan can't see), every flag must satisfy its integer
    cross-multiplication, and no cell may be both high and low."""
    rows = SPECS["seasonal_hour_baseline_anomaly"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.cnt == 0 for r in rows), "dense grid must surface silent cells"
    seen = set()
    for r in rows:
        key = (r.event_type, str(r.day), r.hour)
        assert key not in seen
        seen.add(key)
        if r.flag == "high":
            assert r.cnt * r.n_days > 2 * r.hour_total
        else:
            assert 2 * r.cnt * r.n_days < r.hour_total


def test_k_anonymity_release_guarantee(spark, sf_dir):
    """The REAL k-anonymity property, re-derived from the output alone:
    group the released records by their released QI — every
    non-suppressed class must hold ≥ K actual rows, the reported
    class_size must equal that actual size, suppressed rows (if any)
    must be exactly the sub-K residue at full generalization, and no
    record may be lost or duplicated."""
    rows = SPECS["k_anonymity_generalize"].fn(spark, sf_dir).collect()
    cust_n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == cust_n
    assert len({r.c_custkey for r in rows}) == cust_n
    by_qi: dict[str, int] = {}
    for r in rows:
        key = r.qi_value if not r.suppressed else f"(suppressed)@{r.anon_level}"
        by_qi[key] = by_qi.get(key, 0) + 1
    for r in rows:
        if r.suppressed:
            assert r.anon_level == 3, "suppression only at full generalization"
            assert r.qi_value == "(suppressed)"
            assert r.class_size < K_ANON
        else:
            assert by_qi[r.qi_value] == r.class_size, "reported size must be the release size"
            assert r.class_size >= K_ANON, "released class below k"
    # level diversity is scale-dependent (sf0.001 collapses to one level);
    # the synthetic-fixture test below exercises the multi-level paths.


def test_k_anonymity_promotion_and_suppression(spark, tmp_path):
    """The driver fixtures never trigger the promotion rounds (their
    class structure is benign at every sf — verified), so this test
    constructs the adversarial distribution the fixpoint exists for: a
    25-record nation class that passes level 0 plus a 5-record sibling
    whose naive level-1 release class holds only those 5 records (< K).
    Naive local recoding would publish them 5-anonymous; the operator
    must promote them through levels 2 and 3 and finally SUPPRESS them,
    while an evenly-split segment stays at level 1. Same registered
    query, synthetic parquet trio."""
    import pandas as pd

    reg = pd.DataFrame({"r_regionkey": [0], "r_name": ["R"]})
    nat = pd.DataFrame(
        {"n_nationkey": [0, 1, 2], "n_name": ["A", "B", "C"], "n_regionkey": [0, 0, 0]}
    )
    rows = []
    ck = 0
    for _ in range(25):  # nation A, seg S: level-0 class (25 >= K)
        rows.append((ck, f"c{ck}", 0, 0.0, "S")); ck += 1
    for _ in range(5):  # nation B, seg S: naive level-1 release class of 5
        rows.append((ck, f"c{ck}", 1, 0.0, "S")); ck += 1
    for nk in (1, 2):  # seg T split 15/15: healthy level-1 class of 30
        for _ in range(15):
            rows.append((ck, f"c{ck}", nk, 0.0, "T")); ck += 1
    cust = pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    base = str(tmp_path / "kanon")
    for name, pdf in (("region", reg), ("nation", nat), ("customer", cust)):
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{base}/{name}.parquet"
        )
    out = {r.c_custkey: r for r in SPECS["k_anonymity_generalize"].fn(spark, base).collect()}
    assert len(out) == ck
    for i in range(25):  # A/S stays fully specific
        assert out[i].anon_level == 0 and out[i].qi_value == "A|S"
    for i in range(25, 30):  # B/S climbs the whole lattice and is suppressed
        assert out[i].suppressed == 1 and out[i].anon_level == 3
        assert out[i].qi_value == "(suppressed)" and out[i].class_size == 5
    for i in range(30, 60):  # T releases at region level, 30-anonymous
        assert out[i].anon_level == 1 and out[i].qi_value == "R|T"
        assert out[i].class_size == 30 and out[i].suppressed == 0


def test_cramer_regression_matches_float_solver(spark, sf_dir):
    """The exact rational coefficients must agree with numpy's float
    least-squares to ~1e-9 relative — an INDEPENDENT solver, not a
    replay of the same arithmetic — and the determinant must be
    positive (sign-normalized, non-degenerate design)."""
    import numpy as np

    row = SPECS["regression_two_factor_cramer"].fn(spark, sf_dir).collect()[0]
    det = int(row.det_den)
    assert det > 0
    beta_exact = [int(row.intercept_num) / det, int(row.slope_hour_num) / det, int(row.slope_dow_num) / det]

    ev = load_table(spark, sf_dir, "events").select(
        F.hour("ts").alias("x1"),
        (F.dayofweek("ts") - 1).alias("x2"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("y"),
    )
    pdf = ev.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.to_numpy(float), pdf.x2.to_numpy(float)])
    beta_np, *_ = np.linalg.lstsq(X, pdf.y.to_numpy(float), rcond=None)
    for a, b in zip(beta_exact, beta_np):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b))


def test_observation_metrics_without_extra_scan(spark, sf_dir):
    """df.observe(): production pipelines attach data-quality metrics to
    a query and get them for free at action time — no second scan. The
    observed row count and exact-cents sum over the pre-aggregation
    stream must equal independently computed values, while the query
    result itself is unchanged."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    obs = Observation("li_metrics")
    q = (
        li.observe(obs, F.count(F.lit(1)).alias("rows"), F.sum(cents).alias("cents"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.l_returnflag: r.n for r in q.collect()}
    m = obs.get
    exp = li.agg(
        F.count(F.lit(1)).alias("rows"), F.sum(cents).alias("cents")
    ).first()
    assert m["rows"] == exp.rows and m["cents"] == exp.cents
    assert sum(got.values()) == exp.rows


def test_except_all_bag_arithmetic(spark, sf_dir):
    """Multiset law: multiplicity of each (user, type) in the output
    must equal max(0, first-half count − second-half count)."""
    out = SPECS["set_except_all_multiset"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    firsts = {
        (r.user_id, r.event_type): r.n
        for r in ev.where(day < F.lit("2024-01-16").cast("date"))
        .groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    seconds = {
        (r.user_id, r.event_type): r.n
        for r in ev.where(day >= F.lit("2024-01-16").cast("date"))
        .groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got: dict[tuple, int] = {}
    for r in out:
        got[(r.user_id, r.event_type)] = got.get((r.user_id, r.event_type), 0) + 1
    for k in set(firsts) | set(seconds):
        want = max(0, firsts.get(k, 0) - seconds.get(k, 0))
        assert got.get(k, 0) == want, k
    assert got, "bag difference must be non-empty on the fixture"


def test_recursive_cte_shared_text_and_payoff_law(spark, sf_dir):
    """The recursive CTE schedule: every chain must start at the
    customer's cents balance, strictly decrease after the first period
    (payment > interest at fixture balances), and end at exactly 0
    (payoff) — re-simulated in pure Python from the same recurrence.
    Also assert the Spark query text IS the oracle text (verbatim
    sharing, the point of the operator)."""
    from streamprocessing_spark.queries.analytics import RECURSIVE_AMORTIZATION_SQL

    assert SPECS["recursive_cte_amortization"].oracle == RECURSIVE_AMORTIZATION_SQL
    rows = SPECS["recursive_cte_amortization"].fn(spark, sf_dir).collect()
    chains: dict[int, dict[int, int]] = {}
    for r in rows:
        chains.setdefault(r.c_custkey, {})[r.period] = r.balance_cents
    cust = {
        r.c_custkey: int(r.cents)
        for r in load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .collect()
    }
    assert set(chains) == set(cust)
    for ck, chain in chains.items():
        bal, period = cust[ck], 0
        assert chain[0] == bal
        while bal > 0 and period < 90:
            import math

            nxt = bal + int(math.floor(bal / 100.0)) - 50000
            bal = max(0, nxt)
            period += 1
            assert chain[period] == bal, (ck, period)
        assert len(chain) == period + 1, "no rows past payoff"
        assert chain[max(chain)] == 0, "every fixture chain pays off"


def test_variant_missing_path_and_types(spark, sf_dir):
    """VARIANT semantics: a missing path extracts as NULL (not an
    error), and typed extraction enforces the requested type."""
    row = spark.sql(
        """SELECT variant_get(parse_json('{"a": 7}'), '$.missing', 'bigint') AS m,
                  variant_get(parse_json('{"a": 7}'), '$.a', 'string') AS s,
                  is_variant_null(parse_json('null')) AS vn"""
    ).first()
    assert row.m is None and row.s == "7" and row.vn is True
    out = SPECS["variant_props_rollup"].fn(spark, sf_dir).collect()
    assert {r.variant_schema for r in out} == {
        "OBJECT<c: BIGINT, p: OBJECT<k: BIGINT>, t: STRING>"
    }


def test_collation_bounds(spark, sf_dir):
    """The manufactured mixed-case column: case-insensitive distinct
    must be ≤ binary distinct ≤ 2× (each CI class has at most the two
    manufactured casings)."""
    r = SPECS["collation_case_insensitive_stats"].fn(spark, sf_dir).first()
    assert r.n_distinct_ci <= r.n_distinct_binary <= 2 * r.n_distinct_ci
    assert r.n_distinct_binary > r.n_distinct_ci, "fixture must manufacture case variants"


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """The SQL UDF must be invisible in the physical plan (inlined
    Catalyst expression — no python worker, no BatchEvalPython): the
    aggregate runs as a plain JVM HashAggregate."""
    from streamprocessing_spark.plans import explain as X

    df = SPECS["sql_udf_pricing"].fn(spark, sf_dir)
    plan = X.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, plan
    assert "HashAggregate" in plan  # plain JVM aggregate, UDF fully inlined
