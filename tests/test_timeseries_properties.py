"""Independent verification of the time-series / layout / graph
operators: pure-Python reference implementations recompute each result
from the raw tables — a SECOND oracle, independent of both Spark and
DuckDB, plus structural invariants the value-hash comparison can't
express (antichain-ness, disjointness, exact order statistics)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()


def test_interval_merge_matches_python_reference(spark, sf_dir):
    rows = _events(spark, sf_dir)
    by_user = defaultdict(list)
    for r in rows:
        s = int(r.ts.timestamp() * 1_000_000)
        e = s + (60 + r.event_id % 240) * 1_000_000
        by_user[r.user_id].append((s, r.event_id, e))
    expected = set()
    for uid, ivs in by_user.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][2], 1
        for s, _eid, e in ivs[1:]:
            if s <= cur_e:  # touching merges
                cur_e, n = max(cur_e, e), n + 1
            else:
                expected.add((uid, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        expected.add((uid, cur_s, cur_e, n))
    got = {
        (
            r.user_id,
            int(r.interval_start.timestamp() * 1_000_000),
            int(r.interval_end.timestamp() * 1_000_000),
            r.n_merged,
        )
        for r in SPECS["merge_overlapping_intervals"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # structural invariant: per user, islands are disjoint and ordered
    per_user = defaultdict(list)
    for uid, s, e, _n in got:
        per_user[uid].append((s, e))
    for uid, ivs in per_user.items():
        ivs.sort()
        for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
            assert e1 < s2, f"user {uid}: islands overlap or touch"


def test_skyline_matches_bruteforce_and_is_antichain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    pts = [(r.o_orderkey, r.o_totalprice, r.o_orderdate) for r in orders]

    def dominated(p, q):  # q dominates p
        return (
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
        )

    expected = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts)
    }
    got_rows = SPECS["skyline_orders"].fn(spark, sf_dir).collect()
    got = {r.o_orderkey for r in got_rows}
    assert got == expected
    # antichain: no member dominates another
    by_key = {p[0]: p for p in pts}
    sky = [by_key[k] for k in got]
    for p in sky:
        assert not any(dominated(p, q) for q in sky if q[0] != p[0])


def test_regression_matches_exact_python_moments(spark, sf_dir):
    rows = _events(spark, sf_dir)
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx, syy
    for r in rows:
        if r.value is None:
            continue
        x = r.ts.hour
        y = int(r.value * 100.0 + 0.5)  # floor(v*100+0.5), v >= 0
        m = mom[r.event_type]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
        m[5] += y * y
    import math

    expected = {}
    for et, (n, sx, sy, sxy, sxx, syy) in mom.items():
        n_, sx_, sy_ = float(n), float(sx), float(sy)
        sxy_, sxx_, syy_ = float(sxy), float(sxx), float(syy)
        cov = n_ * sxy_ - sx_ * sy_
        vx = n_ * sxx_ - sx_ * sx_
        vy = n_ * syy_ - sy_ * sy_
        r6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        expected[et] = (n, r6(cov / vx / 100.0), r6(cov / math.sqrt(vx * vy)))
    got = {
        r.event_type: (r.n_points, r.slope, r.corr_r)
        for r in SPECS["regression_value_by_hour"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_range_boundaries_are_exact_order_statistics(spark, sf_dir):
    prices = sorted(
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    n = len(prices)
    got = SPECS["range_partition_boundaries"].fn(spark, sf_dir).collect()
    assert len(got) == 7
    for r in got:
        target = (n * r.bucket_id + 7) // 8
        assert r.target_rank == target
        # boundary is the target-th smallest value (1-indexed)
        assert r.boundary == prices[target - 1], (r.bucket_id, target)


def test_cohort_retention_accounting(spark, sf_dir):
    rows = SPECS["cohort_retention"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    activity = {(r.user_id, r.ts.date()) for r in ev}
    cohort = {}
    for uid, day in activity:
        cohort[uid] = min(cohort.get(uid, day), day)
    # offset-0 cell of each cohort equals the cohort's size
    cohort_sizes = Counter(cohort.values())
    zero_cells = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
    assert zero_cells == dict(cohort_sizes)
    # total cells account for every distinct (user, day) pair
    assert sum(r.n_active for r in rows) == len(activity)
    assert all(r.day_offset >= 0 for r in rows)


def test_bfs_matches_python_bfs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    seed = min(p for parts in by_order.values() for p in parts)
    dist = {seed: 0}
    frontier = [seed]
    for h in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    got = {
        r.l_partkey: r.hops
        for r in SPECS["basket_bfs_part_hops"].fn(spark, sf_dir).collect()
    }
    assert got == dist


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
@settings(max_examples=200, deadline=None)
def test_zorder_expression_matches_python_interleave(x, y):
    """The shared ZORDER_EXPR text computes the textbook Morton
    interleave — verified against pure Python via DuckDB evaluation
    (cheap per-example; the Spark side runs the same expression text,
    and oracle parity covers Spark≡DuckDB)."""
    from streamprocessing_spark.queries.layout import ZORDER_EXPR

    expected = 0
    for i in range(16):
        expected |= ((x >> i) & 1) << (2 * i)
        expected |= ((y >> i) & 1) << (2 * i + 1)
    got = duckdb.sql(
        f"SELECT {ZORDER_EXPR} AS z FROM (SELECT {x}::BIGINT AS x, {y}::BIGINT AS y)"
    ).fetchone()[0]
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),      # weight
            st.integers(min_value=-1000, max_value=1000),  # cell sum
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_pava_kernel_equals_minimax_closed_form(cells):
    """The PAVA kernel must equal the Robertson-Wright minimax closed
    form max_{j<=i} min_{k>=i} avg(y[j..k]) on ARBITRARY weighted
    sequences — the theorem the DuckDB oracle evaluates, here checked
    against exact Fractions (with the same floor-to-int both sides
    apply, which commutes with min/max by monotonicity)."""
    from fractions import Fraction

    import pandas as pd

    from streamprocessing_spark.queries.timeseries import _pava_kernel

    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * len(cells),
            "hour": list(range(len(cells))),
            "w": [w for w, _ in cells],
            "s": [s for _, s in cells],
        }
    )
    got = {
        r.hour: r.fitted_micro for r in _pava_kernel(pdf).itertuples(index=False)
    }
    n = len(cells)
    import math

    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                ww = sum(w for w, _ in cells[j : k + 1])
                ss = sum(s for _, s in cells[j : k + 1])
                v = Fraction(ss, ww)
                worst = v if worst is None or v < worst else worst
            best = worst if best is None or worst > best else best
        assert got[i] == math.floor(best), (cells, i, got[i], best)


@given(st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_lis_kernel_equals_quadratic_dp(seq):
    """The patience-sorting Arrow kernel must equal the textbook O(n²)
    DP on arbitrary sequences (strictly increasing; duplicates must NOT
    extend a run)."""
    import pyarrow as pa

    from streamprocessing_spark.queries.timeseries import _lis_arrow_kernel

    table = pa.table(
        {
            "bkt": pa.array([0] * len(seq), pa.int64()),
            "user_id": pa.array([7] * len(seq), pa.int64()),
            "d": pa.array(list(range(len(seq))), pa.int64()),
            "c": pa.array(seq, pa.int64()),
        }
    )
    out = _lis_arrow_kernel(table)
    if not seq:
        assert out.num_rows == 0
        return
    dp = [1] * len(seq)
    for i in range(len(seq)):
        for j in range(i):
            if seq[j] < seq[i]:
                dp[i] = max(dp[i], dp[j] + 1)
    assert out.column("lis_len")[0].as_py() == max(dp)
    assert out.column("n_days")[0].as_py() == len(seq)


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12)
)
@settings(max_examples=300, deadline=None)
def test_unimax_closed_form_equals_sequential_waterfilling(avails):
    """The SQL closed form (capped iff cap·(n−rank) ≤ budget−prefix,
    remainder to the first mod uncapped sources) must equal sequential
    waterfilling on ARBITRARY source-size vectors — including exact
    budget conservation and the at-least-one-uncapped invariant
    (Σcap = 4T > 2T = budget guarantees it)."""
    sources = [(f"s{i:02d}", a) for i, a in enumerate(avails)]
    budget = 2 * sum(avails)
    caps = sorted((4 * a, s) for s, a in sources)
    n = len(caps)

    # closed form, as the query spells it
    prefix = 0
    closed = {}
    flags = []
    for rn, (cap, s) in enumerate(caps, start=1):
        prefix += cap
        flags.append(cap * (n - rn) <= budget - prefix)
    k = sum(flags)
    pk = sum(cap for (cap, _), f in zip(caps, flags) if f)
    for rn, ((cap, s), f) in enumerate(zip(caps, flags), start=1):
        if f:
            closed[s] = cap
        else:
            q, r = divmod(budget - pk, n - k)
            closed[s] = q + (1 if rn - k <= r else 0)

    # the capped flag must be a PREFIX of the sorted order (monotone),
    # or the closed form's flag-count-as-waterline-index is unsound
    assert flags == sorted(flags, reverse=True)

    # sequential reference
    remaining = budget
    ref = {}
    for i, (cap, s) in enumerate(caps):
        share = remaining // (n - i)
        if cap <= share:
            ref[s] = cap
            remaining -= cap
        else:
            q, r = divmod(remaining, n - i)
            for j, (_, s2) in enumerate(caps[i:]):
                ref[s2] = q + (1 if j < r else 0)
            break
    assert closed == ref
    assert sum(closed.values()) == budget
    assert any(not f for f in flags)  # at least one uncapped


def _python_sessions(rows):
    """Pure-Python 30-min-gap sessionization over collected events:
    [(user, s_start_us, s_end_us)] — the independent reference for the
    interval-algebra queries."""
    per_user = defaultdict(list)
    for r in rows:
        us = int(r.ts.timestamp() * 1_000_000)
        per_user[r.user_id].append((us, r.event_id))
    sessions = []
    for u, pts in per_user.items():
        pts.sort()
        start = prev = pts[0][0]
        for us, _eid in pts[1:]:
            if us - prev > 1800 * 1_000_000:
                sessions.append((u, start, prev))
                start = us
            prev = us
        sessions.append((u, start, prev))
    return sessions


def _sweep_daily_max(sessions):
    """Ground-truth daily peak concurrency from ONE GLOBAL sweep line
    (+1 at start, -1 just after end) that never decomposes by day: each
    day's max is max(carry at day start, conc at every sweep point
    inside the day). Deliberately a different construction from the
    query's per-day-prefix + carry decomposition, so boundary bugs in
    the decomposition (e.g. a session ending at the last microsecond of
    a day leaking its -1 into the next day) cannot hide."""
    DAY = 86_400_000_000
    deltas = Counter()
    for _u, s, e in sessions:
        deltas[s] += 1
        deltas[e + 1] -= 1
    conc, conc_at = 0, {}
    for p in sorted(deltas):
        conc += deltas[p]
        conc_at[p] = conc
    days = sorted({d for _u, s, e in sessions for d in range(s // DAY, e // DAY + 1)})
    expect = {}
    for d in days:
        carry = sum(1 for _u, s, e in sessions if s < d * DAY <= e)
        in_day = [conc_at[p] for p in conc_at if d * DAY <= p < (d + 1) * DAY]
        expect[d] = max([carry, *in_day])
    return expect


def test_max_concurrency_matches_python_sweep(spark, sf_dir):
    """The day-partitioned carry-in decomposition must equal a single
    global pure-Python sweep line evaluated day by day — the
    decomposition identity proven against a reference that never
    decomposes."""
    expect = _sweep_daily_max(_python_sessions(_events(spark, sf_dir)))
    got = {
        r.day_idx: r.max_concurrent
        for r in SPECS["max_concurrent_sessions_daily"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert max(expect.values()) > 1, "fixture should exercise real concurrency"


def test_max_concurrency_day_boundary_ending_session(spark, tmp_path):
    """ADVICE r04 (high): a session ending at the LAST MICROSECOND of a
    day places its end delta exactly on the next day's boundary — it is
    in neither the next day's carry nor legitimately in its prefix, so
    the unfixed construction deflated that day's baseline. Hostile
    fixture: one session ends at day-1's last microsecond while another
    runs inside day 1; day 1's peak must be 1, not 0."""
    import pyspark.sql.functions as SF

    DAY = 86_400_000_000
    # user A: two events spanning to exactly DAY-1 (one 30-min-gap
    # session [x, DAY-1]); user B: one event inside day 1.
    rows = [
        ("A", 1, DAY - 1 - 60_000_000),
        ("A", 2, DAY - 1),
        ("B", 3, DAY + 7_200_000_000),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_id long, us long").select(
        "user_id", "event_id", SF.timestamp_micros("us").alias("ts")
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r.day_idx: r.max_concurrent
        for r in SPECS["max_concurrent_sessions_daily"].fn(spark, str(tmp_path)).collect()
    }
    sessions = _python_sessions(ev.collect())
    assert got == _sweep_daily_max(sessions)
    assert got[1] == 1, f"day-1 peak deflated by boundary-ending session: {got}"


def test_interval_overlap_join_is_broadcast_and_exact(spark, sf_dir):
    """(a) The islands side must BROADCAST (dimension-bounded build side
    — a shuffle theta join here would be the 100 TB mistake); (b) every
    emitted overlap is the exact closed/half-open intersection measure,
    re-derived in pure Python from the session + island sets."""
    from streamprocessing_spark.plans import explain as X

    df = SPECS["interval_overlap_peak_sessions"].fn(spark, sf_dir)
    plan = X.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan

    rows = _events(spark, sf_dir)
    sessions = _python_sessions(rows)
    HR = 3_600_000_000
    hr_counts = Counter(int(r.ts.timestamp() * 1_000_000) // HR for r in rows)
    n_hours, total = len(hr_counts), sum(hr_counts.values())
    peak = sorted(h for h, c in hr_counts.items() if c * n_hours > total)
    islands = []
    for h in peak:
        if islands and h == islands[-1][1]:
            islands[-1][1] = h + 1
        else:
            islands.append([h, h + 1])
    expect = {}
    # rebuild per-user session indexes the way the query numbers them
    by_user = defaultdict(list)
    for u, s, e in sessions:
        by_user[u].append((s, e))
    for u in by_user:
        by_user[u].sort()
    for u, ses in by_user.items():
        for idx, (s, e) in enumerate(ses, start=1):
            for lo, hi in islands:
                if s < hi * HR and lo * HR <= e:
                    expect[(u, idx, lo)] = min(e, hi * HR) - max(s, lo * HR)
    got = {
        (r.user_id, r.session_idx, r.island_hr): r.overlap_us
        for r in df.collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_gap_sensitivity_monotone_and_consistent(spark, sf_dir):
    """n_sessions must be non-increasing in the gap (a larger inactivity
    threshold can only merge sessions), and the 30-min row must equal
    sessionize_events' session count exactly."""
    rows = sorted(
        SPECS["sessionization_gap_sensitivity"].fn(spark, sf_dir).collect(),
        key=lambda r: r.gap_minutes,
    )
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    n30 = next(r.n_sessions for r in rows if r.gap_minutes == 30)
    assert n30 == SPECS["sessionize_events"].fn(spark, sf_dir).count()


def test_late_arrival_matches_python(spark, sf_dir):
    """Pure-Python replay of the running-max lateness per user."""
    rows = _events(spark, sf_dir)
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(
            (r.event_id, int(r.ts.timestamp() * 1_000_000))
        )
    expect = {}
    for u, evs in per_user.items():
        evs.sort()
        mx, n_late, worst = None, 0, None
        for _eid, us in evs:
            if mx is not None and us < mx:
                n_late += 1
                worst = max(worst or 0, mx - us)
            mx = us if mx is None else max(mx, us)
        expect[u] = (len(evs), n_late, worst)
    got = {
        r.user_id: (r.n_events, r.n_late, r.max_lateness_us)
        for r in SPECS["late_arrival_audit"].fn(spark, sf_dir).collect()
    }
    assert got == expect
