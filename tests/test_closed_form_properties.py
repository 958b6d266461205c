"""Property-based proofs of the closed-form identities behind the
"looks-inherently-sequential" operators (fifo_match_returns,
hysteresis_alert_state, rle_event_runs): the window-algebra formula is
re-executed in pure Python against the sequential reference algorithm on
ARBITRARY hypothesis-generated inputs — engine-free, so hundreds of
examples run in milliseconds. The chain of evidence per operator:
(1) these properties prove formula ≡ sequential algorithm on any input,
(2) the oracle parity gate proves Spark ≡ DuckDB on the formula,
(3) the fixture tests in test_round5_ops.py prove engine output ≡
sequential replay on the driver data. Together: the distributed plan
computes the sequential semantics, everywhere."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

qty_lists = st.lists(st.integers(min_value=1, max_value=20), min_size=0, max_size=12)


def _fifo_sequential(supplies: list[int], demands: list[int]) -> dict[tuple[int, int], int]:
    """Reference: pop the oldest remaining lot."""
    out: dict[tuple[int, int], int] = {}
    left = supplies[:]
    si = 0
    for di, dq in enumerate(demands):
        need = dq
        while need > 0 and si < len(left):
            take = min(need, left[si])
            if take > 0:
                out[(si, di)] = out.get((si, di), 0) + take
                left[si] -= take
                need -= take
            if left[si] == 0:
                si += 1
    return out


def _fifo_closed_form(supplies: list[int], demands: list[int]) -> dict[tuple[int, int], int]:
    """The operator's formula: cumulative axes + interval overlap."""
    s_hi, acc = [], 0
    for q in supplies:
        acc += q
        s_hi.append(acc)
    d_hi, acc = [], 0
    for q in demands:
        acc += q
        d_hi.append(acc)
    out: dict[tuple[int, int], int] = {}
    for si, sq in enumerate(supplies):
        slo, shi = s_hi[si] - sq, s_hi[si]
        for di, dq in enumerate(demands):
            dlo, dhi = d_hi[di] - dq, d_hi[di]
            if slo < dhi and dlo < shi:  # strict: zero-width never matches
                out[(si, di)] = min(shi, dhi) - max(slo, dlo)
    return out


@given(qty_lists, qty_lists)
@settings(max_examples=500, deadline=None)
def test_fifo_interval_overlap_equals_sequential(supplies, demands):
    assert _fifo_closed_form(supplies, demands) == _fifo_sequential(supplies, demands)


values = st.lists(st.integers(min_value=0, max_value=120), min_size=0, max_size=40)
thresholds = st.tuples(
    st.integers(min_value=0, max_value=50), st.integers(min_value=60, max_value=120)
)


@given(values, thresholds)
@settings(max_examples=500, deadline=None)
def test_hysteresis_locf_equals_automaton(vals, th):
    lo, hi = th
    # sequential two-threshold automaton
    state, seq = "off", []
    for v in vals:
        if v > hi:
            state = "on"
        elif v < lo:
            state = "off"
        seq.append(state)
    # closed form: last crossing marker, default off
    closed, last = [], None
    for v in vals:
        marker = "on" if v > hi else ("off" if v < lo else None)
        if marker is not None:
            last = marker
        closed.append(last if last is not None else "off")
    assert closed == seq


events = st.lists(st.sampled_from("abc"), min_size=0, max_size=40)


@given(events)
@settings(max_examples=500, deadline=None)
def test_rle_rownumber_difference_equals_groupby(seq):
    """rn_overall − rn_per_type is constant exactly within a run: the
    grouping it induces equals itertools.groupby's runs."""
    import itertools

    per_type: dict[str, int] = {}
    groups: dict[tuple[str, int], int] = {}
    order: list[tuple[str, int]] = []
    for i, t in enumerate(seq, start=1):
        per_type[t] = per_type.get(t, 0) + 1
        key = (t, i - per_type[t])
        if key not in groups:
            groups[key] = 0
            order.append(key)
        groups[key] += 1
    want = [(t, len(list(g))) for t, g in itertools.groupby(seq)]
    got = [(t, groups[(t, d)]) for (t, d) in order]
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=5000),
    tiles=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_ntile_closed_form_matches_sql_partitioning(n, tiles):
    """operators/ranking.ntile_from_rank's closed form must reproduce
    SQL ntile's front-loaded-remainder bucket sizes for ARBITRARY
    (N, tiles): bucket of rank i per the ISO rule — buckets 1..r hold
    q+1 rows (q = N div tiles, r = N mod tiles), the rest hold q.
    Pure-Python replica of the Column expression's arithmetic."""
    q, r = divmod(n, tiles)
    head = r * (q + 1)

    def closed_form(rk: int) -> int:
        if rk <= head:
            return (rk - 1) // (q + 1) + 1
        return r + (rk - head - 1) // max(q, 1) + 1

    # reference: explicit bucket construction per the SQL standard
    sizes = [q + 1] * r + [q] * (tiles - r)
    want = []
    for b, sz in enumerate(sizes, start=1):
        want.extend([b] * sz)
    got = [closed_form(i) for i in range(1, n + 1)]
    assert got == want
    # every bucket differs in size by at most 1 and ordering is monotone
    assert got == sorted(got)
