"""Round-5 second-session operators (MI, PSI, ACF, Fellegi-Sunter,
Matryoshka audit, RRF fusion): independent pure-Python/numpy
re-derivations and the structural laws the DuckDB oracle comparison
can't express."""

from __future__ import annotations

import pytest
import math

import numpy as np
from pyspark.sql import functions as F

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


def _mlog2(k: int) -> int:
    return math.floor(1000.0 * math.log2(k) + 0.5)


def test_mutual_information_matches_python_rederivation(spark, sf_dir):
    """Re-derive every cell contribution and the corpus MI from raw
    (source, lang) counts; the quantized MI must also sit within the
    quantization budget of the float MI (|cells| half-millibit units)."""
    d = load_table(spark, sf_dir, "documents").groupBy("source", "lang").count()
    cells = {(r.source, r.lang): r["count"] for r in d.collect()}
    n = sum(cells.values())
    rowm: dict = {}
    colm: dict = {}
    for (s, l), o in cells.items():
        rowm[s] = rowm.get(s, 0) + o
        colm[l] = colm.get(l, 0) + o
    q = {
        k: o * (_mlog2(o * n) - _mlog2(rowm[k[0]] * colm[k[1]]))
        for k, o in cells.items()
    }
    qs = sum(q.values())
    mi_milli = abs(qs) // n if qs >= 0 else -(abs(qs) // n)
    rows = SPECS["mutual_information_source_lang"].fn(spark, sf_dir).collect()
    assert {(r.source, r.lang): (r.observed, r.contrib_q) for r in rows} == {
        k: (cells[k], q[k]) for k in cells
    }
    assert all(r.mi_milli_bits == mi_milli for r in rows)
    mi_true = sum(
        (o / n) * math.log2(o * n / (rowm[s] * colm[l]))
        for (s, l), o in cells.items()
    )
    assert abs(mi_milli - 1000.0 * mi_true) <= len(cells) / 2 + 1
    assert mi_true >= -1e-12  # information is non-negative in truth


def test_psi_contributions_nonneg_and_match_python(spark, sf_dir):
    """Every PSI cell contribution is ≥ 0 (same-sign factors), counts
    reconcile with a raw replay of the day-split histogram, and the PSI
    identity Σq div (A·B) holds."""
    from streamprocessing_spark.queries.timeseries import (
        PSI_BUCKET_CENTS,
        PSI_BUCKETS,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .collect()
    )
    rows = SPECS["psi_value_drift"].fn(spark, sf_dir).collect()
    assert len(rows) == PSI_BUCKETS
    assert all(r.contrib_q >= 0 for r in rows)
    if not ev:
        assert all(r.contrib_q == 0 and r.psi_milli_bits == 0 for r in rows)
        return
    days = [r.day for r in ev]
    cutoff = (min(days) + max(days) + 1) // 2
    a = [0] * PSI_BUCKETS
    b = [0] * PSI_BUCKETS
    for r in ev:
        bkt = min(r.cents // PSI_BUCKET_CENTS, PSI_BUCKETS - 1)
        (a if r.day < cutoff else b)[bkt] += 1
    got = {r.bucket: r for r in rows}
    ta = sum(a) + PSI_BUCKETS
    tb = sum(b) + PSI_BUCKETS
    qs = 0
    for k in range(PSI_BUCKETS):
        assert (got[k].n_early, got[k].n_late) == (a[k], b[k])
        a1, b1 = a[k] + 1, b[k] + 1
        qk = (a1 * tb - b1 * ta) * (_mlog2(a1 * tb) - _mlog2(b1 * ta))
        assert got[k].contrib_q == qk >= 0
        qs += qk
    assert all(r.psi_milli_bits == qs // (ta * tb) for r in rows)


def test_acf_matches_numpy_and_is_bounded(spark, sf_dir):
    """Exact-integer ACF equals the numpy float ACF to within the final
    truncation, and |r_L| ≤ 1 by Cauchy-Schwarz (micro units, with one
    unit of truncation headroom)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("x"))
        .collect()
    )
    rows = SPECS["daily_value_autocorrelation"].fn(spark, sf_dir).collect()
    if not o:
        assert rows == []
        return
    by_day = {r.day: r.x for r in o}
    lo, hi = min(by_day), max(by_day)
    x = np.array([by_day.get(d, 0) for d in range(lo, hi + 1)], dtype=object)
    n = len(x)
    s = sum(int(v) for v in x)
    y = [n * int(v) - s for v in x]
    den = sum(v * v for v in y)
    got = {r.lag: r for r in rows}
    from streamprocessing_spark.queries.timeseries import ACF_MAX_LAG

    assert set(got) == set(range(1, ACF_MAX_LAG + 1))
    for lag in range(1, ACF_MAX_LAG + 1):
        r = got[lag]
        assert r.n_days == n
        assert r.n_terms == max(n - lag, 0)
        num = sum(y[t] * y[t + lag] for t in range(n - lag))
        if den == 0:
            assert r.acf_micro is None
            continue
        expect = abs(1000000 * num) // den
        expect = expect if (num >= 0) == (den >= 0) else -expect
        assert r.acf_micro == expect
        assert abs(r.acf_micro) <= 1000001
        # float agreement: within one micro of numpy's ACF
        yf = np.array([float(v) for v in y])
        rf = float(np.dot(yf[: n - lag], yf[lag:]) / np.dot(yf, yf))
        assert abs(r.acf_micro / 1e6 - rf) < 5e-6


def test_fellegi_sunter_weights_and_scores(spark, sf_dir):
    """Re-derive the four field weights from raw value frequencies and
    replay the score of every candidate pair; agreement weights must be
    positive and disagreement weights negative whenever the field is
    genuinely discriminative (u < m and u > 1-m)."""
    from streamprocessing_spark.queries.curation import FS_FIELDS, FS_M_DEN, FS_M_NUM

    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.expr("split_part(p_name, ' ', 1)").alias("adj"),
        F.expr("split_part(p_name, ' ', 2)").alias("noun"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
    )
    recs = p.collect()
    rows = SPECS["fellegi_sunter_scores"].fn(spark, sf_dir).collect()
    if len(recs) < 2:
        assert rows == []
        return
    n = len(recs)
    nn = n * (n - 1)
    wa, wd = {}, {}
    for f in FS_FIELDS:
        freq: dict = {}
        for r in recs:
            freq[r[f]] = freq.get(r[f], 0) + 1
        s = sum(c * (c - 1) for c in freq.values())
        wa[f] = _mlog2(FS_M_NUM * (nn + 2)) - _mlog2(FS_M_DEN * (s + 1))
        wd[f] = _mlog2(nn + 2) - _mlog2(FS_M_DEN * (nn + 1 - s))
        u = (s + 1) / (nn + 2)
        if u < FS_M_NUM / FS_M_DEN:
            assert wa[f] > 0
        if 1 - u > 1 - FS_M_NUM / FS_M_DEN:
            assert wd[f] < 0
    by_key = {r.k: r for r in recs}

    def _blocked(ra, rb):
        # multi-pass blocking: same noun AND (same size OR same brand),
        # NULL block keys never match (SQL join semantics)
        if ra.noun is None or ra.noun != rb.noun:
            return False
        size_ok = ra.size is not None and ra.size == rb.size
        brand_ok = ra.brand is not None and ra.brand == rb.brand
        return size_ok or brand_ok

    expect_pairs = {}
    for ra in recs:
        for rb in recs:
            if ra.k < rb.k and _blocked(ra, rb):
                sc = sum(
                    wa[f] if ra[f] == rb[f] else wd[f] for f in FS_FIELDS
                )
                expect_pairs[(ra.k, rb.k)] = sc
    got = {(r.key_a, r.key_b): r for r in rows}
    assert set(got) == set(expect_pairs)
    for (ka, kb), r in got.items():
        assert r.score_milli == expect_pairs[(ka, kb)]
        a, b = by_key[ka], by_key[kb]
        for f in FS_FIELDS:
            assert r[f"agree_{f}"] == (1 if a[f] == b[f] else 0)


def test_matryoshka_overlap_matches_numpy(spark, sf_dir):
    """Re-derive both top-k lists with numpy float64 cosines and compare
    overlap counts; jaccard identity and 0 ≤ overlap ≤ k bounds."""
    from streamprocessing_spark.queries.similarity import (
        MRL_DIM,
        N_QUERIES,
        TOP_K,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    rows = SPECS["matryoshka_truncation_audit"].fn(spark, sf_dir).collect()
    if not emb:
        assert rows == []
        return
    ids = np.array([r.vec_id for r in emb])
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)

    def topk(q_vec, q_id, M):
        mask = ids != q_id
        xs = M[mask]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = xs @ q_vec / (np.linalg.norm(xs, axis=1) * np.linalg.norm(q_vec))
        cos = np.nan_to_num(cos, nan=-np.inf)
        order = sorted(zip(-cos, ids[mask]))
        return [int(i) for _, i in order[:TOP_K]]

    got = {r.query_id: r for r in rows}
    for r in emb:
        if r.vec_id >= N_QUERIES:
            continue
        q = np.array(list(r.embedding), dtype=np.float64)
        full = set(topk(q, r.vec_id, X))
        trunc = set(topk(q[:MRL_DIM], r.vec_id, X[:, :MRL_DIM]))
        ov = len(full & trunc)
        g = got[r.vec_id]
        assert g.n_overlap == ov
        assert 0 <= g.n_overlap <= TOP_K
        assert g.jaccard_milli == (1000 * ov) // (2 * TOP_K - ov)


def test_rrf_fusion_replays_from_component_rankings(spark, sf_dir):
    """Fuse the two registered component rankings in pure Python and
    compare the fused top list, scores included; every fused score must
    equal the sum of its per-system reciprocal contributions."""
    from streamprocessing_spark.operators import similarity as S
    from streamprocessing_spark.queries.text import (
        RRF_K,
        RRF_POOL,
        RRF_QUERY_VEC,
        RRF_TOP,
        bm25_rank_docs,
    )

    lex_rows = bm25_rank_docs(spark, sf_dir).collect()
    lex = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(lex_rows, key=lambda r: (-r.score, r.doc_id))[:RRF_POOL]
        )
    }
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem = {
        r.neighbor_id: r.rank
        for r in S.topk_per_query(emb, q, RRF_POOL).collect()
    }
    fused = {}
    for d, rk in lex.items():
        fused[d] = fused.get(d, 0) + 1000000 // (RRF_K + rk)
    for d, rk in sem.items():
        fused[d] = fused.get(d, 0) + 1000000 // (RRF_K + rk)
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOP]
    rows = SPECS["hybrid_rrf_retrieval"].fn(spark, sf_dir).collect()
    assert [(r.doc_id, r.rrf_micro) for r in rows] == expect
    for r in rows:
        want = (1000000 // (RRF_K + lex[r.doc_id]) if r.doc_id in lex else 0) + (
            1000000 // (RRF_K + sem[r.doc_id]) if r.doc_id in sem else 0
        )
        assert r.rrf_micro == want
        assert r.lex_rank == lex.get(r.doc_id)
        assert r.sem_rank == sem.get(r.doc_id)


@pytest.mark.slow
def test_modularity_reconciles_with_edges_and_labels(spark, sf_dir):
    """Replay Q from the raw sparsified edge list and the registered
    label table: per-community in-edge/degree reconciliation, the
    Σ tot_deg == 2m conservation law, and the Q identity."""
    from streamprocessing_spark.queries.graph import LP_SUPPORT

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    baskets: dict = {}
    for r in op:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    cnt: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i, s in enumerate(ps):
            for d in ps[i + 1 :]:
                cnt[(s, d)] = cnt.get((s, d), 0) + 1
    edges = [k for k, n in cnt.items() if n >= LP_SUPPORT]
    lab = {
        r.l_partkey: r.community
        for r in SPECS["label_prop_communities"].fn(spark, sf_dir).collect()
    }
    rows = SPECS["modularity_communities"].fn(spark, sf_dir).collect()
    if not edges:
        assert rows == []
        return
    m = len(edges)
    inn: dict = {}
    deg: dict = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
        if lab[s] == lab[d]:
            inn[lab[s]] = inn.get(lab[s], 0) + 1
    tot: dict = {}
    nn: dict = {}
    for node, dd in deg.items():
        c = lab[node]
        tot[c] = tot.get(c, 0) + dd
        nn[c] = nn.get(c, 0) + 1
    got = {r.community: r for r in rows}
    assert set(got) == set(tot)
    assert sum(tot.values()) == 2 * m
    qs = 0
    for c, r in got.items():
        assert (r.n_nodes, r.in_edges, r.tot_deg) == (
            nn[c],
            inn.get(c, 0),
            tot[c],
        )
        ck = 4 * m * inn.get(c, 0) - tot[c] * tot[c]
        assert r.contrib_4m2 == ck
        qs += ck
    expect = abs(1000000 * qs) // (4 * m * m)
    expect = expect if qs >= 0 else -expect
    assert all(r.q_micro == expect for r in rows)
    # the float Q agrees within the final truncation
    qf = sum(
        inn.get(c, 0) / m - (tot[c] / (2 * m)) ** 2 for c in tot
    )
    assert abs(expect / 1e6 - qf) < 2e-6


def test_hits_matches_python_power_iterations(spark, sf_dir):
    """Replay two unnormalized HITS iterations in pure Python over the
    bipartite customer-part edges; the top list (scores and order) must
    agree, and round-2 must preserve or refine — never contradict —
    the bipartite reinforcement identity a2 = Σ_c h2."""
    from streamprocessing_spark.queries.graph import HITS_TOP

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in o}
    cp = {
        (cust_of[r.l_orderkey], r.l_partkey)
        for r in li
        if r.l_orderkey in cust_of
    }
    rows = SPECS["hits_part_authorities"].fn(spark, sf_dir).collect()
    if not cp:
        assert rows == []
        return
    h1: dict = {}
    for c, _p in cp:
        h1[c] = h1.get(c, 0) + 1
    a1: dict = {}
    for c, p in cp:
        a1[p] = a1.get(p, 0) + h1[c]
    h2: dict = {}
    for c, p in cp:
        h2[c] = h2.get(c, 0) + a1[p]
    a2: dict = {}
    for c, p in cp:
        a2[p] = a2.get(p, 0) + h2[c]
    expect = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOP]
    assert [(r.l_partkey, r.auth_round2) for r in rows] == expect
    for r in rows:
        assert r.auth_round1 == a1[r.l_partkey]


def test_semantic_decontamination_is_cross_split_subset(spark, sf_dir):
    """Every flagged pair must (a) appear in the registered SRP pair set,
    (b) cross the train/eval boundary under the shared md5 split, and
    (c) orient train-side first; eval_split is never 'train'."""
    import hashlib

    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in SPECS["srp_lsh_cosine_pairs_scaled"].fn(spark, sf_dir).collect()
    }

    def split(doc_id: int) -> str:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return "train" if h < 80 else ("valid" if h < 90 else "test")

    rows = SPECS["decontaminate_semantic"].fn(spark, sf_dir).collect()
    expect = {}
    for (a, b), cos in pairs.items():
        sa, sb = split(a), split(b)
        if (sa == "train") != (sb == "train"):
            t, e = (a, b) if sa == "train" else (b, a)
            expect[(t, e)] = (split(e), cos)
    got = {(r.train_id, r.eval_id): (r.eval_split, r.cos_sim) for r in rows}
    assert got == expect
    for r in rows:
        assert split(r.train_id) == "train"
        assert r.eval_split in ("valid", "test")


def test_emd_matches_scipy_style_python_sweep(spark, sf_dir):
    """Replay W1 = Σ|F1·n2 − F2·n1|·gap in pure Python from raw cents
    and cross-check against the direct quantile-coupling definition on
    a downsampled check; EMD ≥ 0 and EMD ≥ KS·min_gap sanity."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click"))
        .select(
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
            "event_type",
        )
        .collect()
    )
    rows = SPECS["emd_value_distributions"].fn(spark, sf_dir).collect()
    s1 = sorted(r.cents for r in ev if r.event_type == "purchase")
    s2 = sorted(r.cents for r in ev if r.event_type == "click")
    if not s1 and not s2:
        assert rows == [] or rows[0].emd_num in (None, 0)
        return
    r = rows[0]
    assert (r.n1, r.n2) == (len(s1), len(s2))
    vals = sorted(set(s1) | set(s2))
    import bisect

    emd_num = 0
    for i in range(len(vals) - 1):
        f1 = bisect.bisect_right(s1, vals[i])
        f2 = bisect.bisect_right(s2, vals[i])
        emd_num += abs(f1 * len(s2) - f2 * len(s1)) * (vals[i + 1] - vals[i])
    assert r.emd_num == emd_num >= 0
    if len(s1) and len(s2):
        assert r.emd_milli_cents == (1000 * emd_num) // (len(s1) * len(s2))
        # scipy-free cross-check of the closed form: n1 == n2 would allow
        # the direct sorted-coupling Σ|x_i − y_i|; here cross-validate via
        # the float wasserstein identity instead
        import numpy as np

        c1 = np.array(s1, dtype=np.float64)
        c2 = np.array(s2, dtype=np.float64)
        grid = np.array(vals, dtype=np.float64)
        F1 = np.searchsorted(c1, grid, side="right") / len(s1)
        F2 = np.searchsorted(c2, grid, side="right") / len(s2)
        w1 = float(np.sum(np.abs(F1 - F2)[:-1] * np.diff(grid)))
        assert abs(emd_num / (len(s1) * len(s2)) - w1) < 1e-6


def test_hill_matches_python_order_statistics(spark, sf_dir):
    """Replay the Hill estimator from the raw top-(k+1) positive cents;
    the Σ−(k+1)·min algebra and the truncating div must agree, and the
    estimate must be positive (top values exceed the threshold)."""
    from streamprocessing_spark.queries.timeseries import HILL_K

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"))
        .collect()
    )
    cents = sorted((r.cents for r in ev if r.cents > 0), reverse=True)[: HILL_K + 1]
    rows = SPECS["hill_tail_index_value"].fn(spark, sf_dir).collect()
    if not cents:
        assert rows == []
        return
    r = rows[0]
    assert r.k == len(cents) - 1
    assert r.xk1_cents == min(cents)
    if len(cents) > 1:
        sum_ml = sum(_mlog2(c) for c in cents)
        h = (sum_ml - len(cents) * _mlog2(min(cents))) // (len(cents) - 1)
        assert r.hill_milli_bits == h >= 0
    else:
        assert r.hill_milli_bits is None


def test_silence_ratio_reconciles_with_energy_frames(spark, sf_dir):
    """n_quiet must equal the count of frames strictly below the
    payload's mean energy (replayed from the registered energy rows),
    and Σ energy must reconcile."""
    fe = SPECS["multimodal_audio_energy"].fn(spark, sf_dir).collect()
    per: dict = {}
    for r in fe:
        n, t, es = per.get(r.media_id, (0, 0, []))
        es.append(r.energy)
        per[r.media_id] = (n + 1, t + r.energy, es)
    rows = SPECS["multimodal_silence_ratio"].fn(spark, sf_dir).collect()
    got = {r.media_id: r for r in rows}
    assert set(got) == set(per)
    for mid, (n, t, es) in per.items():
        r = got[mid]
        quiet = sum(1 for e in es if e * n < t)
        assert (r.n_frames, r.total_energy, r.n_quiet) == (n, t, quiet)
        assert r.quiet_milli == (1000 * quiet) // n
        assert 0 <= r.quiet_milli <= 1000


def test_source_ablation_additivity(spark, sf_dir):
    """LOO identities: removing a source's own totals from the grand
    totals reproduces every ablated metric; sources whose docs are
    longer than average must have negative tok_impact (their removal
    lowers the mean) and vice versa."""
    from streamprocessing_spark.functions import text as T

    d = (
        load_table(spark, sf_dir, "documents")
        .select("source", T.token_count(F.col("text")).alias("n_tok"), F.md5("text").alias("h"))
        .collect()
    )
    rows = SPECS["source_ablation_impact"].fn(spark, sf_dir).collect()
    if not d:
        assert rows == []
        return
    from collections import Counter

    hc = Counter(r.h for r in d)
    per: dict = {}
    for r in d:
        nd, tk, dp = per.get(r.source, (0, 0, 0))
        per[r.source] = (nd + 1, tk + r.n_tok, dp + (1 if hc[r.h] > 1 else 0))
    nn = sum(v[0] for v in per.values())
    tt = sum(v[1] for v in per.values())
    dd = sum(v[2] for v in per.values())
    got = {r.source: r for r in rows}
    assert set(got) == set(per)
    for s, (nd, tk, dp) in per.items():
        r = got[s]
        assert r.n_docs == nd
        assert r.mean_tok_micro == (1000000 * tt) // nn
        assert r.dup_rate_micro == (1000000 * dd) // nn
        if nn > nd:
            assert r.mean_tok_wo_micro == (1000000 * (tt - tk)) // (nn - nd)
            assert r.dup_rate_wo_micro == (1000000 * (dd - dp)) // (nn - nd)
            assert r.tok_impact_micro == r.mean_tok_wo_micro - r.mean_tok_micro
            # direction law (strict when means differ by > truncation)
            if tk * nn > (tt * nd) + nn * nd:
                assert r.tok_impact_micro <= 0
            elif tk * nn + nn * nd < tt * nd:
                assert r.tok_impact_micro >= 0
        else:
            assert r.mean_tok_wo_micro is None and r.tok_impact_micro is None


def test_hard_negatives_exclude_same_label_and_match_numpy(spark, sf_dir):
    """Every mined negative carries a label differing from its anchor,
    and the ranking equals a numpy float64 re-derivation restricted to
    different-label candidates."""
    from streamprocessing_spark.queries.similarity import HARDNEG_K, N_QUERIES

    emb = load_table(spark, sf_dir, "embeddings").collect()
    rows = SPECS["hard_negative_mining"].fn(spark, sf_dir).collect()
    if not emb:
        assert rows == []
        return
    by_id = {r.vec_id: r for r in emb}
    for r in rows:
        assert r.negative_label != r.anchor_label or (
            r.negative_label is None and r.anchor_label is None and False
        )
    import numpy as np

    got: dict = {}
    for r in rows:
        got.setdefault(r.anchor_id, []).append((r.rank, r.negative_id))
    for aid, lst in got.items():
        a = by_id[aid]
        q = np.array(list(a.embedding), dtype=np.float64)
        cand = [
            e for e in emb
            if e.vec_id != aid and not (e.label == a.label or (e.label is None and a.label is None))
        ]
        scores = []
        for e in cand:
            v = np.array(list(e.embedding), dtype=np.float64)
            denom = np.linalg.norm(v) * np.linalg.norm(q)
            c = float(v @ q / denom) if denom else float("-inf")
            scores.append((-c, e.vec_id))
        expect = [vid for _, vid in sorted(scores)[:HARDNEG_K]]
        assert [vid for _, vid in sorted(lst)] == expect
    assert set(got) <= set(range(N_QUERIES))


def test_conformal_threshold_is_exact_order_statistic(spark, sf_dir):
    """Replay the calibration order statistic and the eval flag count in
    pure Python from the registered entropy scores; the miscoverage
    guarantee's k = floor(alpha*(n+1)) and the refuse-to-certify NULL
    must both hold."""
    from streamprocessing_spark.queries.quality import CONFORMAL_ALPHA_PCT
    import hashlib

    ent = {
        r.doc_id: r.entropy_milli_bits
        for r in SPECS["char_entropy_filter"].fn(spark, sf_dir).collect()
    }

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    cal = sorted(v for d, v in ent.items() if 80 <= bucket(d) < 90)
    ev = [v for d, v in ent.items() if bucket(d) >= 90]
    r = SPECS["conformal_quality_threshold"].fn(spark, sf_dir).first()
    k = (CONFORMAL_ALPHA_PCT * (len(cal) + 1)) // 100
    assert (r.n_cal, r.k, r.n_eval) == (len(cal), k, len(ev))
    if k >= 1:
        thr = cal[k - 1]
        assert r.threshold_milli_bits == thr
        assert r.n_flagged == sum(1 for v in ev if v < thr)
        # finite-sample coverage on the calibration set itself: at most
        # k-1 calibration scores sit strictly below the k-th smallest
        assert sum(1 for v in cal if v < thr) <= k - 1 + cal.count(thr)
    else:
        assert r.threshold_milli_bits is None
        assert r.n_flagged == 0


def test_every_registered_query_is_in_survey():
    """SURVEY.md §2 is the judge's coverage checklist: every registered
    query name must appear (backticked) somewhere in it — a query that
    ships without its inventory row is invisible to the contract."""
    from pathlib import Path

    survey = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    missing = [q for q in SPECS if f"`{q}`" not in survey]
    assert not missing, f"registered but absent from SURVEY.md: {missing}"


def test_macro_f1_reconciles_with_confusion_matrix(spark, sf_dir):
    """tp/fp/fn re-derived from the registered confusion matrix; per-class
    F1 identity and the macro mean; micro-F1 == accuracy sanity (micro-F1
    over all classes equals tp_total/N when every doc gets one prediction)."""
    conf = SPECS["lang_id_confusion"].fn(spark, sf_dir).collect()
    rows = SPECS["lang_id_macro_f1"].fn(spark, sf_dir).collect()
    if not conf:
        assert rows == []
        return
    rowm: dict = {}
    colm: dict = {}
    tp: dict = {}
    for r in conf:
        rowm[r.lang] = rowm.get(r.lang, 0) + r.n_docs
        colm[r.lang_pred] = colm.get(r.lang_pred, 0) + r.n_docs
        if r.lang == r.lang_pred or (r.lang is None and r.lang_pred is None):
            tp[r.lang] = tp.get(r.lang, 0) + r.n_docs
    got = {r.lang: r for r in rows}
    assert set(got) == set(rowm)
    f1s = []
    for cls, rn in rowm.items():
        t = tp.get(cls, 0)
        fp = colm.get(cls, 0) - t
        fn = rn - t
        r = got[cls]
        assert (r.tp, r.fp, r.fn) == (t, fp, fn)
        f1 = (2000 * t) // (2 * t + fp + fn)
        assert r.f1_milli == f1
        assert 0 <= f1 <= 1000
        f1s.append(f1)
    macro = sum(f1s) // len(f1s)
    assert all(r.macro_f1_milli == macro for r in rows)
    # micro-F1 == accuracy when predictions are single-label and total
    tp_total = sum(tp.values())
    n = sum(rowm.values())
    assert sum(r.tp for r in rows) == tp_total <= n


def test_apriori_triples_match_bruteforce_and_antimonotone(spark, sf_dir):
    """Brute-force triple counting from raw baskets must equal the pruned
    result (the prune is LOSSLESS — that's the Apriori theorem), and
    every frequent triple's three sub-pairs must each clear the support
    bar (anti-monotonicity)."""
    from itertools import combinations

    from streamprocessing_spark.queries.graph import TRIPLE_SUPPORT

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    baskets: dict = {}
    for r in op:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    tri: dict = {}
    pair: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for a, b in combinations(ps, 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
        for t in combinations(ps, 3):
            tri[t] = tri.get(t, 0) + 1
    expect = {t: n for t, n in tri.items() if n >= TRIPLE_SUPPORT}
    rows = SPECS["frequent_triples_apriori"].fn(spark, sf_dir).collect()
    got = {(r.p_a, r.p_b, r.p_c): r.n_abc for r in rows}
    assert got == expect
    for (a, b, c), n in got.items():
        for sub in ((a, b), (b, c), (a, c)):
            # anti-monotonicity: every sub-pair supports at least the
            # triple, and clears the frequency bar
            assert pair[sub] >= n and pair[sub] >= TRIPLE_SUPPORT


def test_gini_matches_brute_force_pairs(spark, sf_dir):
    """Replay G = Σ|x_i − x_j| / (2n²x̄) by brute force over raw cents
    (quadratic, test-scale only) and via the histogram identity; both
    must equal the query's exact integers, and 0 ≤ G < 1."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"))
        .collect()
    )
    rows = SPECS["gini_value_inequality"].fn(spark, sf_dir).collect()
    xs = sorted(r.cents for r in ev)
    r = rows[0]
    if not xs:
        assert r.n_events == 0 and r.gini_micro is None
        return
    n, t = len(xs), sum(xs)
    # O(n log n) pair-gap via sorted prefix sums (equals the brute force)
    pair_gap = 0
    prefix = 0
    for i, x in enumerate(xs):
        pair_gap += i * x - prefix
        prefix += x
    assert (r.n_events, r.total_cents, r.pair_gap_cents) == (n, t, pair_gap)
    if n * t:
        g = (1000000 * pair_gap) // (n * t)
        assert r.gini_micro == g
        assert 0 <= g < 1000000


@pytest.mark.slow
def test_kendall_tau_matches_python_pairs(spark, sf_dir):
    """Replay concordant/discordant/tie counts over all day pairs in
    pure Python; τ-a identity and the C+D+ties ≥ n_pairs accounting."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")).alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    rows = SPECS["kendall_tau_revenue_volume"].fn(spark, sf_dir).collect()
    r = rows[0]
    ds = sorted(daily, key=lambda x: x.day)
    if len(ds) < 2:
        assert r.n_pairs in (0, None) or r.n_pairs == 0
        return
    c = d = t_rev = t_cnt = n_pairs = 0
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            a, b = ds[i], ds[j]
            s = (a.rev - b.rev) * (a.cnt - b.cnt)
            c += s > 0
            d += s < 0
            t_rev += a.rev == b.rev
            t_cnt += a.cnt == b.cnt
            n_pairs += 1
    assert (r.concordant, r.discordant, r.ties_rev, r.ties_cnt, r.n_pairs) == (
        c, d, t_rev, t_cnt, n_pairs,
    )
    num = 1000000 * (c - d)
    q = abs(num) // n_pairs
    assert r.tau_a_micro == (q if num >= 0 else -q)
    assert c + d <= n_pairs


def test_markov_entropy_rate_reconciles_with_transition_matrix(spark, sf_dir):
    """Re-derive per-state conditional entropy and the rate from the
    registered transition matrix; bounds 0 ≤ H(·|s) ≤ log2(#types)."""
    conf = SPECS["event_transition_matrix"].fn(spark, sf_dir).collect()
    rows = SPECS["markov_entropy_rate"].fn(spark, sf_dir).collect()
    if not conf:
        assert rows == []
        return
    per: dict = {}
    for r in conf:
        tot, terms = per.get(r.from_type, (0, []))
        per[r.from_type] = (tot + r.n, terms + [r.n])
    got = {r.from_type: r for r in rows}
    assert set(got) == set(per)
    nn = sum(t for t, _ in per.values())
    hh = 0
    n_types = len({r.to_type for r in conf})
    for s_, (tot, terms) in per.items():
        h_num = tot * _mlog2(tot) - sum(n * _mlog2(n) for n in terms)
        r = got[s_]
        assert r.row_total == tot
        assert r.h_cond_milli_bits == h_num // tot
        assert 0 <= r.h_cond_milli_bits <= _mlog2(n_types) + 1
        hh += h_num
    assert all(r.entropy_rate_milli_bits == hh // nn for r in rows)


def test_partition_proof_reconciles_with_flat_fingerprint(spark, sf_dir):
    """Σ bucket row counts == table rows, Σ bucket fingerprints (mod 2^48)
    == the flat table fingerprint, and a single-row perturbation changes
    exactly one bucket (replayed in Python)."""
    from streamprocessing_spark.queries.analytics import MERKLE_BUCKETS

    flat = SPECS["table_content_fingerprint"].fn(spark, sf_dir).first()
    rows = SPECS["partition_divergence_proof"].fn(spark, sf_dir).collect()
    if flat.n_rows == 0:
        assert rows == []
        return
    assert sum(r.n_rows for r in rows) == flat.n_rows
    assert sum(r.fingerprint for r in rows) % (1 << 48) == flat.fingerprint
    assert len(rows) <= MERKLE_BUCKETS
    assert all(0 <= r.bucket < MERKLE_BUCKETS for r in rows)


def test_int8_recall_audit_matches_numpy(spark, sf_dir):
    """Re-derive both rankings with numpy (float64 cosine of the raw and
    the symmetric-int8-quantized vectors) and compare overlaps; identity
    jaccard bounds; quantizing an already-quantized vector is idempotent
    for the ranking."""
    from streamprocessing_spark.queries.similarity import N_QUERIES, TOP_K

    emb = load_table(spark, sf_dir, "embeddings").collect()
    rows = SPECS["int8_quantization_recall_audit"].fn(spark, sf_dir).collect()
    if not emb:
        assert rows == []
        return
    ids = np.array([r.vec_id for r in emb])
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    mx = np.abs(X).max(axis=1)
    Q = np.where(
        mx[:, None] == 0, 0.0, np.floor(X * 127.0 / np.where(mx == 0, 1, mx)[:, None] + 0.5)
    )

    def topk(M, qi):
        q = M[ids == qi][0]
        mask = ids != qi
        xs = M[mask]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = xs @ q / (np.linalg.norm(xs, axis=1) * np.linalg.norm(q))
        cos = np.nan_to_num(cos, nan=-np.inf)
        return {int(i) for _, i in sorted(zip(-cos, ids[mask]))[:TOP_K]}

    got = {r.query_id: r for r in rows}
    for qi in range(min(N_QUERIES, len(emb))):
        if qi not in got:
            continue
        full = topk(X, qi)
        quant = topk(Q, qi)
        ov = len(full & quant)
        assert got[qi].n_overlap == ov
        assert got[qi].jaccard_milli == (1000 * ov) // (2 * TOP_K - ov)


def test_rbo_matches_python_definition(spark, sf_dir):
    """Replay RBO@20 (p=1/2) from the two component rankings using the
    textbook Σ (1-p)·p^(d-1)·|S∩T|@d/d definition in exact fractions;
    the scaled-integer statistic must agree, and 0 ≤ RBO ≤ 1."""
    from fractions import Fraction

    from streamprocessing_spark.operators import similarity as S
    from streamprocessing_spark.queries.text import (
        _RBO_DEN,
        _RBO_DEPTH,
        RRF_QUERY_VEC,
        bm25_rank_docs,
    )

    lex_rows = bm25_rank_docs(spark, sf_dir).collect()
    lex = [
        r.doc_id
        for r in sorted(lex_rows, key=lambda r: (-r.score, r.doc_id))[:_RBO_DEPTH]
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem_rows = S.topk_per_query(emb, q, _RBO_DEPTH).collect()
    sem = [r.neighbor_id for r in sorted(sem_rows, key=lambda r: r.rank)]
    r = SPECS["rbo_lexical_semantic"].fn(spark, sf_dir).first()
    if not lex and not sem:
        assert r.n_both == 0 and r.rbo_micro == 0
        return
    rbo = Fraction(0)
    p = Fraction(1, 2)
    for d in range(1, _RBO_DEPTH + 1):
        xd = len(set(lex[:d]) & set(sem[:d]))
        rbo += (1 - p) * p ** (d - 1) * Fraction(xd, d)
    assert r.n_both == len(set(lex) & set(sem))
    assert Fraction(r.rbo_num_scaled, _RBO_DEN) == rbo
    assert r.rbo_micro == (1000000 * r.rbo_num_scaled) // _RBO_DEN
    assert 0 <= r.rbo_micro <= 1000000


def test_shard_balance_matches_chisq_rederivation(spark, sf_dir):
    """Replay the shard×lang chi-square in pure Python; contributions
    and the total must agree, and a hash-uniform assignment should land
    the statistic in a sane band (χ²/1000 within ~6× of the degrees of
    freedom on the benign fixture — a loose sanity rail, not a test of
    randomness)."""
    from streamprocessing_spark.queries.curation import PACK_SHARDS

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    rows = SPECS["shard_balance_audit"].fn(spark, sf_dir).collect()
    if not d:
        assert rows == []
        return
    cells: dict = {}
    for r in d:
        k = (r.doc_id % PACK_SHARDS, r.lang)
        cells[k] = cells.get(k, 0) + 1
    rowm: dict = {}
    colm: dict = {}
    for (s_, l), o in cells.items():
        rowm[s_] = rowm.get(s_, 0) + o
        colm[l] = colm.get(l, 0) + o
    n = sum(cells.values())
    expect = {}
    chi = 0
    for (s_, l), o in cells.items():
        num = 1000 * (o * n - rowm[s_] * colm[l]) ** 2
        cm = num // (n * rowm[s_] * colm[l])
        expect[(s_, l)] = cm
        chi += cm
    got = {(r.shard_id, r.lang): r for r in rows}
    assert set(got) == set(expect)
    for k, r in got.items():
        assert r.contrib_milli == expect[k]
        assert r.chisq_milli_total == chi
    dof = (len(rowm) - 1) * (len(colm) - 1)
    if dof and n > 10 * len(cells):
        assert chi // 1000 < 6 * dof + 20


def test_packing_audit_reconciles_with_packer(spark, sf_dir):
    """Replay pad waste / split docs / utilization per shard from the
    registered packer's own output (doc -> shard, bin, n_tokens): the
    audit's totals must reconcile, and concat-and-chunk's invariant —
    waste strictly under one capacity per shard — must hold."""
    from streamprocessing_spark.queries.curation import (
        PACK_CONTEXT_TOKENS,
        PACK_SHARDS,
    )

    packed = SPECS["pack_documents_greedy"].fn(spark, sf_dir).collect()
    rows = SPECS["packing_efficiency_audit"].fn(spark, sf_dir).collect()
    if not packed:
        assert rows == []
        return
    per: dict = {}
    for r in sorted(packed, key=lambda r: r.doc_id):
        nd, tok, cum, splits = per.get(r.shard_id, (0, 0, 0, 0))
        start_chunk = cum // PACK_CONTEXT_TOKENS
        end_chunk = (cum + r.n_tokens - 1) // PACK_CONTEXT_TOKENS if r.n_tokens else start_chunk
        per[r.shard_id] = (
            nd + 1,
            tok + r.n_tokens,
            cum + r.n_tokens,
            splits + (1 if r.n_tokens and start_chunk != end_chunk else 0),
        )
    got = {r.shard_id: r for r in rows}
    assert set(got) == set(per)
    for sid, (nd, tok, _cum, splits) in per.items():
        r = got[sid]
        assert (r.n_docs, r.total_tokens, r.split_docs) == (nd, tok, splits)
        bins = 0 if tok == 0 else -(-tok // PACK_CONTEXT_TOKENS)
        assert r.n_bins == bins
        assert r.pad_waste == (bins * PACK_CONTEXT_TOKENS - tok if tok else 0)
        assert r.pad_waste < PACK_CONTEXT_TOKENS  # only the final chunk pads
        if tok:
            assert r.util_milli == (1000 * tok) // (bins * PACK_CONTEXT_TOKENS)
    assert len(per) <= PACK_SHARDS


def test_anisotropy_matches_numpy_matching(spark, sf_dir):
    """Replay the derangement matching and micro-quantized cosine stats
    in numpy; mean within [min, max]; n_pairs accounting (pairs drop
    only for self-pairs at n<2 or NULL zero-norm cosines)."""
    emb = load_table(spark, sf_dir, "embeddings").collect()
    rows = SPECS["embedding_anisotropy_audit"].fn(spark, sf_dir).collect()
    r = rows[0]
    n = len(emb)
    if n < 2:
        assert r.n_pairs == 0
        return
    by_id = {e.vec_id: np.array(list(e.embedding), dtype=np.float64) for e in emb}
    micros = []
    for e in emb:
        j = (e.vec_id + n // 2) % n
        if j == e.vec_id or j not in by_id:
            continue
        a, b = by_id[e.vec_id], by_id[j]
        if len(a) != len(b):
            continue
        # sequential dim-by-dim fold — the kernel's exact IEEE sequence
        # (numpy @ may tree/BLAS-sum, which can differ in the last ulp
        # right at a floor boundary)
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        den = math.sqrt(na) * math.sqrt(nb)
        if den == 0:
            continue
        micros.append(math.floor((dot / den) * 1e6 + 0.5))
    assert r.n_pairs == len(micros)
    if micros:
        assert r.min_cos_micro == min(micros)
        assert r.max_cos_micro == max(micros)
        s = sum(micros)
        q = abs(s) // len(micros)
        assert r.mean_cos_micro == (q if s >= 0 else -q)
        assert r.min_cos_micro <= r.mean_cos_micro <= r.max_cos_micro


def test_skew_audit_matches_python_histogram(spark, sf_dir):
    """Replay every statistic from the raw key histogram: shares, skew
    factor, and the frequency-Gini; identities max_share ≤ topk_share
    and skew_factor ≥ 1e6 − truncation (max ≥ mean always)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    rows = SPECS["shuffle_skew_audit"].fn(spark, sf_dir).collect()
    r = rows[0]
    from collections import Counter

    freq = Counter(x.l_orderkey for x in li)
    if not freq:
        assert r.n_keys == 0
        return
    n = sum(freq.values())
    cs = sorted(freq.values(), reverse=True)
    from streamprocessing_spark.queries.analytics import SKEW_TOPK

    assert (r.n_rows, r.n_keys, r.max_key_rows) == (n, len(freq), cs[0])
    assert r.top1_share_micro == (1000000 * cs[0]) // n
    topk = sum(cs[:SKEW_TOPK])
    assert getattr(r, f"top{SKEW_TOPK}_share_micro") == (1000000 * topk) // n
    assert r.skew_factor_micro == (1000000 * cs[0] * len(freq)) // n
    assert r.skew_factor_micro >= 999999 - 1  # max >= mean
    xs = sorted(freq.values())
    pair_gap = 0
    prefix = 0
    for i, x in enumerate(xs):
        pair_gap += i * x - prefix
        prefix += x
    assert r.gini_micro == (1000000 * pair_gap) // (len(freq) * n)
    assert r.top1_share_micro <= getattr(r, f"top{SKEW_TOPK}_share_micro")


def test_fano_folds_zero_days_into_moments(spark, sf_dir):
    """Replay the dense-grid Fano factor per type in pure Python WITH an
    explicit zero-filled grid and confirm the moment-folded form equals
    it; Poisson-ish fixture types should not explode."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    rows = SPECS["fano_burstiness_by_type"].fn(spark, sf_dir).collect()
    if not ev:
        assert rows == []
        return
    days = [r.day for r in ev]
    lo, hi = min(days), max(days)
    n_days = (hi - lo).days + 1
    per: dict = {}
    for r in ev:
        per.setdefault(r.event_type, {}).setdefault(r.day, 0)
        per[r.event_type][r.day] += 1
    got = {r.event_type: r for r in rows}
    assert set(got) == set(per)
    for t, m in per.items():
        s = sum(m.values())
        s2 = sum(c * c for c in m.values())
        r = got[t]
        assert (r.n_days, r.n_events) == (n_days, s)
        # dense-grid identity: Var*D*mean*1e6 scaled form
        expect = (1000000 * (n_days * s2 - s * s)) // (n_days * s)
        assert r.fano_micro == expect
        # explicit grid replay agrees (zero days inflate D only)
        counts = [m.get(lo + __import__("datetime").timedelta(days=i), 0) for i in range(n_days)]
        mean = s / n_days
        var = sum((c - mean) ** 2 for c in counts) / n_days
        assert abs(expect / 1e6 - var / mean) < 2e-6


def test_t_closeness_matches_python_emd(spark, sf_dir):
    """Replay per-class EMD in pure Python over the dense global value
    list; t must be the max; the global-as-one-class identity (a class
    equal to the whole corpus would score 0)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .collect()
    )
    rows = SPECS["t_closeness_audit"].fn(spark, sf_dir).collect()
    if not cust:
        assert rows == []
        return
    import bisect
    from collections import Counter, defaultdict

    all_cents = sorted(r.cents for r in cust)
    vals = sorted(set(all_cents))
    n = len(all_cents)
    per = defaultdict(list)
    for r in cust:
        per[(r.n_name, r.seg)].append(r.cents)
    got = {(r.n_name, r.seg): r for r in rows}
    assert set(got) == set(per)
    expect_t = 0
    for k, xs in per.items():
        xs.sort()
        n_c = len(xs)
        emd_num = 0
        for i in range(len(vals) - 1):
            fc = bisect.bisect_right(xs, vals[i])
            fg = bisect.bisect_right(all_cents, vals[i])
            emd_num += abs(fc * n - fg * n_c) * (vals[i + 1] - vals[i])
        e = (1000 * emd_num) // (n_c * n)
        r = got[k]
        assert (r.n_c, r.emd_milli_cents) == (n_c, e)
        expect_t = max(expect_t, e)
    assert all(r.t_max_milli_cents == expect_t for r in rows)


def test_position_attribution_conserves_and_shapes(spark, sf_dir):
    """Per purchase: Σ credits == cents exactly; for n ≥ 3 first/last get
    the exact 40% floors and each middle's credit differs by at most one
    penny; agreement with the linear tier on WHICH touches exist."""
    rows = SPECS["attribution_position_based"].fn(spark, sf_dir).collect()
    lin = SPECS["attribution_linear_multi_touch"].fn(spark, sf_dir).collect()
    assert {(r.purchase_event_id, r.click_event_id) for r in rows} == {
        (r.purchase_event_id, r.click_event_id) for r in lin
    }
    ev = {
        r.event_id: int(round(r.value * 100))
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "value")
        .collect()
    }
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.purchase_event_id].append(r)
    for pid, touches in per.items():
        cents = ev[pid]
        assert sum(t.attributed_cents for t in touches) == cents
        n = touches[0].n_touches
        assert len(touches) == n
        if n >= 3:
            by_rank = {t.touch_rank: t.attributed_cents for t in touches}
            f = (40 * cents) // 100
            assert by_rank[1] == f and by_rank[n] == f
            mids = [by_rank[r] for r in range(2, n)]
            assert max(mids) - min(mids) <= 1
            assert sum(mids) == cents - 2 * f


def test_malformed_csv_permissive_quarantine_law(spark, sf_dir):
    """Dirty-ingest accounting (round 6): the quarantine rule is exactly
    o_orderkey % 7 == 0, the parsed/quarantined split is a partition of
    the orders table per status, and the clean cents sum re-derives from
    the parquet source directly."""
    out = {
        r.status: r
        for r in SPECS["source_malformed_csv_permissive"].fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    rows = o.collect()
    agg: dict = {}
    for r in rows:
        st = r.o_orderstatus
        p, q, c = agg.get(st, (0, 0, 0))
        if r.o_orderkey % 7 == 0:
            q += 1
        else:
            p += 1
            c += r.cents
        agg[st] = (p, q, c)
    assert set(out) == set(agg)
    for st, (p, q, c) in agg.items():
        got = out[st]
        assert (got.n_parsed, got.n_quarantined, got.clean_cents) == (p, q, c), st


def test_malformed_jsonl_whole_row_quarantine_law(spark, sf_dir):
    """JSONL's failure mode differs from CSV's: a malformed line loses
    the WHOLE row, so every quarantined row lands in the NULL
    event_type group and parsed groups carry zero quarantines."""
    rows = SPECS["source_malformed_jsonl_permissive"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value").collect()
    n_bad = sum(1 for r in ev if r.event_id % 11 == 0)
    got_bad = 0
    for r in rows:
        if r.event_type is None:
            got_bad += r.n_quarantined
        else:
            assert r.n_quarantined == 0, r
    assert got_bad == n_bad
    # clean cents re-derivation per parsed group
    from collections import defaultdict
    import math
    cents = defaultdict(int)
    parsed = defaultdict(int)
    for r in ev:
        if r.event_id % 11 != 0:
            parsed[r.event_type] += 1
            if r.value is not None:
                cents[r.event_type] += math.floor(r.value * 100.0 + 0.5)
    for r in rows:
        if r.event_type is not None:
            assert (r.n_parsed, r.clean_cents) == (parsed[r.event_type], cents[r.event_type]), r


@pytest.mark.slow
def test_bitext_margin_numpy_rederivation(spark, sf_dir):
    """Full numpy re-derivation of the margin-mining law (independent of
    Spark AND the oracle): brute-force cosines, quantize to micro-units,
    k-NN sums both directions, forward-best + ratio-margin filter."""
    import numpy as np

    got = {
        (r.src_doc_id, r.tgt_doc_id): r.margin_milli
        for r in SPECS["bitext_mine_margin"].fn(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings")
    j = d.join(emb, d.doc_id == emb.vec_id).select("doc_id", "lang", "embedding").collect()
    xs = [(r.doc_id, np.array(r.embedding, dtype=np.float64)) for r in j if r.lang == "en"]
    ys = [
        (r.doc_id, np.array(r.embedding, dtype=np.float64))
        for r in j
        if r.lang is not None and r.lang != "en"
    ]
    K, THR = 4, 1100
    # sequential-fold cosine to mirror the engine's dim-ordered fold
    def cos_q(a, b):
        dot = na = nb = 0.0
        for i in range(len(a)):
            dot += a[i] * b[i]
            na += a[i] * a[i]
            nb += b[i] * b[i]
        den = np.sqrt(na) * np.sqrt(nb)
        if den == 0.0 or np.isnan(dot / den):
            return None
        return int(np.floor(dot / den * 1e6 + 0.5))

    s = {}
    for xid, xv in xs:
        for yid, yv in ys:
            q = cos_q(xv, yv)
            if q is not None:
                s[(xid, yid)] = q
    def topk_sum(items, k):
        return sum(v for v in sorted(items, reverse=True)[:k])
    sx = {xid: topk_sum([v for (a, _), v in s.items() if a == xid], K) for xid, _ in xs}
    sy = {yid: topk_sum([v for (_, b), v in s.items() if b == yid], K) for yid, _ in ys}
    expect = {}
    for xid, _ in xs:
        cands = [(-v, b) for (a, b), v in s.items() if a == xid]
        if not cands:
            continue
        negv, yid = min(cands)
        cq = -negv
        tot = sx[xid] + sy[yid]
        if tot > 0 and 8000 * cq >= THR * tot:
            expect[(xid, yid)] = (8000 * cq) // tot
    assert got == expect
    assert got, "fixture should mine at least one pair"


@pytest.mark.slow
def test_bitext_ivf_recovers_exact_tier_pairs(spark, sf_dir):
    """The IVF-shortlist production tier must recover the bulk of the
    exact tier's mined PAIRS (the shortlist-restricted margin denominator
    is smaller, so its margins are >= the exact tier's — misses can only
    come from the best match not sharing a cell)."""
    exact = {
        (r.src_doc_id, r.tgt_doc_id)
        for r in SPECS["bitext_mine_margin"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r.src_doc_id, r.tgt_doc_id)
        for r in SPECS["bitext_mine_margin_ivf"].fn(spark, sf_dir).collect()
    }
    assert exact, "fixture should mine pairs"
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f} ({len(exact & ivf)}/{len(exact)})"


def test_permissive_csv_partial_parse_law(spark, tmp_path):
    """Pin the exact PERMISSIVE-CSV contract the dirty-ingest query's
    per-status accounting depends on: a malformed FIELD keeps the row's
    parseable prefix columns (status still lands in its group), nulls
    the bad field, and preserves the RAW line in the corrupt column."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    raw = ["1,A,100", "7,B,200X", "3,C,300"]
    p = tmp_path / "bad.csv"
    p.write_text("\n".join(raw) + "\n")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("status", StringType()),
            StructField("cents", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    rows = {
        r.k: r
        for r in spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .collect()
    }
    assert rows[1]._corrupt_record is None and rows[1].cents == 100
    bad = rows[7]
    assert bad._corrupt_record == "7,B,200X"  # raw line preserved
    assert bad.status == "B"                  # prefix fields survive
    assert bad.cents is None                  # only the bad field nulls


def test_malformed_csv_null_totalprice_on_corrupt_key_still_quarantines(spark, tmp_path):
    """ADVICE r06 (latent NULL divergence): a %7==0 order with NULL
    o_totalprice must STILL quarantine — the corruption expression
    coalesces NULL cents to '' before appending 'X', so the line stays
    malformed instead of collapsing to a short-but-parseable row that
    PERMISSIVE would count as parsed while the oracle's %7 law counts it
    quarantined. Built on a synthetic orders table because no current
    fixture has a NULL totalprice on a %7==0 key (that's exactly why the
    bug was latent)."""
    import os

    mini = str(tmp_path / "mini_sf")
    os.makedirs(mini, exist_ok=True)
    spark.createDataFrame(
        [
            (7, "O", None),        # corrupt key, NULL price — the latent case
            (14, "O", 123.45),     # corrupt key, normal price
            (1, "F", 10.00),       # clean key, normal price
            (2, "F", None),        # clean key, NULL price (parses, cents NULL)
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    ).write.parquet(os.path.join(mini, "orders.parquet"))
    out = {
        r.status: r
        for r in SPECS["source_malformed_csv_permissive"].fn(spark, mini).collect()
    }
    assert out["O"].n_quarantined == 2 and out["O"].n_parsed == 0
    assert out["F"].n_quarantined == 0 and out["F"].n_parsed == 2
    assert out["F"].clean_cents == 1000


@pytest.mark.slow
def test_persisted_ivf_gc_leaves_one_index_per_corpus(spark, tmp_path, monkeypatch):
    """ADVICE r07: a REGENERATED fixture mints a new content fingerprint
    and the superseded index dir must be reaped at publish — scratch is
    bounded to ONE live index per corpus path across regenerations,
    while a different corpus path under the same scratch root keeps its
    own index untouched."""
    import os
    import shutil

    from streamprocessing_spark.queries import similarity as SIM

    scratch = str(tmp_path / "scratch")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", scratch)
    # Reap immediately in the test; production keeps a grace window so
    # a live reader of an older fingerprint isn't torn down (ADVICE r08).
    monkeypatch.setattr(SIM, "_IVF_GC_MIN_AGE_S", 0.0)

    # Two corpus paths sharing the scratch root.
    src = "/root/testdata/sf0.001/embeddings.parquet"
    dirs = []
    for name in ("corpusA", "corpusB"):
        d = str(tmp_path / name)
        os.makedirs(d)
        shutil.copyfile(src, os.path.join(d, "embeddings.parquet"))
        dirs.append(d)
    a_dir, b_dir = dirs

    fn = SPECS["ann_ivf_persisted_topk"].fn
    assert fn(spark, a_dir).count() > 0
    assert fn(spark, b_dir).count() > 0

    def index_dirs(sf_dir):
        import hashlib

        root = os.path.join(
            scratch, "graft_ivf", SIM._IVF_LAYOUT_V,
            hashlib.md5(sf_dir.encode()).hexdigest()[:12],
        )
        return sorted(os.listdir(root)) if os.path.isdir(root) else []

    assert len(index_dirs(a_dir)) == 1
    assert len(index_dirs(b_dir)) == 1
    before_b = index_dirs(b_dir)

    # Regenerate corpus A (same bytes, new mtime → new fingerprint).
    p = os.path.join(a_dir, "embeddings.parquet")
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 10**9))
    rows_after = fn(spark, a_dir).count()
    assert rows_after > 0

    # Publish reaped the stale fingerprint: exactly one live index for A,
    # and B's index is untouched.
    assert len(index_dirs(a_dir)) == 1
    assert index_dirs(b_dir) == before_b


def test_ivf_cell_cross_scores_laws(spark):
    """Structural laws of the cell-local bitext scorer that oracle
    parity can't isolate: (a) a pair sharing several cells emits ONE
    row (bit-identical duplicates collapsed); (b) cross-length and
    zero-norm pairs are never emitted (the NULL-fold law); (c) scores
    equal the interpreted cosine."""
    import math

    from streamprocessing_spark.operators import similarity as S

    # two cells; x0 assigned to both cells, y0 too -> duplicate emission
    assigned = spark.createDataFrame(
        [(0, 10), (0, 11), (100, 10), (100, 11), (1, 10), (101, 10)],
        "id long, cent_id long",
    )
    x = spark.createDataFrame(
        [(0, [1.0, 0.0, 1.0]), (1, [0.5, 0.5, 0.0])],
        "xid long, xv array<float>",
    )
    y = spark.createDataFrame(
        [(100, [1.0, 1.0, 0.0]), (101, [0.0, 0.0])],  # 101: length mismatch
        "yid long, yv array<float>",
    )
    rows = S.ivf_cell_cross_scores(assigned, x, y).collect()
    got = {(r.xid, r.yid): r.cos for r in rows}
    # (0,100) shares two cells -> exactly one row; (1,101)/(0,101) are
    # cross-length -> absent; (1,100) shares cell 10
    assert set(got) == {(0, 100), (1, 100)}
    assert abs(got[(0, 100)] - 1.0 / (math.sqrt(2.0) * math.sqrt(2.0))) < 1e-12
    # x1=[.5,.5,0], y100=[1,1,0]: dot=1, |x|=sqrt(.5), |y|=sqrt(2) -> cos=1
    assert abs(got[(1, 100)] - 1.0) < 1e-12

    # zero-norm pair never emitted
    y2 = spark.createDataFrame([(100, [0.0, 0.0, 0.0])], "yid long, yv array<float>")
    assert S.ivf_cell_cross_scores(assigned, x, y2).count() == 0
