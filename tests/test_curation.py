"""Property tests for the curation operators beyond oracle parity:
invariants the value-hash comparison can't express directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamprocessing_spark.queries.curation import (
    PACK_CONTEXT_TOKENS,
    PACK_SHARDS,
    SAMPLE_PER_LABEL,
)
from streamprocessing_spark.registry import all_specs

SPECS = all_specs()


def test_packing_respects_capacity(spark, sf_dir):
    """Concat-and-chunk invariant, now per shard: within each shard the
    tokens a bin receives BEFORE its last document fit the capacity (only
    the final doc may spill over the boundary — that's the chunk cut),
    bin ids are dense from 0 per shard, and every doc's shard is its
    deterministic hash bucket."""
    packed = SPECS["pack_documents_greedy"].fn(spark, sf_dir).collect()
    bins: dict[tuple[int, int], list[int]] = {}
    for r in sorted(packed, key=lambda r: r.doc_id):
        assert r.shard_id == r.doc_id % PACK_SHARDS
        bins.setdefault((r.shard_id, r.bin_id), []).append(r.n_tokens)
    shards = {s for s, _b in bins}
    for s in shards:
        shard_bins = sorted(b for sh, b in bins if sh == s)
        assert shard_bins == list(range(len(shard_bins))), f"shard {s} bins not dense"
    for (s, b), toks in bins.items():
        if len(toks) > 1:
            assert sum(toks[:-1]) < PACK_CONTEXT_TOKENS, f"shard {s} bin {b} overfilled"


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    """Exactly SAMPLE_PER_LABEL rows per label (when the label has that
    many), and the draw is identical across runs (no RNG state)."""
    df = SPECS["stratified_sample_per_label"]
    a = {(r.vec_id, r.label) for r in df.fn(spark, sf_dir).collect()}
    b = {(r.vec_id, r.label) for r in df.fn(spark, sf_dir).collect()}
    assert a == b, "sample must be deterministic across runs"
    from collections import Counter

    per_label = Counter(label for _v, label in a)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    avail = {r.label: r.n for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    for label, n in per_label.items():
        assert n == min(SAMPLE_PER_LABEL, avail[label]), (label, n, avail[label])


def test_train_test_split_proportions(spark, sf_dir):
    """The md5-bucket split lands near 80/10/10 (fixed corpus, so the
    exact counts are deterministic; bounds are loose sanity only)."""
    rows = SPECS["train_test_split"].fn(spark, sf_dir).collect()
    n = len(rows)
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert set(c) <= {"train", "valid", "test"}
    assert 0.7 <= c["train"] / n <= 0.9, c
    assert c["train"] + c["valid"] + c["test"] == n


def test_l_diversity_laws(spark, sf_dir):
    """(a) class populations partition the customer table; (b) 1 <=
    l <= k per class; (c) entropy-l is 0 exactly for homogeneous classes
    and never exceeds log2(l) (+2 milli-bits truncation slack); (d) the
    release flag is literally l >= 3."""
    import math

    rows = SPECS["l_diversity_audit"].fn(spark, sf_dir).collect()
    from streamprocessing_spark.sources.readers import load_table

    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.class_k for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.l_distinct <= r.class_k
        assert r.is_l_diverse == (r.l_distinct >= 3)
        assert r.entropy_l_milli <= 1000 * math.log2(r.l_distinct) + 2
        if r.l_distinct == 1:
            assert r.entropy_l_milli == 0


def test_variance_allocation_matches_python_apportionment(spark, sf_dir):
    """The full allocation chain — integer weights, largest-remainder
    apportionment, population caps, md5-rank membership — recomputed in
    pure-Python exact ints; the sampled doc_id set must match exactly."""
    import hashlib
    from collections import defaultdict

    from streamprocessing_spark.sources.readers import load_table

    B = 200
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    ).collect()
    strata = defaultdict(list)
    for r in docs:
        strata[(r.source, r.lang)].append((r.doc_id, r.n_chars))
    w0, pop = {}, {}
    for key, members in strata.items():
        xs = [x for _i, x in members if x is not None]
        n = len(members)
        pop[key] = n
        # n*s2 - s1^2 >= 0 by Cauchy-Schwarz (only grows when NULLs
        # inflate n past len(xs)); all-NULL strata coalesce to 0
        w0[key] = (n * sum(x * x for x in xs) - sum(xs) ** 2) // n if xs else 0
    W = sum(w0.values())
    if W > 0:
        w, wsum = w0, W
    else:
        w = {k: pop[k] for k in pop}
        wsum = sum(pop.values())
    alloc0 = {k: (B * w[k]) // wsum for k in w}
    rem = {k: (B * w[k]) % wsum for k in w}
    leftover = B - sum(alloc0.values())
    # NULLS FIRST on both tiebreak columns
    order = sorted(w, key=lambda k: (-rem[k],
                                     (k[0] is not None, k[0] or ""),
                                     (k[1] is not None, k[1] or "")))
    alloc = dict(alloc0)
    for k in order[:leftover]:
        alloc[k] += 1
    expect = set()
    for key, members in strata.items():
        a = min(alloc[key], pop[key])
        ranked = sorted(
            members, key=lambda m: (hashlib.md5(str(m[0]).encode()).hexdigest(), m[0])
        )
        expect |= {doc_id for doc_id, _x in ranked[:a]}
    got = {
        r.doc_id
        for r in SPECS["variance_optimal_allocation_sample"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) <= B


@pytest.mark.slow
def test_variance_allocation_prefers_noisy_strata(spark):
    """Two equal-size strata, one constant and one spread: the constant
    stratum must get ZERO budget (its variance weight is 0)."""
    rows = [(i, "flat", "en", 100) for i in range(50)] + [
        (100 + i, "noisy", "en", 10 + 37 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "lang", "n_chars"])
    import os
    import tempfile
    from collections import defaultdict

    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = SPECS["variance_optimal_allocation_sample"].fn(spark, td).collect()
    by_source = defaultdict(int)
    for r in out:
        by_source[r.source] += 1
    assert by_source["flat"] == 0
    assert by_source["noisy"] == 50  # capped at the stratum population


@pytest.mark.slow
def test_variance_allocation_overflow_raises_not_zero(spark):
    """ADVICE r04: a stratum whose n_chars sums push the DECIMAL(38,0)
    terms past capacity must FAIL LOUDLY, not silently coalesce an
    overflow NULL into weight 0 (which would treat the hottest stratum
    as zero-variance while the HUGEINT oracle stays exact). Under ANSI
    (Spark 4 default) the decimal aggregate itself raises
    ARITHMETIC_OVERFLOW; with ANSI off, the query's explicit raise_error
    guard fires instead — either way, never a silent zero."""
    import os
    import tempfile

    import pytest

    big = 9_000_000_000_000_000_000  # 2 rows: s1 = 1.8e19, s1^2 > 1e38
    rows = [(1, "hot", "en", big), (2, "hot", "en", big)] + [
        (10 + i, "cool", "en", 10 + i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "lang", "n_chars"])
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        with pytest.raises(Exception, match="(?i)overflow"):
            SPECS["variance_optimal_allocation_sample"].fn(spark, td).collect()


def test_blocking_audit_laws(spark, sf_dir):
    """(a) the length band is lossless (recall exactly 1000 milli);
    (b) found <= total for every strategy; (c) the histogram closed form
    for length-band candidates equals a directly materialized banded
    pair count; (d) SNM candidates are bounded by names * W."""
    from pyspark.sql import functions as F

    from streamprocessing_spark.queries.curation import SNM_WINDOW
    from streamprocessing_spark.sources.readers import load_table

    rows = {r.strategy: r for r in
            SPECS["blocking_strategy_audit"].fn(spark, sf_dir).collect()}
    assert rows["length_band"].recall_milli == 1000
    assert rows["length_band"].true_found == rows["length_band"].true_total
    for r in rows.values():
        assert r.true_found <= r.true_total
        assert r.true_found <= r.n_candidates

    names = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").isNotNull())
        .select("p_name").distinct()
    )
    n_names = names.count()
    a = names.select(F.col("p_name").alias("na"))
    b = names.select(F.col("p_name").alias("nb"))
    banded = a.join(
        b,
        (F.col("na") < F.col("nb"))
        & (F.abs(F.length("na") - F.length("nb")) <= 2),
    ).count()
    assert rows["length_band"].n_candidates == banded
    assert rows[f"snm_rev_w{SNM_WINDOW}"].n_candidates <= n_names * SNM_WINDOW


def test_er_transitivity_matches_python(spark, sf_dir):
    """Wedge/closure accounting recomputed from the collected edge set:
    n_wedges = sum over nodes of C(deg,2); n_closed = 3 * triangles
    counted directly; the milli ratio is the guarded integer division."""
    from collections import defaultdict
    from itertools import combinations

    from pyspark.sql import functions as F
    from streamprocessing_spark.sources.readers import load_table

    names = [
        r.p_name
        for r in load_table(spark, sf_dir, "part")
        .where(F.col("p_name").isNotNull())
        .select("p_name").distinct().collect()
    ]
    edges = set()
    by_len = defaultdict(list)
    for nm in names:
        by_len[len(nm)].append(nm)

    def lev(a, b):
        # O(len^2) DP, fine at fixture scale
        if a > b:
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for la, group in by_len.items():
        for lb in (la, la + 1, la + 2):
            for x in group:
                for y in by_len.get(lb, []):
                    # normalize AFTER the distance test: the smaller
                    # string can live in the longer length group
                    if x != y and lev(x, y) <= 2:
                        edges.add((min(x, y), max(x, y)))
    nbrs = defaultdict(set)
    for x, y in edges:
        nbrs[x].add(y)
        nbrs[y].add(x)
    n_wedges = sum(len(vs) * (len(vs) - 1) // 2 for vs in nbrs.values())
    n_closed = sum(
        1
        for m, vs in nbrs.items()
        for x, y in combinations(sorted(vs), 2)
        if (min(x, y), max(x, y)) in edges
    )
    row = SPECS["er_match_transitivity_audit"].fn(spark, sf_dir).first()
    assert row.n_edges == len(edges)
    assert row.n_wedges == n_wedges
    assert row.n_closed == n_closed
    if n_wedges:
        assert row.transitivity_milli == (1000 * n_closed) // n_wedges
