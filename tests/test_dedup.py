"""Dedup-operator properties beyond oracle parity."""

from __future__ import annotations

import pytest
from streamprocessing_spark.operators import dedup as D
from streamprocessing_spark.sources.readers import load_table
from streamprocessing_spark.registry import all_specs


@pytest.mark.slow
def test_lsh_equals_exact_jaccard(spark, sf_dir):
    """LSH prefilter + verify must find exactly the pairs the brute-force
    tier finds (detection probability at s>=0.8 is ~1 for 16x4 banding)."""
    d = load_table(spark, sf_dir, "documents")
    exact = {tuple(r) for r in D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()}
    lsh = {tuple(r) for r in D.minhash_lsh_pairs(d, "doc_id", "text", 0.8).collect()}
    assert lsh == exact
    assert len(exact) > 0, "fixture should contain injected near-duplicates"


@pytest.mark.slow
def test_scaled_lsh_equals_exact_at_every_r(spark, sf_dir):
    """The count-scaled tier's recall-held b(r) law means the verified
    pair set must equal the brute-force tier AT EVERY banding
    resolution — force n_rows through the whole clamp range so the
    r=4 (fixed-equivalent) and r=8 (368-hash) paths both run locally,
    not just the fixture's natural r."""
    d = load_table(spark, sf_dir, "documents")
    exact = {tuple(r) for r in D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()}
    assert len(exact) > 0
    for forced_n in (2, 1 << 12, 1 << 15):  # r = 4, 5, 8
        got = {
            tuple(r)
            for r in D.minhash_lsh_pairs_scaled(
                d, "doc_id", "text", 0.8, forced_n
            ).collect()
        }
        assert got == exact, f"n_rows={forced_n}"


def test_mh_scale_law_pure_python():
    """Pure-Python re-derivation of the count-scaled banding law:
    r(n) clamps and grows one hash per corpus doubling; b(r) holds the
    fixed tier's 1-(1-t^4)^16 design detection probability at t=0.8."""
    assert D.mh_r_for_count(0) == D.MH_RMIN
    assert D.mh_r_for_count(500) == D.MH_RMIN
    assert D.mh_r_for_count(1 << (D.MH_RMIN + D.MH_R_SHIFT)) == D.MH_RMIN
    assert D.mh_r_for_count((1 << (D.MH_RMIN + D.MH_R_SHIFT)) + 1) == D.MH_RMIN + 1
    assert D.mh_r_for_count(1 << 30) == D.MH_RMAX
    # monotone non-decreasing in n
    rs = [D.mh_r_for_count(n) for n in range(1, 1 << 16, 997)]
    assert rs == sorted(rs)
    # contiguous table keyed by exactly the clamp range
    assert sorted(D.MH_RECALL_BANDS) == list(range(D.MH_RMIN, D.MH_RMAX + 1))
    t = 0.8
    design = 1 - (1 - t**4) ** 16
    for r, b in D.MH_RECALL_BANDS.items():
        recall = 1 - (1 - t**r) ** b
        assert recall >= design - 1e-4, (r, b, recall)
        # ...and b is the MINIMAL such band count (no padding)
        if b > 1:
            assert 1 - (1 - t**r) ** (b - 1) < design - 1e-9 or r == 4, (r, b)
    # coefficient law: shared indices agree between fixed and scaled
    assert D._coeffs(368)[: D.NUM_HASHES] == D.COEFFS


def test_simhash_symmetric_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_pairs(d, "doc_id", "text", max_hamming=3).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(0 <= r.hamming <= 3 for r in pairs)


def test_minhash_signature_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    sig = D.minhash_signature_df(D.shingle_df(d, "doc_id", "text"))
    assert sig.columns == ["id", "mh"]
    row = sig.first()
    assert len(row.mh) == D.NUM_HASHES
    assert all(0 <= v < D.MOD32 for v in row.mh)


@pytest.mark.slow
def test_custom_lsh_agrees_with_spark_ml_minhash(spark, sf_dir):
    """Independent cross-validation: pyspark.ml's MinHashLSH (different
    hash family, different banding) must find the same near-dup pairs as
    the custom portable-hash LSH at matching thresholds (jaccard >= 0.8
    == jaccard distance <= 0.2) on the cleanly-separated fixture corpus."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    sh = D.shingle_df(d, "doc_id", "text")
    docs = sh.groupBy("id").agg(F.collect_list("sh").alias("shingles"))
    feat = (
        CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
        .fit(docs)
        .transform(docs)
    )
    mhm = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=32, seed=42
    ).fit(feat)
    ml_pairs = {
        (r.a, r.b)
        for r in mhm.approxSimilarityJoin(feat, feat, 0.2, distCol="jd")
        .where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(F.col("datasetA.id").alias("a"), F.col("datasetB.id").alias("b"))
        .collect()
    }
    my_pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(d, "doc_id", "text", 0.8).collect()
    }
    assert ml_pairs == my_pairs
    assert len(my_pairs) > 0


@pytest.mark.slow
def test_keep_canonical_partition(spark, sf_dir):
    """dedup_keep_canonical must keep exactly: all docs minus non-canonical
    dup-cluster members; every cluster keeps precisely its min-id doc."""
    specs = all_specs()
    kept = {r.doc_id for r in specs["dedup_keep_canonical"].fn(spark, sf_dir).collect()}
    comp = {
        (r.id, r.component)
        for r in specs["dedup_cluster_components"].fn(spark, sf_dir).collect()
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    losers = {i for i, c in comp if c != i}
    # components uses the exact-jaccard pair graph; keep_canonical uses the
    # (verified) minhash pair graph — identical on this fixture by design
    assert kept == set(range(n_docs)) - losers
    for i, c in comp:
        if c != i:
            assert c in kept  # the canonical member survives


@pytest.mark.slow
def test_connected_components_long_chain_converges_fast(spark):
    """A 64-node path graph has diameter 63: plain neighbor-min label
    propagation needs ~63 rounds (the pre-pointer-jumping code raised its
    20-iteration bound on exactly this shape, found via the 10× scale
    proxy); with pointer jumping each round roughly halves path lengths,
    so the chain must converge within the default bound — and to the
    right answer (every node labeled with the chain's minimum id)."""
    from streamprocessing_spark.operators.dedup import connected_components

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(n)}


def test_connected_components_keeps_reflexive_pair_nodes(spark):
    """A reflexive pair (x, x) contributes no edge but its node must stay
    in the output with component = x — matching the recursive-CTE oracle,
    which keeps (x, x) in its edge enumeration. Guards the star-contraction
    rewrite's node derivation (nodes from PAIRS, not from filtered edges)."""
    from streamprocessing_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (3, 3)], "id_a long, id_b long")
    got = sorted((r.id, r.component) for r in connected_components(pairs).collect())
    assert got == [(1, 1), (2, 1), (3, 3)]


@pytest.mark.slow
def test_containment_join_properties(spark, sf_dir):
    """Containment is directional and the prefix filter is lossless:
    (a) every emitted containment is >= 0.9 and <= 1.0;
    (b) a brute-force shared-shingle recompute finds the same directed
        pair set (no-false-negative theorem exercised);
    (c) a doc fully contained in a longer doc scores exactly 1.0 even
        when the Jaccard tier would miss the pair (the raison d'etre)."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    out = D.containment_prefix_pairs(d, "doc_id", "text")
    rows = out.collect()
    assert all(0.9 <= r.containment <= 1.0 for r in rows)
    assert all(r.id_a != r.id_b for r in rows)

    sh = D.shingle_df(d, "doc_id", "text")
    sizes = {r.id: r.n for r in sh.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()}
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    brute = (
        a.join(b, ["sh"])
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .count()
        .collect()
    )
    expect = {
        (r.id_a, r.id_b)
        for r in brute
        if 10 * r["count"] >= 9 * sizes[r.id_a]
    }
    assert {(r.id_a, r.id_b) for r in rows} == expect
    assert len(expect) > 0, "fixture should contain containment pairs"


def test_containment_catches_jaccard_blind_spot(spark):
    """A short doc embedded verbatim in a 10x longer one: containment 1.0
    while Jaccard ~ 0.1 — below any useful near-dup threshold."""
    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} next{i} more{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], ["doc_id", "text"]
    )
    out = {(r.id_a, r.id_b): r.containment for r in
           D.containment_prefix_pairs(d, "doc_id", "text").collect()}
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # the long doc is NOT contained in the short one
    jac = D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()
    assert jac == [], "Jaccard tier must miss the pair (that's the blind spot)"


@pytest.mark.slow
def test_ngram_novelty_laws(spark, sf_dir):
    """Novelty bookkeeping laws: (a) Σ n_novel over docs == corpus
    distinct-shingle count (every shingle is novel exactly once);
    (b) the first doc (min doc_id with >= k tokens) has novelty 1.0;
    (c) short docs keep a row with NULL novelty."""
    from pyspark.sql import functions as F

    from streamprocessing_spark.registry import all_specs

    d = load_table(spark, sf_dir, "documents")
    out = all_specs()["ngram_novelty_score"].fn(spark, sf_dir)
    total_novel = out.agg(F.sum("n_novel")).first()[0]
    distinct_sh = D.shingle_df(d, "doc_id", "text").select("sh").distinct().count()
    assert total_novel == distinct_sh
    first_doc = (
        out.where(F.col("n_shingles") > 0).orderBy("doc_id").first()
    )
    assert first_doc.novelty == 1.0


def test_longest_span_vs_coverage_laws(spark, sf_dir):
    """Per doc: longest island <= total coverage <= n_tokens; docs with
    zero coverage have zero longest; a doc with ONE island has
    longest == coverage exactly."""
    from pyspark.sql import functions as F

    cov = {r.doc_id: r.dup_covered_tokens
           for r in all_specs()["duplicate_span_coverage"].fn(spark, sf_dir).collect()}
    rows = all_specs()["longest_duplicated_span"].fn(spark, sf_dir).collect()
    assert len(rows) == len(cov)
    for r in rows:
        assert r.longest_dup_span_tokens <= cov[r.doc_id] <= r.n_tokens
        assert (r.longest_dup_span_tokens == 0) == (cov[r.doc_id] == 0)
    assert any(r.longest_dup_span_tokens > 0 for r in rows)


def test_recall_curve_no_false_negative_region(spark, sf_dir):
    """Buckets at or above the 0.8 design threshold must detect at
    exactly 1000 milli (the lsh==exact theorem restated as a curve),
    detected <= pairs everywhere, and bucket edges are multiples of
    the 0.05 quantization."""
    rows = all_specs()["dedup_minhash_recall_curve"].fn(spark, sf_dir).collect()
    assert rows, "fixture has near-dup pairs above 0.5"
    for r in rows:
        assert 0 <= r.n_detected <= r.n_pairs
        assert r.jaccard_lo_m4 % 500 == 0
        if r.jaccard_lo_m4 >= 8000:
            assert r.detection_milli == 1000, r


def test_dedup_aware_split_never_straddles_clusters(spark, sf_dir):
    """The leak-proof-split invariant: every near-dup PAIR lands in one
    split (the exact failure mode the id-hashed split has — re-derived
    here from the pair graph, not from the cluster ids the query
    computed), and the split proportions stay near 80/10/10."""
    split = {
        r.doc_id: r.split
        for r in all_specs()["dedup_aware_split"].fn(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    pairs = D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()
    assert pairs
    for r in pairs:
        assert split[r.id_a] == split[r.id_b], (r.id_a, r.id_b)
    from collections import Counter

    c = Counter(split.values())
    n = sum(c.values())
    assert 0.65 <= c["train"] / n <= 0.92
    assert set(c) <= {"train", "valid", "test"}


def test_scaled_lsh_equals_exact_on_hostile(spark):
    """The recall-held scaled tier must equal brute force on the
    ADVERSARIAL corpus too (emoji/CJK/RTL text, NULL payloads, dup
    injections) — the benign-fixture equality test can't see a Unicode
    or NULL-handling divergence in the shingle/hash path."""
    d = load_table(spark, "/root/repo/testdata_hostile/hostile", "documents")
    exact = {tuple(r) for r in D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()}
    n = d.count()
    got = {
        tuple(r)
        for r in D.minhash_lsh_pairs_scaled(d, "doc_id", "text", 0.8, n).collect()
    }
    assert got == exact
