"""Dedup-operator properties beyond oracle parity."""

from __future__ import annotations

from streamprocessing_spark.operators import dedup as D
from streamprocessing_spark.sources.readers import load_table
from streamprocessing_spark.registry import all_specs


def test_lsh_equals_exact_jaccard(spark, sf_dir):
    """LSH prefilter + verify must find exactly the pairs the brute-force
    tier finds (detection probability at s>=0.8 is ~1 for 16x4 banding)."""
    d = load_table(spark, sf_dir, "documents")
    exact = {tuple(r) for r in D.exact_jaccard_pairs(d, "doc_id", "text", 0.8).collect()}
    lsh = {tuple(r) for r in D.minhash_lsh_pairs(d, "doc_id", "text", 0.8).collect()}
    assert lsh == exact
    assert len(exact) > 0, "fixture should contain injected near-duplicates"


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
