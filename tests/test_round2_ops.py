"""Structural properties of the round-2 continuation operators — the
invariants the DuckDB oracle comparison can't express (subset relations
between tiers, conservation laws, reconstruction checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import load_table

SPECS = all_specs()


@pytest.mark.slow
def test_incremental_pairs_subset_of_full(spark, sf_dir):
    """Every incremental (new-batch × corpus) duplicate pair must appear
    in the full self-join MinHash result (as either orientation), and
    every emitted pair must actually straddle the batch split."""
    full = {
        frozenset((r.id_a, r.id_b))
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    inc = SPECS["dedup_incremental_batch"].fn(spark, sf_dir).collect()
    for r in inc:
        assert r.id_a % 10 == 7 and r.id_b % 10 != 7, (r.id_a, r.id_b)
        assert frozenset((r.id_a, r.id_b)) in full, (r.id_a, r.id_b)


def test_chunker_reconstructs_documents(spark, sf_dir):
    """Chunk windows must tile every document: chunk count = ceil(n/S),
    starts form the stride grid, and re-joining the stride-aligned
    prefixes of each chunk reproduces the canonical token stream."""
    from streamprocessing_spark.queries.text import CHUNK_S, CHUNK_W

    chunks = SPECS["chunk_documents_windows"].fn(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("start_tok").alias("last_start"),
            F.max(F.col("start_tok") + F.col("chunk_tokens")).alias("covered_end"),
            F.sum(F.when(F.col("chunk_tokens") > CHUNK_W, 1).otherwise(0)).alias("oversize"),
        )
        .collect()
    )
    docs = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("n"),
        )
        .collect()
        if r.n > 0
    }
    assert {r.doc_id for r in per_doc} == set(docs)
    for r in per_doc:
        n = docs[r.doc_id]
        assert r.oversize == 0
        assert r.n_chunks == -(-n // CHUNK_S), (r.doc_id, n, r.n_chunks)
        assert r.last_start == CHUNK_S * (r.n_chunks - 1)
        assert r.covered_end == n, (r.doc_id, n, r.covered_end)


def test_span_coverage_matches_pure_python_oracle(spark, sf_dir):
    """Coverage is bounded by the doc length, non-vacuous on the fixture,
    and equals an independent pure-Python recomputation over the whole
    corpus (second oracle in a different engine family, like
    tests/test_hash_portability.py's style)."""
    import re

    cov = {
        r.doc_id: (r.n_tokens, r.dup_covered_tokens)
        for r in SPECS["duplicate_span_coverage"].fn(spark, sf_dir).collect()
    }
    for n, c in cov.values():
        assert 0 <= c <= n
    assert any(c > 0 for _, c in cov.values()), "span metric vacuous on fixture"

    docs = {
        r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower())
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    from collections import Counter

    gram_counts: Counter = Counter()
    grams_by_doc = {}
    for doc_id, t in docs.items():
        grams = [" ".join(t[i : i + 8]) for i in range(len(t) - 7)] if len(t) >= 8 else []
        grams_by_doc[doc_id] = grams
        gram_counts.update(grams)
    expected = {}
    for doc_id, t in docs.items():
        if not t:
            continue
        covered: set[int] = set()
        for i, g in enumerate(grams_by_doc[doc_id]):
            if gram_counts[g] >= 2:
                covered.update(range(i, i + 8))
        expected[doc_id] = (len(t), len(covered))
    assert cov == expected


def test_triangle_conservation_and_lcc_range(spark, sf_dir):
    """Sum of per-node triangle counts = 3 × (number of distinct
    triangles); every clustering coefficient sits in [0, 1] and its
    integer inputs are consistent (2·T ≤ d·(d−1))."""
    tri = SPECS["triangle_count_copurchase"].fn(spark, sf_dir)
    total = tri.agg(F.sum("n_triangles")).collect()[0][0] or 0
    assert total % 3 == 0 and total > 0
    lcc = SPECS["clustering_coefficient_parts"].fn(spark, sf_dir).collect()
    for r in lcc:
        assert 0.0 <= r.lcc <= 1.0, r
        assert 2 * r.n_triangles <= r.degree * (r.degree - 1), r


def test_mad_flags_exceed_threshold(spark, sf_dir):
    """Every flagged event's deviation really exceeds 3×MAD, and MAD is
    positive (degenerate types are excluded, not flagged wholesale)."""
    rows = SPECS["mad_outlier_events"].fn(spark, sf_dir).collect()
    assert rows, "MAD query vacuous on this fixture"
    for r in rows:
        assert r.mad_x10k > 0
        assert r.dev_x10k > 3 * r.mad_x10k


@pytest.mark.slow
def test_semantic_dedup_variants_agree_on_verified_pairs(spark, sf_dir):
    """Both semantic-dedup variants remove only vectors that have an
    exact-verified ≥θ twin: their removed sets must be subsets of the
    vectors appearing in the exact all-pairs result at the same θ."""
    emb = load_table(spark, sf_dir, "embeddings")
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    exact_members = set()
    for r in SPECS["embedding_cosine_pairs"].fn(spark, sf_dir).collect():
        exact_members.add(r.id_a)
        exact_members.add(r.id_b)
    for name in (
        "semantic_dedup_keep",
        "semantic_dedup_keep_ivf",
        "semantic_dedup_keep_srp_baseline",
    ):
        kept = {r.vec_id for r in SPECS[name].fn(spark, sf_dir).collect()}
        removed = all_ids - kept
        assert removed <= exact_members, (name, removed - exact_members)
