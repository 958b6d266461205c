"""Property tests for the curation operators beyond oracle parity:
invariants the value-hash comparison can't express directly."""

from __future__ import annotations

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
