"""Round-10 operator tests.

1. dedup_substring_keep (the ExactSubstr EMIT path, Lee et al. 2022):
   conservation laws against duplicate_span_coverage, and the hand-
   crafted excision law — covered spans vanish from EVERY occurrence
   (including the first), order-preserving, untouched docs round-trip.
"""

from __future__ import annotations

from streamprocessing_spark.registry import all_specs

SPECS = all_specs()
SF = "/root/testdata/sf0.001"


def test_substring_keep_conservation_laws(spark):
    """Per doc: n_removed must equal duplicate_span_coverage's
    dup_covered_tokens (same covered-position set, metric vs emit), and
    the emitted text must re-tokenize to exactly n_tokens - n_removed
    tokens (nothing lost, nothing invented)."""
    from streamprocessing_spark.functions import text as T
    from pyspark.sql import functions as F

    keep = SPECS["dedup_substring_keep"].fn(spark, SF)
    cov = SPECS["duplicate_span_coverage"].fn(spark, SF)

    k = {r.doc_id: r for r in keep.collect()}
    c = {r.doc_id: r for r in cov.collect()}
    assert set(k) == set(c)
    assert any(r.n_removed > 0 for r in k.values())  # non-vacuous
    assert any(r.n_removed == 0 for r in k.values())
    for doc_id, r in k.items():
        assert r.n_removed == c[doc_id].dup_covered_tokens, doc_id

    recount = keep.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        T.token_count(F.col("kept_text")).alias("n_emitted"),
    )
    for r in recount.collect():
        assert r.n_emitted == r.n_tokens - r.n_removed, r


def test_substring_keep_excision_law(spark, tmp_path):
    """Hand-crafted corpus: an 8+-token block repeated across two docs is
    excised from BOTH occurrences (ExactSubstr removes every copy — the
    surviving signal lives in docs that said it once... nowhere); a doc
    with no corpus-repeated 8-gram round-trips verbatim; a fully-
    duplicated doc survives as an empty string with its row intact."""
    import os

    block = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = [
        (1, f"alpha beta {block} gamma delta"),
        (2, f"{block}"),  # fully covered -> empty emit
        (3, "unique words only here nothing repeated at all"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    fx = str(tmp_path / "fx")
    os.makedirs(fx)
    d.write.mode("overwrite").parquet(os.path.join(fx, "documents.parquet"))

    got = {r.doc_id: r for r in SPECS["dedup_substring_keep"].fn(spark, fx).collect()}
    # doc 1: the repeated block's two 8-gram starts cover exactly its 9
    # tokens; the frame words survive in order
    assert got[1].kept_text == "alpha beta gamma delta"
    assert got[1].n_removed == 9
    # doc 2: fully covered, row survives as empty string
    assert got[2].kept_text == "" and got[2].n_removed == got[2].n_tokens == 9
    # doc 3: untouched, round-trips token-joined
    assert got[3].kept_text == docs[2][1] and got[3].n_removed == 0
