"""Property tests for the portable hash arithmetic the LSH oracles depend
on: the Spark expressions must equal the plain-Python (and hence DuckDB)
formulation for arbitrary input, not just the fixture corpus."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from streamprocessing_spark.operators import dedup as D


def py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# Adversarial fixed corpus: unicode (incl. CJK + emoji), quoting,
# whitespace runs, long strings, digits.
CORPUS = [
    "a", "hello world", "the the the", "ZZZZ", "0123456789",
    "tab\tsep", "quote\"inside", "comma,inside", "  padded  ",
    "日本語テキスト", "mixé àccents", "🚀 emoji", "x" * 500,
    "line one line two", "a b c d e f g h i j",
]


def test_spark_h32_h60_match_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in CORPUS], ["s"])
    rows = df.select(
        "s", D._h32(F.col("s")).alias("h32"), D._h60(F.col("s")).alias("h60")
    ).collect()
    assert len(rows) == len(CORPUS)
    for r in rows:
        assert r.h32 == py_h32(r.s), r.s
        assert r.h60 == py_h60(r.s), r.s
        assert 0 <= r.h32 < D.MOD32
        assert 0 <= r.h60 < 1 << 60


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_minhash_coefficient_arithmetic_no_overflow(s):
    """(a*h + b) stays under 2^63 for every coefficient and ANY string —
    the invariant both engines' signed-64 arithmetic relies on."""
    h = py_h32(s)
    for a, b in D.COEFFS:
        v = a * h + b
        assert v < 2**63
        assert 0 <= v % D.MOD32 < D.MOD32


def test_coefficients_are_odd_and_bounded():
    assert len(D.COEFFS) == D.NUM_HASHES
    assert len(set(D.COEFFS)) == D.NUM_HASHES
    for a, b in D.COEFFS:
        assert a % 2 == 1 and 0 < a < 2**31
        assert 0 <= b < 2**31


def test_banding_detection_probability_bounds():
    """16x4 banding: pairs at s>=0.8 are near-certain candidates, the
    0.02-similarity background is near-certain excluded."""

    def p_detect(s: float) -> float:
        return 1 - (1 - s**D.ROWS_PER_BAND) ** D.BANDS

    assert p_detect(0.9) > 0.9999
    assert p_detect(0.8) > 0.995
    assert p_detect(0.05) < 1e-4
