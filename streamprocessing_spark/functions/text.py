"""Text-analysis column expressions for training-data pipelines.

All pure Catalyst expressions (no UDFs): tokenization, language-ID
heuristic, quality scoring, fingerprinting. Everything is deterministic
and engine-portable — the DuckDB oracles re-express the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word tokens: runs of ASCII alphanumerics over the lowercased text.
TOKEN_RE = "[a-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the heuristic must be cheap enough to run
# on 100 TB (a handful of array_intersect ops per row).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
}


def tokens(text: Column) -> Column:
    """Lowercased word tokens (whitespace/punctuation-agnostic)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of token positions that hit the language's stopword list."""
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax-of-stopword-hits language guess with CJK short-circuit.

    Deterministic tiebreak: languages compared in the fixed order
    en > de > fr > es (>= keeps the earlier language on ties); all-zero
    hits → 'und'. A CJK codepoint anywhere → 'zh' (token heuristics don't
    apply to unsegmented scripts).
    """
    toks = tokens(text)
    hits = {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]) & (hits["de"] > 0), F.lit("de"))
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] > 0), F.lit("fr"))
        .when(hits["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    has_cjk = F.regexp_count(text, F.lit(r"[一-鿿]")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(best)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1] from cheap surface stats:

    - length_score: min(1, n_tokens/100) — too-short docs score low;
    - stopword_ratio: fraction of tokens that are (en) stopwords — natural
      prose sits around 0.3-0.6;
    - alpha_ratio: alphanumeric chars / all chars — penalizes symbol soup.

    score = round(0.4*length + 0.4*min(1, stop_ratio/0.4) + 0.2*alpha, 4).
    Single-pass arithmetic — identical in any engine; no accumulation
    ordering concerns.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    length_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    stop_ratio = F.when(n_tok > 0, stopword_hits(toks, "en") / n_tok).otherwise(F.lit(0.0))
    stop_score = F.least(F.lit(1.0), stop_ratio / F.lit(0.4))
    n_chars = F.length(text)
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, r"[^A-Za-z0-9]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    return F.round(0.4 * length_score + 0.4 * stop_score + 0.2 * alpha_ratio, 4)


def fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of the whitespace-normalized,
    lowercased text. Identical hex in every engine; the join key for
    exact dedup across shards."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)
