"""Corpus-quality filters over the documents table (north-star extension:
the Gopher/C4-style heuristic filter stage of a training-data pipeline;
generalizes the reference's per-record filter operators,
/root/reference/ops/app1op1/app1op1.go:9-18, from substring predicates to
corpus statistics).

All pure Catalyst expressions — no UDFs; every ratio is computed from
exact integer counts and rounded with the engine-portable floor(x*k+0.5)/k
so the DuckDB oracles match bit-for-bit. At 100 TB these are scan-shaped
(per-row projections + one groupBy where noted): they pipeline inside
whole-stage codegen and shuffle at most once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamprocessing_spark.functions import text as T
from streamprocessing_spark.registry import register
from streamprocessing_spark.sources.readers import load_table

_SQL_TOKENS = T.SQL_TOKENS

# Gopher-style acceptance bounds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 — adapted to this synthetic corpus's scale).
MIN_WORDS, MAX_WORDS = 20, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 2.0, 10.0
MIN_STOP_HITS = 2


@register(
    "repetition_top_bigram_fraction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS t, len({_SQL_TOKENS}) AS n_tok
      FROM documents
    ),
    big AS (
      SELECT doc_id, n_tok, t[i] || ' ' || t[i + 1] AS bigram
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
      WHERE n_tok >= 2
    ),
    cnt AS (
      SELECT doc_id, n_tok, bigram, count(*) AS c
      FROM big GROUP BY doc_id, n_tok, bigram
    ),
    top AS (
      SELECT doc_id, n_tok, bigram, c,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, bigram) AS rn
      FROM cnt
    )
    SELECT doc_id, bigram AS top_bigram, CAST(c AS BIGINT) AS top_n,
           floor((2.0 * c / n_tok) * 1000000.0 + 0.5) / 1000000.0 AS top_frac
    FROM top WHERE rn = 1
    """,
    tags=("quality", "text", "llm-pipeline"),
)
def repetition_top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rule: fraction of the document covered by its most
    frequent word bigram (2·count/len). High values flag boilerplate /
    TEMPLATE spam. Tiebreak on the bigram string keeps the winner
    deterministic. Plan shape: scan → explode (1→n-1) → two-level hash agg
    → per-doc window on the already-grouped (doc, bigram) rows — the
    explode never leaves the scan stage, and the window partitions by
    doc_id so state is one doc's distinct bigrams, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id",
        T.tokens(F.col("text")).alias("t"),
        T.token_count(F.col("text")).alias("n_tok"),
    ).where(F.col("n_tok") >= 2)
    bigrams = toked.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.col("n_tok") - 1).cast("int")),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i.cast("int")),
                    F.element_at("t", (i + 1).cast("int")),
                ),
            )
        ).alias("bigram"),
    )
    cnt = bigrams.groupBy("doc_id", "n_tok", "bigram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("bigram"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.col("c").cast("long").alias("top_n"),
            T.portable_round(F.lit(2.0) * F.col("c") / F.col("n_tok"), 6).alias("top_frac"),
        )
    )


@register(
    "repetition_dup_trigram_fraction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS g
      FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
           CAST((1000000 * (len(g) - len(list_distinct(g)))) // len(g) AS BIGINT)
             AS dup_frac_micro
    FROM grams
    """,
    tags=("quality", "text", "llm-pipeline", "dedup"),
)
def repetition_dup_trigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER Gopher repetition rule — fraction of duplicate word
    trigrams per document (occurrences beyond each trigram's first):
    where repetition_top_bigram_fraction catches one dominant template
    phrase, this catches diffuse self-repetition (looping generations,
    keyword stuffing, boilerplate listings) whose top n-gram alone looks
    innocent. Exact integers end-to-end; dup fraction emitted in
    integer micros (floor division, identical in both engines).

    Plan shape — the cheapest query in the repetition family: the
    trigram list, its length, and its DISTINCT length are all
    ARRAY-LOCAL expressions inside the scan projection (array_distinct
    dedupes within the row), so the whole filter is a zero-shuffle
    narrow scan; nothing is exploded and nothing leaves the stage. At
    100 TB this pipelines inside whole-stage codegen at scan speed —
    the per-doc trigram multiset never materializes as rows."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
            F.element_at(t, i + 3),
        ),
    )
    g = toked.where(F.size(t) >= 3).select("doc_id", grams.alias("g"))
    return g.select(
        "doc_id",
        F.size("g").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("g")).cast("long").alias("n_distinct"),
        F.expr(
            "CAST((1000000 * (size(g) - size(array_distinct(g)))) div size(g) AS BIGINT)"
        ).alias("dup_frac_micro"),
    )


@register(
    "doc_type_token_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len({_SQL_TOKENS}) AS n_tokens,
             len(list_distinct({_SQL_TOKENS})) AS n_distinct
      FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           floor((1.0 * n_distinct / n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS ttr
    FROM toks WHERE n_tokens > 0
    """,
    tags=("quality", "text", "llm-pipeline"),
)
def doc_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (distinct words / words) — the lexical-diversity
    quality signal (low TTR ⇒ repetitive/generated text). Pure per-row
    array expressions: runs at scan speed, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    n_tok = F.size("t").cast("long")
    n_dis = F.size(F.array_distinct("t")).cast("long")
    return (
        toked.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            n_dis.alias("n_distinct"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "ttr",
            T.portable_round(F.lit(1.0) * F.col("n_distinct") / F.col("n_tokens"), 6),
        )
    )


def _sql_stop_hits_en() -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
    return f"len(list_filter({_SQL_TOKENS}, t -> list_contains([{words}], t)))"


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             len({_SQL_TOKENS}) AS n_tokens,
             list_sum(list_transform({_SQL_TOKENS}, t -> length(t))) AS sum_len,
             {_sql_stop_hits_en()} AS stop_hits
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           floor((1.0 * sum_len / n_tokens) * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           CAST(n_tokens BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS BIGINT) AS flag_wordcount,
           CAST(1.0 * sum_len / n_tokens BETWEEN {MIN_MEAN_LEN} AND {MAX_MEAN_LEN}
                AS BIGINT) AS flag_meanlen,
           CAST(stop_hits >= {MIN_STOP_HITS} OR lang <> 'en' AS BIGINT) AS flag_stop,
           CAST((n_tokens BETWEEN {MIN_WORDS} AND {MAX_WORDS})
            AND (1.0 * sum_len / n_tokens BETWEEN {MIN_MEAN_LEN} AND {MAX_MEAN_LEN})
            AND (stop_hits >= {MIN_STOP_HITS} OR lang <> 'en') AS BIGINT) AS passes
    FROM s WHERE n_tokens > 0
    """,
    tags=("quality", "text", "llm-pipeline"),
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality gate: word-count bounds, mean
    word length bounds, stopword-presence floor (English only — other
    languages pass the stopword rule vacuously, as Gopher applies it to
    English text). Every flag is derived from exact integer counts; the
    mean-length comparison happens on the identical double both engines
    compute from (sum_len, n_tokens). Scan-shaped: zero shuffles, flags
    emitted per row so the downstream filter is a free predicate."""
    d = load_table(spark, sf_dir, "documents")
    sum_len = F.aggregate(
        "t", F.lit(0), lambda acc, x: acc + F.length(x)
    )
    s = d.select(
        "doc_id",
        "lang",
        T.tokens(F.col("text")).alias("t"),
    ).select(
        "doc_id",
        "lang",
        F.size("t").cast("long").alias("n_tokens"),
        sum_len.alias("sum_len"),
        T.stopword_hits(F.col("t"), "en").alias("stop_hits"),
    ).where(F.col("n_tokens") > 0)
    # try_divide, not `/`: the n_tokens > 0 guard above does NOT
    # guarantee evaluation order once this query is composed (Catalyst
    # subexpression elimination evaluated the division inside a fused
    # predicate before the guard conjunct in curation_manifest_end2end —
    # the hostile sweep's zero-token docs crashed it under ANSI mode).
    mean_len = F.try_divide(F.lit(1.0) * F.col("sum_len"), F.col("n_tokens"))
    flag_wc = F.col("n_tokens").between(MIN_WORDS, MAX_WORDS)
    flag_ml = mean_len.between(MIN_MEAN_LEN, MAX_MEAN_LEN)
    flag_st = (F.col("stop_hits") >= MIN_STOP_HITS) | (F.col("lang") != "en")
    return s.select(
        "doc_id",
        "lang",
        "n_tokens",
        T.portable_round(mean_len, 4).alias("mean_word_len"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        flag_wc.cast("long").alias("flag_wordcount"),
        flag_ml.cast("long").alias("flag_meanlen"),
        flag_st.cast("long").alias("flag_stop"),
        (flag_wc & flag_ml & flag_st).cast("long").alias("passes"),
    )


@register(
    "corpus_composition_card",
    oracle=f"""
    WITH f AS (
      SELECT source, lang, doc_id,
             len({_SQL_TOKENS}) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    m AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM f)
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dups,
           floor(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0
             AS mean_tokens,
           floor(CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
    FROM m GROUP BY source, lang
    """,
    tags=("quality", "llm-pipeline", "aggregate"),
)
def corpus_composition_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus datasheet ("data card") aggregation: per (source, lang)
    slice — document count, total tokens, mean document length, and the
    exact-duplicate rate (documents whose normalized-content fingerprint
    already appeared under a smaller doc_id). This is the composition
    table every training-data release publishes, and the monitoring
    signal that catches a source suddenly flooding duplicates.

    Two shuffles, both narrow: the fingerprint window moves (fp, doc_id)
    pairs (16-byte keys, never text), and the final groupBy is
    cardinality-bounded by sources × languages. All counts exact
    integers; the two ratios are single portable divisions."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp")
    sized = d.select(
        "source", "lang", "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
    ).withColumn("keeper", F.min("doc_id").over(w))
    is_dup = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    return (
        sized.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(is_dup).alias("n_exact_dups"),
        )
        .select(
            "source", "lang", "n_docs", "total_tokens", "n_exact_dups",
            (F.floor(F.col("total_tokens").cast("double") / F.col("n_docs") * 100.0 + 0.5) / 100.0)
            .alias("mean_tokens"),
            (
                F.floor(
                    F.col("n_exact_dups").cast("double") / F.col("n_docs") * 1000000.0 + 0.5
                )
                / 1000000.0
            ).alias("dup_frac"),
        )
    )


CHISQ_SCALE = 1000  # contributions reported in milli-units


@register(
    "chisq_independence_source_lang",
    oracle=f"""
    WITH cell AS (
      SELECT source, lang, CAST(count(*) AS HUGEINT) AS o
      FROM documents GROUP BY 1, 2),
    r AS (SELECT source, sum(o) AS rt FROM cell GROUP BY 1),
    c AS (SELECT lang, sum(o) AS ct FROM cell GROUP BY 1),
    n AS (SELECT sum(o) AS nt FROM cell)
    SELECT cell.source, cell.lang,
           CAST(cell.o AS BIGINT) AS observed,
           CAST(({CHISQ_SCALE} * (cell.o * n.nt - r.rt * c.ct)
                 * (cell.o * n.nt - r.rt * c.ct))
                // (n.nt * r.rt * c.ct) AS BIGINT) AS contrib_milli
    FROM cell
    JOIN r ON r.source = cell.source
    JOIN c ON c.lang = cell.lang
    CROSS JOIN n
    """,
    tags=("quality", "statistics"),
)
def chisq_independence_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between document source and
    language, EXACT: per contingency cell the scaled contribution
    floor(1000·(O·N − R·C)² / (N·R·C)) — algebraically identical to
    1000·(O − E)²/E with E = R·C/N, but with the division deferred to a
    single integral floor-div so no fraction is ever represented.
    Σ contrib_milli / 1000 is the chi-square statistic to milli
    precision — the "is my cheap classifier's output correlated with
    the sampling source?" audit behind lang_id_confusion.

    Intermediates reach O²·N² ≈ 1e22 at sf1 — past BIGINT — so both
    engines compute in 38-digit integers (Spark DECIMAL(38,0) with the
    integral `div`, DuckDB HUGEINT with `//`; operands positive, so
    floor == trunc and the engines agree bit-for-bit). Scale shape: one
    scan collapses to |sources|×|langs| cells; everything after is
    dimension-sized broadcast arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    # the contingency cells feed row totals, column totals, the grand
    # total AND the output join — materialize the |source×lang| table
    # once or the documents scan runs four times (non-CSE)
    cell = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    r = cell.groupBy("source").agg(F.sum("o").alias("rt"))
    c = cell.groupBy("lang").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("nt"))
    dec = "DECIMAL(38,0)"
    joined = (
        cell.join(F.broadcast(r), "source")
        .join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            "o",
            F.expr(f"CAST(o AS {dec})").alias("ob"),
            F.expr(f"CAST(rt AS {dec})").alias("rb"),
            F.expr(f"CAST(ct AS {dec})").alias("cb"),
            F.expr(f"CAST(nt AS {dec})").alias("nb"),
        )
    )
    return joined.select(
        "source",
        "lang",
        F.col("o").cast("long").alias("observed"),
        F.expr(
            f"CAST(({CHISQ_SCALE} * (ob * nb - rb * cb) * (ob * nb - rb * cb))"
            " div (nb * rb * cb) AS BIGINT)"
        ).alias("contrib_milli"),
    )


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_SQL_TOKENS}) AS tok FROM documents),
    cf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    tot AS (SELECT {T.sql_mlog2('sum(c)')} AS mt FROM cf),
    scored AS (
      SELECT t.doc_id, t.lang,
             CAST((count(*) * (SELECT mt FROM tot) - sum({T.sql_mlog2('cf.c')}))
                  // count(*) AS BIGINT) AS ppl_milli_bits
      FROM toks t JOIN cf USING (tok) GROUP BY 1, 2),
    hist AS (SELECT lang, ppl_milli_bits, count(*) AS cnt FROM scored GROUP BY 1, 2),
    nl AS (SELECT lang, sum(cnt) AS n FROM hist GROUP BY 1),
    cum AS (
      SELECT lang, ppl_milli_bits,
             sum(cnt) OVER (PARTITION BY lang ORDER BY ppl_milli_bits
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist),
    bkt AS (
      SELECT c.lang, c.ppl_milli_bits,
             CASE WHEN 3 * c.cum <= nl.n THEN 'head'
                  WHEN 3 * c.cum <= 2 * nl.n THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM cum c JOIN nl ON nl.lang = c.lang)
    SELECT s.doc_id, s.lang, s.ppl_milli_bits, b.bucket
    FROM scored s
    JOIN bkt b ON b.lang = s.lang AND b.ppl_milli_bits = s.ppl_milli_bits
    """,
    tags=("quality", "llm-pipeline", "text", "statistics"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document by unigram-LM surprisal and split each LANGUAGE into
    head / middle / tail terciles — the partition CCNet uses to keep
    head+middle and drop (or downweight) tail for LM training data.

    The score is exact where CCNet's is float: per-token surprisal
    −log2 P(tok) = mlog2(T) − mlog2(c_tok) in MILLI-BITS (the
    functions.text.mlog2 portable integer log), so the per-doc mean
    surprisal ppl_milli_bits = (n·mlog2(T) − Σ mlog2(c)) div n is an
    order-independent integer — no float log accumulation, both engines
    floor identically (numerator ≥ 0 since c ≤ T).

    The tercile cut is the distinct-value cumulative-histogram pattern
    (the same machinery as weighted_median_price_by_flag, per the
    round-2 verdict's de-globalization guidance): bucket by VALUE, not
    row rank — ties land in the same bucket (CCNet-faithful: equal
    perplexity, equal fate), and the only window runs over the BOUNDED
    (lang × distinct milli-score) dimension (score ∈ [0, mlog2(T)] —
    ~50k values at 100 TB), never over documents.

    Scale shape: one vocabulary shuffle (term frequencies, map-side
    combined), one token→cf join + per-doc aggregate; the scored
    doc-level table is localCheckpointed because it feeds both the
    histogram and the final bucket join (Catalyst does not CSE — the
    round-3 duplicate-scan lesson), and it IS the artifact a CCNet
    pipeline persists. The bucket map broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    cf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cf.agg(F.sum("c").alias("t")).select(T.mlog2(F.col("t")).alias("mt"))
    scored = (
        toks.join(cf, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(T.mlog2(F.col("c"))).alias("sum_mc"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "CAST((n_tokens * mt - sum_mc) div n_tokens AS BIGINT)"
            ).alias("ppl_milli_bits"),
        )
        .localCheckpoint(eager=True)
    )
    hist = (
        scored.groupBy("lang", "ppl_milli_bits")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    nl = hist.groupBy("lang").agg(F.sum("cnt").alias("n"))
    w_cum = Window.partitionBy("lang").orderBy("ppl_milli_bits")
    cum = hist.select("lang", "ppl_milli_bits", F.sum("cnt").over(w_cum).alias("cum"))
    bkt = cum.join(F.broadcast(nl), "lang").select(
        "lang",
        "ppl_milli_bits",
        F.when(3 * F.col("cum") <= F.col("n"), F.lit("head"))
        .when(3 * F.col("cum") <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return scored.join(F.broadcast(bkt), ["lang", "ppl_milli_bits"]).select(
        "doc_id", "lang", "ppl_milli_bits", "bucket"
    )


# Counted alphabet for the entropy filter: lowercase alphanumerics +
# space. Bounded and explicit so the per-char count can be computed
# IN-ROW (length-difference trick) — no explode, no shuffle.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
LOW_ENTROPY_MILLI = 3000  # < 3 bits/char ⇒ repetitive / template text


def _entropy_exprs() -> tuple[str, str]:
    """(n_expr, sum_expr): total counted chars and Σ cnt·mlog2(cnt) over
    the alphabet, as ONE SQL expression string each (the simhash
    build-a-string pattern: 37 Column-tree terms would cost hundreds of
    py4j round-trips per query construction; identical text runs on
    DuckDB). cnt_c = len(s) − len(replace(s, c, ''))."""
    from streamprocessing_spark.functions.text import sql_mlog2

    def cnt(ch: str) -> str:
        lit = "' '" if ch == " " else f"'{ch}'"
        return f"(length(s) - length(replace(s, {lit}, '')))"

    n = " + ".join(cnt(c) for c in ENTROPY_ALPHABET)
    s = " + ".join(
        f"(CASE WHEN {cnt(c)} > 0 THEN {cnt(c)} * {sql_mlog2(cnt(c))} ELSE 0 END)"
        for c in ENTROPY_ALPHABET
    )
    return n, s


def _sql_char_entropy() -> str:
    from streamprocessing_spark.functions.text import sql_mlog2

    n_e, s_e = _entropy_exprs()
    ent = f"{sql_mlog2('n')} - sm // n"
    return f"""
    WITH base AS (SELECT doc_id, lower(text) AS s FROM documents),
    c AS (SELECT doc_id, {n_e} AS n, {s_e} AS sm
          FROM base)
    SELECT doc_id, CAST(n AS BIGINT) AS n_counted,
           CAST({ent} AS BIGINT) AS entropy_milli_bits,
           CAST(CASE WHEN {ent} < {LOW_ENTROPY_MILLI}
                THEN 1 ELSE 0 END AS BIGINT) AS low_entropy
    FROM c WHERE n > 0
    """


@register(
    "char_entropy_filter",
    oracle=_sql_char_entropy(),
    tags=("quality", "llm-pipeline", "text", "filter"),
)
def char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality filter — the classic cheap screen for
    template spam, keyboard mash and base64/hex blobs: Shannon entropy
    of the document's character distribution over a fixed 37-symbol
    alphabet, H = log2(n) − Σ cnt·log2(cnt)/n, in exact milli-bits via
    mlog2 (every term an integer; the single div n floors identically —
    numerator ≥ 0 since cnt ≤ n). Natural English sits ~4 bits/char;
    'aaaa…' scores 0; docs under {LOW_ENTROPY_MILLI} milli-bits flag.

    The 100 TB shape is the point: per-char counts come from the
    length-difference trick (len(s) − len(replace(s, c, ''))), so the
    WHOLE filter is a single projection over the scan — zero shuffle,
    zero explode, no token table; it composes into any ingest scan for
    free (predicate-pushdown friendly), unlike entropy-via-groupBy
    which would shuffle corpus-bytes of (doc, char) rows."""
    d = load_table(spark, sf_dir, "documents")
    n_e, s_e = _entropy_exprs()
    from streamprocessing_spark.functions.text import sql_mlog2
    from streamprocessing_spark.partitioning import fan_out

    ent = f"{sql_mlog2('n')} - sm div n"
    # fan the single-split scan out (the projection is ~37 replace()
    # passes per row — scan parallelism is the whole cost), and filter
    # BEFORE computing n: the old ``where(n > 0)`` was pushed below the
    # projection, so the entire 37-replace chain evaluated twice per row
    # (once in the Filter, once in the Project). n > 0 ⟺ the lowered
    # text contains ≥ 1 alphabet char — one cheap rlike.
    return (
        fan_out(d, "doc_id")
        .select("doc_id", F.lower(F.col("text")).alias("s"))
        .where(F.expr("s rlike '[a-z0-9 ]'"))
        .select("doc_id", F.expr(n_e).alias("n"), F.expr(s_e).alias("sm"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_counted"),
            F.expr(f"CAST({ent} AS BIGINT)").alias("entropy_milli_bits"),
            F.expr(
                f"CAST(CASE WHEN {ent} < {LOW_ENTROPY_MILLI} THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("low_entropy"),
        )
    )


@register(
    "mutual_information_source_lang",
    oracle=f"""
    WITH cell AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2),
    r AS (SELECT source, sum(o) AS rt FROM cell GROUP BY 1),
    c AS (SELECT lang, sum(o) AS ct FROM cell GROUP BY 1),
    n AS (SELECT sum(o) AS nt FROM cell),
    contrib AS (
      SELECT cell.source, cell.lang, cell.o,
             cell.o * ({T.sql_mlog2('cell.o * n.nt')}
                       - {T.sql_mlog2('r.rt * c.ct')}) AS q
      FROM cell
      JOIN r ON r.source = cell.source
      JOIN c ON c.lang = cell.lang
      CROSS JOIN n),
    tot AS (SELECT sum(q) AS qs FROM contrib)
    SELECT contrib.source, contrib.lang,
           CAST(contrib.o AS BIGINT) AS observed,
           CAST(contrib.q AS BIGINT) AS contrib_q,
           CAST(tot.qs // n.nt AS BIGINT) AS mi_milli_bits
    FROM contrib CROSS JOIN tot CROSS JOIN n
    """,
    tags=("quality", "statistics", "llm-pipeline"),
)
def mutual_information_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(source; lang) in exact milli-bits — the
    feature-selection / leakage-strength companion to
    chisq_independence_source_lang: chi-square answers "is the
    dependence statistically surprising", MI answers "how many BITS does
    knowing the source tell you about the language" — the number a
    curation pipeline compares against downstream probe accuracy before
    deciding a metadata column leaks label information into a split.

    Exact integer arithmetic via the mlog2 quantization: each cell's
    contribution q = O·(mlog2(O·N) − mlog2(R·C)) quantizes
    O·1000·log2(O·N/(R·C)) once per cell, so the corpus statistic
    mi_milli_bits = (Σ q) div N is a pure BIGINT pipeline — no float
    ever forms and the row hash-matches bit-for-bit. Truncating div on
    both engines (Σq may be slightly negative near independence — the
    quantization noise of a true MI ≈ 0; document-level truth keeps
    MI ≥ 0). mlog2's portability margin is argued for k < 2²²; the
    products O·N and R·C exceed that only as DIMENSION-sized scalars
    (|sources|·|langs| cells), where the per-value boundary-collision
    chance is ~1e-11 each — the same corpus-total-scalar argument as
    ccnet_perplexity_buckets' mlog2(T).

    Scale shape identical to the chi-square: one scan collapses to
    |sources|×|langs| cells; marginals, the grand total, and the MI
    reduction are all dimension-sized broadcast arithmetic after that."""
    d = load_table(spark, sf_dir, "documents")
    cell = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)  # feeds marginals, total, and output
    )
    r = cell.groupBy("source").agg(F.sum("o").alias("rt"))
    c = cell.groupBy("lang").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("nt"))
    contrib = (
        cell.join(F.broadcast(r), "source")
        .join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            "o",
            "nt",
            (
                F.col("o")
                * (T.mlog2(F.col("o") * F.col("nt")) - T.mlog2(F.col("rt") * F.col("ct")))
            ).alias("q"),
        )
        .localCheckpoint(eager=True)  # cell-sized; feeds the total and output
    )
    tot = contrib.agg(F.sum("q").alias("qs"))
    return contrib.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        F.col("o").cast("long").alias("observed"),
        F.col("q").cast("long").alias("contrib_q"),
        F.expr("CAST(qs div nt AS BIGINT)").alias("mi_milli_bits"),
    )


CONFORMAL_ALPHA_PCT = 5  # miscoverage level alpha = 5%


def _sql_conformal() -> str:
    from streamprocessing_spark.functions.text import sql_mlog2

    n_e, s_e = _entropy_exprs()
    ent = f"{sql_mlog2('n')} - sm // n"
    return f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS h,
             CAST({ent} AS BIGINT) AS score
      FROM (SELECT doc_id, {n_e} AS n, {s_e} AS sm
            FROM (SELECT doc_id, lower(text) AS s FROM documents))
      WHERE n > 0),
    cal AS (SELECT score FROM scored WHERE h >= 80 AND h < 90),
    ev  AS (SELECT score FROM scored WHERE h >= 90),
    nc AS (SELECT count(*) AS n_cal,
                  ({CONFORMAL_ALPHA_PCT} * (count(*) + 1)) // 100 AS k
           FROM cal),
    hist AS (SELECT score, count(*) AS c FROM cal GROUP BY 1),
    cum AS (SELECT score,
                   sum(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS f
            FROM hist),
    thr AS (SELECT min(score) AS threshold
            FROM cum CROSS JOIN nc WHERE nc.k >= 1 AND cum.f >= nc.k)
    SELECT CAST(nc.n_cal AS BIGINT) AS n_cal,
           CAST(nc.k AS BIGINT) AS k,
           CAST(thr.threshold AS BIGINT) AS threshold_milli_bits,
           CAST((SELECT count(*) FROM ev) AS BIGINT) AS n_eval,
           CAST((SELECT count(*) FROM ev
                 WHERE thr.threshold IS NOT NULL AND ev.score < thr.threshold)
                AS BIGINT) AS n_flagged
    FROM nc CROSS JOIN thr
    """


@register(
    "conformal_quality_threshold",
    oracle=_sql_conformal(),
    tags=("quality", "statistics", "llm-pipeline"),
)
def conformal_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal anomaly threshold for the char-entropy quality
    score (Vovk's conformal prediction, the Angelopoulos-Bates split
    recipe): from the held-out calibration slice (the shared md5
    'valid' split), q̂ = the k-th smallest calibration score with
    k = ⌊α·(n_cal+1)⌋ — then flagging eval docs with score < q̂ carries
    the FINITE-SAMPLE guarantee P(flag a clean doc) ≤ α = {CONFORMAL_ALPHA_PCT}%
    under exchangeability, with no distributional assumption. This is
    how a curation pipeline turns any heuristic score into a filter
    with a certified false-positive budget (the fixed-cutoff tiers like
    char_entropy_filter promise nothing).

    Exact integers: scores are the mlog2 milli-bit entropies, k is one
    floor-div, and the order statistic comes from a cumulative count
    over the DISTINCT-SCORE histogram — bounded by the score domain
    (≤ mlog2(len) distinct milli-bit values at any corpus size; the
    dedup_signal_auc window class), never by doc count. Degenerate
    calibration (k = 0, fewer than ~20 docs at α=5%) yields a NULL
    threshold and zero flags — refuse-to-certify, the honest conformal
    answer. Scale: one scan scores everything (zero-shuffle length
    arithmetic), one histogram aggregate, dimension-sized everything
    after."""
    d = load_table(spark, sf_dir, "documents")
    n_e, s_e = _entropy_exprs()
    from streamprocessing_spark.functions.text import sql_mlog2

    ent = f"{sql_mlog2('n')} - sm div n"
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    scored = (
        d.select("doc_id", F.lower(F.col("text")).alias("s"))
        .select("doc_id", F.expr(n_e).alias("n"), F.expr(s_e).alias("sm"))
        .where(F.col("n") > 0)
        .select(h.alias("h"), F.expr(f"CAST({ent} AS BIGINT)").alias("score"))
        .localCheckpoint(eager=True)  # feeds cal histogram, counts, eval flags
    )
    cal = scored.where((F.col("h") >= 80) & (F.col("h") < 90)).select("score")
    ev = scored.where(F.col("h") >= 90).select("score")
    nc = cal.agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.expr(f"CAST(({CONFORMAL_ALPHA_PCT} * (count(*) + 1)) div 100 AS BIGINT)").alias("k"),
    )
    hist = cal.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window as W

    w_cum = W.orderBy("score").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select("score", F.sum("c").over(w_cum).alias("f"))
    thr = (
        cum.crossJoin(F.broadcast(nc))
        .where((F.col("k") >= 1) & (F.col("f") >= F.col("k")))
        .agg(F.min("score").alias("threshold"))
    )
    ev_stats = ev.crossJoin(F.broadcast(thr)).agg(
        F.count(F.lit(1)).alias("n_eval"),
        # coalesce: SUM over an empty eval slice is NULL in Spark where the
        # oracle's filtered COUNT(*) is 0
        F.coalesce(
            F.sum(
                F.when(
                    F.col("threshold").isNotNull() & (F.col("score") < F.col("threshold")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_flagged"),
    )
    return (
        nc.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(ev_stats))
        .select(
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("k").cast("long").alias("k"),
            F.col("threshold").cast("long").alias("threshold_milli_bits"),
            F.col("n_eval").cast("long").alias("n_eval"),
            F.col("n_flagged").cast("long").alias("n_flagged"),
        )
    )
