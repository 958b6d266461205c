"""Deduplication operators for training-data pipelines.

Four tiers, each with an engine-portable deterministic formulation (the
DuckDB oracle replicates the identical hash arithmetic, so LSH results are
bit-for-bit checkable — no "approximate" fudge in the correctness gate):

1. exact     — md5 fingerprint of normalized text, group-by (16 B/row
               shuffle instead of the full text).
2. n-gram Jaccard — exact word-k-gram set similarity over all candidate
               pairs (pairs sharing ≥1 shingle). Quadratic in bucket size;
               the correctness baseline for the LSH tiers.
3. MinHash + LSH — 64 portable min-hashes, 16 bands × 4 rows; candidates
               from band-bucket self-join, verified with exact Jaccard.
               THE scale path: shuffle is O(docs × bands), never all-pairs.
4. SimHash   — 60-bit simhash; candidate pairs from 4×15-bit chunk
               banding. Pigeonhole: hamming ≤ 3 ⇒ some chunk equal, so
               banding is EXACT (100% recall) for the d≤3 cut — the banded
               plan provably equals the brute-force oracle.

Portability of the hash primitives (identical in Spark and DuckDB):
  h32(s)  = int(md5(s)[:8], 16)          ∈ [0, 2^32)
  h60(s)  = int(md5(s)[:15], 16)         ∈ [0, 2^60)
  mh_j    = min over shingles of (a_j * h32 + b_j) mod 2^32, with
            a_j < 2^31 odd, b_j < 2^31 — products stay under 2^63, no
            signed-64 overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from streamprocessing_spark.functions.text import SQL_TOKENS, TOKEN_RE, portable_round
from streamprocessing_spark.partitioning import fan_out

K_SHINGLE = 3
NUM_HASHES = 64
BANDS = 16
ROWS_PER_BAND = 4
MOD32 = 1 << 32
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = 15

assert BANDS * ROWS_PER_BAND == NUM_HASHES
assert SIMHASH_CHUNKS * SIMHASH_CHUNK_BITS == SIMHASH_BITS


def _coeffs(n: int = NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) for the universal-hash family — plain
    arithmetic, no RNG, so the DuckDB oracle regenerates the same values.
    Pure in j: the fixed tier's 64 and the count-scaled tier's b(r)·RMAX
    coefficients agree on every shared index."""
    out = []
    for j in range(n):
        a = (((2 * j + 1) * 2654435761) % (1 << 31)) | 1
        b = ((j * 40503) + 12345) % (1 << 31)
        out.append((a, b))
    return out


COEFFS = _coeffs()

# Count-scaled MinHash banding (VERDICT r05 item #2 — the in-family
# remedy for the fixed 16×4 candidate law, same scale law the SRP tiers
# already carry): r(n) = clamp(ceil(log2 n) − MH_R_SHIFT, RMIN, RMAX)
# minhashes per band grows one hash per corpus doubling, bounding
# expected bucket occupancy where frozen r lets candidate volume grow
# superlinearly (SCALEBENCH: dedup_minhash_lsh ×20.4 at the 10× proxy).
# Bands grow alongside — b(r) = ceil(b0·ln(1−t^r0)/ln(1−t^r)) holds the
# fixed tier's design recall 1−(1−t^4)^16 ≈ 0.9998 at t = 0.8 — so the
# scaled tier trades SIGNATURE cost (b·r hashes: 64 at r=4 → 368 at
# r=8, the geometric price recall-holding demands) for candidate volume
# that stays ~linear in n. Hash j of band i is coefficient index
# i·MH_RMAX + j on BOTH engines, so the pipeline stays bit-exact-
# oracleable at every count. Production at 100 TB raises RMAX and
# re-derives SHIFT so 2^r ∝ n holds across the corpus range.
MH_RMIN = 4
MH_RMAX = 8
MH_R_SHIFT = 7
MH_RECALL_BANDS = {4: 16, 5: 22, 6: 28, 7: 36, 8: 46}


def mh_r_for_count(n_rows: int) -> int:
    """r(n) = clamp(ceil(log2 n) − MH_R_SHIFT, MH_RMIN, MH_RMAX) via exact
    integer arithmetic ((n−1).bit_length() == ceil(log2 n) for n ≥ 2) —
    the same value the oracle's ceil(log2(count)) derives."""
    return min(MH_RMAX, max(MH_RMIN, (max(n_rows, 2) - 1).bit_length() - MH_R_SHIFT))


# ---------------------------------------------------------------- Spark side


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def shingle_df(df: DataFrame, id_col: str, text_col: str, k: int = K_SHINGLE) -> DataFrame:
    """(id, sh): distinct word-k-gram shingles per document. Docs with
    fewer than k tokens have an empty shingle set and drop out (they can't
    be near-duplicates under set Jaccard).

    The token array is materialized in its own projection BEFORE the
    shingle lambda touches it: inlined, every element_at re-evaluates the
    regexp tokenizer (~3×shingle-count times per row — measured 10× slower
    at sf0.1). array_distinct already dedupes within a doc, so no extra
    distinct shuffle is needed."""
    toked = fan_out(df, id_col).select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    t = F.col("t")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(k)]),
    )
    return (
        toked.where(F.size(t) >= k)
        .select("id", F.explode(F.array_distinct(shingles)).alias("sh"))
    )


def minhash_signature_df(shingles: DataFrame) -> DataFrame:
    """(id, mh: array<bigint>[NUM_HASHES]): one aggregation pass computes
    all minhashes — map-side partial min keeps the shuffle at one row per
    doc.

    The md5-derived base hash is materialized ONCE per shingle in a
    projection before the aggregate: Catalyst does not CSE across
    aggregate expressions, so inlining it would evaluate md5 64× per row
    (measured ~4× slower end-to-end at sf0.1).

    The 64 min-aggregates are built as ONE SQL expression string rather
    than 64 Column trees: each pyspark Column operator is a py4j
    round-trip, and the per-query driver cost of ~400 round-trips
    (~0.5 s) dwarfed the JVM-side work at bench scale. Same Catalyst
    plan, one parse."""
    hashed = shingles.select("id", _h32(F.col("sh")).alias("h"))
    mins = ", ".join(f"min(({a} * h + {b}) % {MOD32})" for a, b in COEFFS)
    return hashed.groupBy("id").agg(F.expr(f"array({mins})").alias("mh"))


def _band_buckets(sig: DataFrame) -> DataFrame:
    """(id, band, sig-string): each signature exploded into its LSH band
    buckets — the join key of every candidate-generation variant."""
    band_structs = ", ".join(
        "struct({b} AS band, concat_ws('-', {cols}) AS sig)".format(
            b=b,
            cols=", ".join(f"mh[{b * ROWS_PER_BAND + r}]" for r in range(ROWS_PER_BAND)),
        )
        for b in range(BANDS)
    )
    return sig.select("id", F.explode(F.expr(f"array({band_structs})")).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """(id_a, id_b): pairs sharing at least one band signature.

    Bands are exploded to (id, band, sig-string) and self-joined on
    (band, sig): the shuffle key is the band signature, so work scales
    with bucket sizes (near-duplicate clusters), never all-pairs."""
    buckets = _band_buckets(sig)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_on_pairs(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id_a, id_b, jaccard): exact Jaccard for the given candidate pairs —
    the verification stage after any LSH prefilter."""
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col("id").alias("id_a"), "sh")
    sb = shingles.select(F.col("id").alias("id_b"), "sh")
    common = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingler=None,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold; candidates are pairs
    sharing ≥1 shingle (anything below that has jaccard 0). Quadratic in
    shingle-bucket size — correctness baseline; use minhash_lsh_pairs at
    scale.

    ONE shingle self-join: the common-shingle count comes straight from
    grouping the join output (exactly the oracle's ``common`` CTE) — no
    separate candidate pass + re-join. ``shingler`` selects the shingle
    function (word shingle_df by default; char_shingle_df for short
    texts)."""
    # checkpoint the shingle set — three consumers (sizes + both join
    # sides); see minhash_lsh_pairs' note
    sh = (shingler or shingle_df)(df, id_col, text_col).localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("id").alias("id_a"), "sh")
    sb = sh.select(F.col("id").alias("id_b"), "sh")
    common = (
        sa.join(sb, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def minhash_incremental_pairs(
    new_df: DataFrame, old_df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Incremental-ingest dedup: (new_id, dup_of, jaccard) for NEW-batch
    documents that near-duplicate an EXISTING-corpus document — the
    daily-crawl pattern where a fresh increment is deduplicated against
    everything already ingested without re-pairing the whole corpus.

    Candidates come from joining the new batch's band buckets against
    the corpus bucket table on (band, sig): work is O(new × bands) probe
    rows against bucketed state, never corpus × corpus. In production
    the corpus side's signatures/buckets are the PERSISTED output of
    prior runs (a bucketed table keyed on (band, sig) — zero-shuffle
    probe via sources/bucketing); here both sides derive from the same
    scan so the oracle can replay the whole computation. Verification is
    the usual exact-Jaccard stage over the union of shingle sets."""
    sh_new = shingle_df(new_df, id_col, text_col)
    sh_old = shingle_df(old_df, id_col, text_col)
    bn = _band_buckets(minhash_signature_df(sh_new)).alias("a")
    bo = _band_buckets(minhash_signature_df(sh_old)).alias("b")
    cand = (
        bn.join(
            bo,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_all = sh_new.unionByName(sh_old)
    return (
        jaccard_on_pairs(sh_all, cand)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def sql_minhash_incremental(threshold: float, new_pred: str) -> str:
    """DuckDB mirror of minhash_incremental_pairs: identical shingles,
    hash family, banding; candidates join new-side buckets against
    old-side buckets (``new_pred`` over ``id`` selects the new batch)."""
    h = sql_h32("sh")
    mins = ",\n           ".join(
        f"min(({a} * {h} + {b}) % {MOD32}) AS mh_{j}" for j, (a, b) in enumerate(COEFFS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT id, {b} AS band, {sig} AS sig FROM sig_t".format(
            b=b,
            sig=" || '-' || ".join(
                f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
    WITH {sql_shingles()},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig_t AS (SELECT id,
           {mins}
           FROM sh GROUP BY id),
    buckets AS (
{band_rows}
    ),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM buckets a
             JOIN buckets b ON a.band = b.band AND a.sig = b.sig
             WHERE ({new_pred.format(id='a.id')})
               AND NOT ({new_pred.format(id='b.id')})),
    common AS (SELECT c.id_a, c.id_b, count(*) AS c
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / (sa.n + sb.n - c.c)) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.id
    JOIN sizes sb ON c.id_b = sb.id
    WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {threshold}
    """


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str, threshold: float) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard-verified.

    The full scale path: shingle → 64 minhashes (one agg) → band buckets
    (16×4) → bucket self-join → verify. Detection probability for a pair
    at similarity s is 1-(1-s^4)^16 (≈1-4e-8 at s=0.9), and the verify
    stage makes precision exact, so for well-separated corpora the result
    set equals the brute-force oracle's.
    """
    # The shingle set feeds the signature pass AND three verify-stage
    # consumers (sizes + both join sides) with DIFFERENT projections and
    # keys, so exchange reuse never applies and the tokenize + shingle
    # explode re-ran up to 4× per build. A round-8 note here claimed
    # materialization cost more than recompute; re-measured in round 10
    # AFTER the fan_out change (the recompute is no longer hidden behind
    # a single-core scan the other consumers wait on): checkpointing the
    # shingle set roughly halves the scaled build (7.4 → 3.0 s at sf0.1)
    # — and gives every downstream join ACCURATE runtime stats instead
    # of the collapsed explode-derived static estimate (the same class
    # of mis-estimate as the round-9 paragraph broadcast cliff). Lazy:
    # the signature aggregation materializes it.
    sh = shingle_df(df, id_col, text_col).localCheckpoint(eager=False)
    cand = lsh_candidate_pairs(minhash_signature_df(sh))
    return (
        jaccard_on_pairs(sh, cand)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def scaled_band_buckets(sh: DataFrame, n_rows: int) -> DataFrame:
    """(id, band, sig) under the COUNT-SCALED banding law — r(n) hashes
    per band, recall-held b(r) bands, coefficient index i·MH_RMAX + j
    (the law minhash_lsh_pairs_scaled's oracle replays). Factored out
    (round 10) so the streaming paragraph-ingest twin probes its
    persisted band store with byte-identical bucket keys.

    Round 11 (guide §2.3 narrower keys / §3.1 join keys, VERDICT r10
    item #3): ``sig`` is ONE xxhash64 BIGINT over (band, the band's r
    minhash values) instead of the old '-'-joined decimal string
    (~r·11 chars). Two buckets collide on sig iff their (band, minhash
    tuple) agree — up to xxhash64 collisions (~2⁻⁶⁴ per distinct-tuple
    pair), which can only ADD candidates, and every scaled-tier
    consumer (batch pair builds, the streaming paragraph ingest) passes
    candidates through the exact-Jaccard ≥ threshold verify, so the
    emitted pair set is unchanged. The band index is hashed IN, so the
    single bigint is the entire bucket key: the band-bucket self-join
    sorts/shuffles 8-byte longs instead of ~50-byte strings (the same
    single-key win as the triangle closure's packed bigint). The
    candidate-EXPOSING audits (mhaudit, the recall curve) live on the
    fixed 16×4 tier (_band_buckets), which keeps its string sig —
    their outputs are candidate-derived and stay byte-identical."""
    r = mh_r_for_count(n_rows)
    bands = MH_RECALL_BANDS[r]
    coeffs = _coeffs(bands * MH_RMAX)
    hashed = sh.select("id", _h32(F.col("sh")).alias("h"))
    mins = ", ".join(
        "min(({a} * h + {b}) % {m})".format(
            a=coeffs[i * MH_RMAX + j][0], b=coeffs[i * MH_RMAX + j][1], m=MOD32
        )
        for i in range(bands)
        for j in range(r)
    )
    sig = hashed.groupBy("id").agg(F.expr(f"array({mins})").alias("mh"))
    band_structs = ", ".join(
        "struct({i} AS band, xxhash64({i}, {cols}) AS sig)".format(
            i=i, cols=", ".join(f"mh[{i * r + j}]" for j in range(r))
        )
        for i in range(bands)
    )
    return sig.select(
        "id", F.explode(F.expr(f"array({band_structs})")).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def minhash_lsh_pairs_scaled(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n_rows: int,
    merge_hint: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with CORPUS-SCALED banding —
    r(n) minhashes per band and recall-held b(r) bands derived from a
    driver-side metadata count (the resolution analogue of AQE deriving
    partitioning from runtime stats; cf. srp_lsh_cosine_pairs_recall_held,
    operators/similarity.py). Doubling the corpus adds one hash per
    band, holding expected bucket occupancy — candidates stay ~linear in
    n where the frozen 16×4 tier's volume grows superlinearly — while
    b(r) grows so detection probability at the threshold stays at the
    fixed tier's 1−(1−t⁴)¹⁶ design point. Verification is the same exact
    Jaccard, so precision is exact at every (r, b).

    Only the b·r needed aggregates are computed (hash j of band i =
    coefficient index i·MH_RMAX + j — the index law the oracle replays);
    the one aggregation pass and the band-bucket self-join keep the plan
    shape identical to the fixed tier's pinned plan."""
    # checkpoint the shingle set — four consumers with different keys;
    # see minhash_lsh_pairs' note (measured 7.4 → 3.0 s at sf0.1).
    # ``merge_hint``: the checkpoint is a materialization barrier, so a
    # hint the CALLER put on ``df`` no longer reaches the joins above it
    # — the paragraph tier re-applies its anti-broadcast discipline here
    # (every relation derived from the shingle set is corpus-sized by
    # construction; the round-9 ×100 cliff pin requires zero broadcasts
    # in this build at every fixture scale).
    sh = shingle_df(df, id_col, text_col).localCheckpoint(eager=False)
    if merge_hint:
        sh = sh.hint("merge")
    buckets = scaled_band_buckets(sh, n_rows)
    a, b = buckets.alias("a"), buckets.alias("b")
    # the band index is folded into the xxhash64 sig (round 11), so the
    # self-join keys on ONE bigint — an equality on band as well would
    # only re-check what the hash already encodes while widening the
    # sort/shuffle key
    cand = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        jaccard_on_pairs(sh, cand)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 60-bit simhash over term frequencies. Two narrow
    aggregations (doc×token counts, then 60 signed bit-sums per doc)."""
    toks = fan_out(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    # Hash BEFORE the shuffle: grouping on (id, h) ships 16 bytes/row
    # instead of token strings, and the md5 runs map-side exactly once.
    # Grouping by the 60-bit hash instead of the token is exact up to md5
    # collisions (~n²/2⁶¹); the oracle groups by the same hash.
    hashed = toks.select("id", _h60(F.col("tok")).alias("h"))
    tf = hashed.groupBy("id", "h").agg(F.count(F.lit(1)).alias("cnt"))
    # Both the 60 bit-sums and the bit-reassembly are single SQL
    # expression strings: building them as Column trees cost ~500 py4j
    # round-trips (~0.6 s driver time) per query construction.
    bit_sums = ", ".join(
        f"sum(cnt * (CASE WHEN shiftright(h, {i}) & 1 = 1 THEN 1 ELSE -1 END))"
        for i in range(SIMHASH_BITS)
    )
    sums = tf.groupBy("id").agg(F.expr(f"array({bit_sums})").alias("s"))
    sim = " + ".join(
        f"(CASE WHEN s[{i}] > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(SIMHASH_BITS)
    )
    return sums.select("id", F.expr(sim).cast("long").alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming): pairs within hamming distance max_hamming.

    Candidates via 4×15-bit chunk banding — exact for max_hamming ≤ 3 by
    pigeonhole (4 chunks, ≤3 differing bits ⇒ ≥1 chunk identical), so
    this banded plan returns exactly the brute-force result while keeping
    the join keyed on chunk values instead of all-pairs."""
    assert max_hamming < SIMHASH_CHUNKS, "banding recall guarantee needs max_hamming < #chunks"
    sim = simhash_df(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(j).alias("chunk_idx"),
                F.shiftright(F.col("simhash"), j * SIMHASH_CHUNK_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_CHUNK_BITS) - 1))
                .alias("chunk"),
            )
            for j in range(SIMHASH_CHUNKS)
        ]
    )
    buckets = sim.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------- DuckDB oracle SQL


def sql_shingles(table: str = "documents", id_col: str = "doc_id", k: int = K_SHINGLE) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
    toks AS (SELECT {id_col} AS id, {SQL_TOKENS} AS t FROM {table}),
    sh AS (SELECT DISTINCT id,
             unnest(list_transform(range(1, len(t) - {k - 2}), i -> {parts})) AS sh
           FROM toks WHERE len(t) >= {k})"""


def sql_h32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def sql_h60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_exact_jaccard(threshold: float) -> str:
    return f"""
    WITH {sql_shingles()},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / (sa.n + sb.n - c.c)) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.id
    JOIN sizes sb ON c.id_b = sb.id
    WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {threshold}
    """


def sql_minhash_lsh(threshold: float) -> str:
    h = sql_h32("sh")
    mins = ",\n           ".join(
        f"min(({a} * {h} + {b}) % {MOD32}) AS mh_{j}" for j, (a, b) in enumerate(COEFFS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT id, {b} AS band, {sig} AS sig FROM sig_t".format(
            b=b,
            sig=" || '-' || ".join(
                f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
    WITH {sql_shingles()},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig_t AS (SELECT id,
           {mins}
           FROM sh GROUP BY id),
    buckets AS (
{band_rows}
    ),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM buckets a
             JOIN buckets b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id),
    common AS (SELECT c.id_a, c.id_b, count(*) AS c
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / (sa.n + sb.n - c.c)) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.id
    JOIN sizes sb ON c.id_b = sb.id
    WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {threshold}
    """


def sql_minhash_lsh_scaled(
    threshold: float, table: str = "documents", id_col: str = "doc_id", pre: str = ""
) -> str:
    """DuckDB mirror of minhash_lsh_pairs_scaled: the oracle derives the
    SAME (r, b) from its own count(*) — ceil(log2 n) is exact on both
    engines for integer arguments — computes every band's full MH_RMAX
    hash list (static SQL can't know r at build time), and slices each
    list to r_t.r before concatenation; bands ≥ b(r) are filtered by the
    r_t.bt bound. Hash j of band i is coefficient index i·MH_RMAX + j,
    identical to the Spark side, so signatures — and therefore candidate
    sets and verified pairs — agree bit for bit at every corpus count.

    ``table``/``id_col``/``pre`` re-target the whole pipeline at a
    derived relation (round 9: paragraph-level dedup runs it over a
    ``paras`` CTE injected via ``pre``, with the (r, b) count taken from
    that same relation — the scale law follows the unit of dedup, not
    the document count)."""
    bmax = max(MH_RECALL_BANDS.values())
    coeffs = _coeffs(bmax * MH_RMAX)
    bt_case = " ".join(f"WHEN {r} THEN {b}" for r, b in sorted(MH_RECALL_BANDS.items()))
    band_lists = ",\n           ".join(
        "[{mins}] AS l_{i}".format(
            i=i,
            mins=", ".join(
                "CAST(min(({a} * h + {b}) % {m}) AS VARCHAR)".format(
                    a=coeffs[i * MH_RMAX + j][0], b=coeffs[i * MH_RMAX + j][1], m=MOD32
                )
                for j in range(MH_RMAX)
            ),
        )
        for i in range(bmax)
    )
    band_rows = "\n      UNION ALL\n".join(
        f"      SELECT id, {i} AS band,"
        f" array_to_string(list_slice(l_{i}, 1, r_t.r), '-') AS sig"
        f" FROM sig_t, r_t WHERE {i} < r_t.bt"
        for i in range(bmax)
    )
    return f"""
    WITH {pre}{sql_shingles(table, id_col)},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    r_t AS (SELECT r, CASE r {bt_case} END AS bt FROM (
      SELECT CAST(least({MH_RMAX}, greatest({MH_RMIN},
                 CAST(ceil(log2(greatest(count(*), 2))) AS INT) - {MH_R_SHIFT})) AS INT) AS r
      FROM {table})),
    hashed AS (SELECT id, {sql_h32('sh')} AS h FROM sh),
    sig_t AS (SELECT id,
           {band_lists}
           FROM hashed GROUP BY id),
    buckets AS (
{band_rows}
    ),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM buckets a
             JOIN buckets b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id),
    common AS (SELECT c.id_a, c.id_b, count(*) AS c
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / (sa.n + sb.n - c.c)) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.id
    JOIN sizes sb ON c.id_b = sb.id
    WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {threshold}
    """


def sql_simhash_pairs(max_hamming: int = 3) -> str:
    h = sql_h60("tok")
    bit_sums = ",\n           ".join(
        f"sum(cnt * (CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) AS s_{i}"
        for i in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s_{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (SELECT doc_id AS id, unnest({SQL_TOKENS}) AS tok FROM documents),
    tf AS (SELECT id, {h} AS h, count(*) AS cnt FROM toks GROUP BY id, {h}),
    sums AS (SELECT id, {bit_sums} FROM tf GROUP BY id),
    sim AS (SELECT id, {sim_expr} AS simhash FROM sums)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sim a JOIN sim b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every node attaches its strictly-LARGER
    neighbors to the minimum of its closed neighborhood. One groupBy for
    the neighborhood min, one join back — both keyed on the same node."""
    both = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = both.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    return (
        both.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        # no distinct here (round 10): the small-star half that always
        # follows ends in distinct, which dedups this output's
        # duplicates identically — dropping the mid-round exchange +
        # aggregation costs nothing in correctness (set-equal) and the
        # duplicate inflation is bounded by the pre-distinct edge count
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient every edge toward its larger endpoint,
    then attach each node's smaller-or-equal neighbors (and itself) to
    the neighborhood minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attach_nbrs = (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = m.select("u", F.col("m").alias("v"))
    return (
        attach_nbrs.unionByName(attach_self)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(pairs: DataFrame, max_iterations: int = 30) -> DataFrame:
    """(id, component): connected components over an undirected pair graph
    — the clustering step that turns near-duplicate PAIRS into dedup
    GROUPS (keep min id per component).

    Algorithm: alternating large-star / small-star contraction (Kiveris
    et al., 'Connected Components in MapReduce and Beyond', 2014) — the
    published MapReduce-scale CC algorithm. Unlike min-label propagation
    (O(diameter) rounds: a single long chain means hundreds of shuffles
    — observed on the 10× scale proxy, whose sign-flipped replicas build
    chain-shaped near-dup components), star contraction rewrites the
    EDGE SET itself toward a star forest and converges in O(log² n)
    rounds regardless of diameter; each round is two groupBy+join passes
    over the current (shrinking) edge list. Converged when a full
    large+small round leaves the edge set unchanged; the final edges are
    exactly (member → component-min) stars. The driver-side loop is
    inherent to iterative graph algorithms — each round is fully
    distributed; only the 1-row convergence check touches the driver.
    """
    # The pair GENERATION pipeline is evaluated exactly ONCE (round 10):
    # the id-pair projection is checkpointed first and nodes/edges both
    # derive from that materialization — the previous shape evaluated
    # the caller's pair build twice (once for the nodes checkpoint, once
    # for the edges checkpoint), which for an expensive pair source
    # (the phash band cascade, an uncached LSH tier) doubled the
    # dominant cost. Checkpoints are LAZY with the count() supplying the
    # materialization — an eager checkpoint runs its own internal count
    # job, so eager + count paid two driver jobs per materialization.
    # nodes come from the UNFILTERED pairs: a reflexive pair (x, x)
    # contributes no edge but node x must still appear (component = x),
    # matching the recursive-CTE oracle and the old implementation.
    base = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).localCheckpoint(eager=False)
    nodes = (
        base.select(F.col("u").alias("id"))
        .unionByName(base.select(F.col("v").alias("id")))
        .distinct()
    )
    edges = (
        base.where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=False)
    )
    prev_count = edges.count()
    for _ in range(max_iterations):
        # per-round lineage truncation (lazy; the count materializes it)
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        new_count = new_edges.count()
        # star forest ⇒ both ops are no-ops ⇒ edge set unchanged; compare
        # by count + one-sided set difference (both distinct)
        if new_count == prev_count and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, prev_count = new_edges, new_count
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "large/small-star rounds — pathological input or a bug; "
            "raise max_iterations"
        )
    # final star edges point member -> component min; roots (the mins)
    # appear only on the right side, singleton-in-pair-graph nodes keep
    # themselves
    member = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return (
        nodes.join(member, "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


def sql_connected_components(pairs_sql: str) -> str:
    """Recursive-CTE oracle: min reachable id per node over the same pair
    graph (exact reachability enumeration — fine at oracle scale)."""
    return f"""
    WITH RECURSIVE pair_t AS ({pairs_sql}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pair_t
      UNION
      SELECT id_b AS src, id_a AS dst FROM pair_t
    ),
    reach AS (
      SELECT src AS id, src AS r FROM edges
      UNION
      SELECT e.src AS id, reach.r AS r
      FROM edges e JOIN reach ON e.dst = reach.id
    )
    SELECT id, min(r) AS component FROM reach GROUP BY id
    """


def char_shingle_df(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """(id, sh): distinct character k-gram shingles over the normalized
    text — the classic variant for short/low-vocabulary texts where word
    shingles are too coarse. Same downstream machinery (jaccard_on_pairs /
    minhash) as word shingles."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    toked = fan_out(df, id_col).select(F.col(id_col).alias("id"), norm.alias("s"))
    sgrams = F.transform(
        F.sequence(F.lit(1), F.length(F.col("s")) - k + 1),
        lambda i: F.col("s").substr(i, F.lit(k)),
    )
    return (
        toked.where(F.length(F.col("s")) >= k)
        .select("id", F.explode(F.array_distinct(sgrams)).alias("sh"))
    )


def sql_char_shingles(k: int = 5) -> str:
    return f"""
    toks AS (SELECT doc_id AS id,
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
             FROM documents),
    sh AS (SELECT DISTINCT id,
             unnest(list_transform(range(1, length(s) - {k - 2}),
                    i -> substr(s, i, {k}))) AS sh
           FROM toks WHERE length(s) >= {k})"""


def sql_char_jaccard(threshold: float, k: int = 5) -> str:
    return f"""
    WITH {sql_char_shingles(k)},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / (sa.n + sb.n - c.c)) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.id
    JOIN sizes sb ON c.id_b = sb.id
    WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {threshold}
    """


def prefix_filter_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (PPJoin family,
    Xiao et al. 2008): same output as exact_jaccard_pairs — every pair
    with word-shingle Jaccard ≥ threshold, no false negatives — but
    candidates come only from the PREFIX of each document's shingle set
    under a global rarest-first ordering. Two sets with J(A,B) ≥ t must
    share an element inside their first (n − ⌈t·n⌉ + 1) shingles under
    any common total order, so joining on prefix shingles alone is
    lossless; ordering by ascending corpus frequency makes those prefix
    shingles the RAREST, collapsing candidate volume (frequency-ordered
    buckets are smallest exactly where the join fans out).

    Unlike the LSH tiers this is exact with zero verification loss at
    any threshold — the scalable path when a pipeline contractually
    cannot drop a true duplicate pair. Shuffles: shingle-frequency join
    (on the 60-bit shingle hash), one per-doc window (partitioned by
    doc), the prefix self-join, and the usual exact verify. Candidate
    volume is Σ_bucket |prefix-bucket|² over RARE shingles only — the
    quadratic term the raw all-pairs join pays on every shingle,
    including the corpus-stopword ones that dominate its cost.
    Measured candidate reduction vs the raw shared-shingle join on this
    corpus at t=0.8: 11,533 → 25 pairs at sf0.01 (461×), 1.13M → 119k
    at sf0.1 (9.5×)."""
    sh = shingle_df(df, id_col, text_col)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    ranked = sh.join(freq, "sh")
    w_ord = Window.partitionBy("id").orderBy(F.col("f").asc(), F.col("sh").asc())
    w_all = Window.partitionBy("id")
    pre = (
        ranked.withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .where(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        )
        .select("id", "sh")
    )
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        jaccard_on_pairs(sh, cand)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", portable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def sql_minhash_estimate_audit() -> str:
    """DuckDB replay of minhash_jaccard_estimate_audit: LSH candidates
    with the signature-agreement estimate next to the exact Jaccard
    ingredients, every term an integer."""
    h = sql_h32("sh")
    mins = ",\n           ".join(
        f"min(({a} * {h} + {b}) % {MOD32}) AS mh_{j}" for j, (a, b) in enumerate(COEFFS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT id, {b} AS band, {sig} AS sig FROM sig_t".format(
            b=b,
            sig=" || '-' || ".join(
                f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    matches = " + ".join(
        f"CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END" for j in range(NUM_HASHES)
    )
    return f"""
    WITH {sql_shingles()},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig_t AS (SELECT id,
           {mins}
           FROM sh GROUP BY id),
    buckets AS (
{band_rows}
    ),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM buckets a
             JOIN buckets b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id),
    m AS (SELECT c.id_a, c.id_b, ({matches}) AS match_64
          FROM cand c
          JOIN sig_t a ON a.id = c.id_a
          JOIN sig_t b ON b.id = c.id_b),
    common AS (SELECT c.id_a, c.id_b, count(*) AS c
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
               GROUP BY 1, 2)
    SELECT m.id_a, m.id_b,
           CAST(m.match_64 AS BIGINT) AS match_64,
           CAST(COALESCE(co.c, 0) AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - COALESCE(co.c, 0) AS BIGINT) AS n_union
    FROM m
    LEFT JOIN common co ON co.id_a = m.id_a AND co.id_b = m.id_b
    JOIN sizes sa ON sa.id = m.id_a
    JOIN sizes sb ON sb.id = m.id_b
    """


# --- Containment (asymmetric set-similarity) join --------------------------
#
# Near-dup Jaccard misses the commonest real contamination shape in LLM
# corpora: document A embedded verbatim inside a LONGER document B (quote
# farms, boilerplate wrappers, page-of-pages aggregators). J(A,B) =
# |A∩B|/|A∪B| dives as B grows, but containment C(A→B) = |A∩B|/|A| stays
# at 1.0 — the signal the dedup pass actually wants.

CONTAINMENT_NUM = 9
CONTAINMENT_DEN = 10  # threshold 0.9, kept rational so every compare is integer


def containment_prefix_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """EXACT directed containment join at C(A→B) ≥ 0.9 via an asymmetric
    prefix filter: A's prefix (rarest-first, length n_a − ⌈0.9·n_a⌉ + 1)
    joins B's FULL shingle set. Losslessness is the same pigeonhole as
    the symmetric PPJoin: if B missed every prefix shingle of A, the
    overlap could be at most n_a − prefix_len = ⌈0.9·n_a⌉ − 1 < 0.9·n_a.
    Only the probe side shrinks to a prefix — but the prefix holds only
    globally RARE shingles, so the equi-join on shingle lands in small
    buckets by construction (a rare shingle is rare on BOTH sides of a
    self-join); the stopword buckets that blow up the naive all-pairs
    join are never probed.

    Every threshold compare is cross-multiplied integer arithmetic
    (⌈9n/10⌉ = (9n+9) div 10, final cut 10·c ≥ 9·n_a) — no float
    boundary can disagree with the DuckDB oracle. Output is DIRECTED
    (id_a contained-in id_b); mutual near-equal pairs appear twice, one
    row per direction, which is what a canonical-keep pass consumes.

    Shuffles: shingle-frequency join, one per-doc window, the
    prefix-probe equi-join, one verify aggregation — all keyed on
    shingle or doc id, never all-pairs. 100 TB posture matches the
    PPJoin tier (measured 461×/9.5× candidate reduction machinery).
    The shingle frame is deliberately RECOMPUTED per consumer (6 scans
    in the plan): it is larger than its input, so re-scanning the
    corpus beats materializing it — the minhash family's measured
    recompute-over-persist trade (SCALE.md duplicate-scan audit)."""
    sh = shingle_df(df, id_col, text_col)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    w_ord = Window.partitionBy("id").orderBy(F.col("f").asc(), F.col("sh").asc())
    w_all = Window.partitionBy("id")
    pre = (
        sh.join(freq, "sh")
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .where(
            F.col("rn")
            <= F.col("n")
            - F.expr(f"({CONTAINMENT_NUM} * n + {CONTAINMENT_DEN - 1}) div {CONTAINMENT_DEN}")
            + 1
        )
        .select("id", "sh")
    )
    cand = (
        pre.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .where(F.lit(CONTAINMENT_DEN) * F.col("c") >= F.lit(CONTAINMENT_NUM) * F.col("na"))
        .select(
            "id_a",
            "id_b",
            portable_round(F.col("c") / F.col("na"), 4).alias("containment"),
        )
    )


def sql_containment_pairs() -> str:
    """DuckDB oracle for containment_prefix_pairs: the brute-force
    shared-shingle join with the identical cross-multiplied cut — a pass
    proves the asymmetric prefix filter dropped no true directed pair."""
    return f"""
    WITH {sql_shingles()},
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.sh = b.sh AND a.id <> b.id
               GROUP BY 1, 2)
    SELECT c.id_a, c.id_b,
           floor((c.c * 1.0 / sa.n) * 10000.0 + 0.5) / 10000.0 AS containment
    FROM common c JOIN sizes sa ON c.id_a = sa.id
    WHERE {CONTAINMENT_DEN} * c.c >= {CONTAINMENT_NUM} * sa.n
    """


# ------------------------------------------------- paragraph-level dedup

# CCNet dedups at PARAGRAPH granularity (Wenzek et al. 2020 §3.2): the
# unit of near-duplication in web crawls is the boilerplate paragraph,
# not the page. The synthetic documents fixture carries no newlines, so
# the splitter's deterministic fallback is fixed PARA_TOKENS-token
# windows over the token stream — a law both engines replay exactly
# (real corpora would split on '\n\n' first and fall back to windows for
# wall-of-text pages). Paragraph ids pack (doc_id, window index) into
# one int64 so the whole MinHash cascade runs unchanged over paragraphs.
PARA_TOKENS = 25
PARA_ID_STRIDE = 10_000  # windows per doc bound; docs are « 250k tokens


def paragraph_df(
    df: DataFrame, id_col: str, text_col: str, p: int = PARA_TOKENS
) -> DataFrame:
    """(doc_id, pid, ptext): fixed p-token windows over each document's
    token stream; pid = doc_id·PARA_ID_STRIDE + window index. Shingles
    never cross a window boundary (each window re-tokenizes to exactly
    its token slice — tokens match TOKEN_RE individually, so the
    space-join/re-extract round-trip is lossless)."""
    toked = fan_out(df, id_col).select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") > 0)
    # Cap the window count at the pid stride (ADVICE r09): a doc with
    # >= PARA_ID_STRIDE windows (~250k tokens at p=25) would silently
    # pack its overflow paragraphs into the NEXT doc_id's pid range, and
    # since the oracle replays the identical packing law, parity
    # checking could never see the corruption. Truncation is the safe
    # replayable law (mirrored in sql_paras); no fixture comes within
    # two orders of magnitude of the cap.
    n_para = F.least(
        F.ceil(F.size("t") / F.lit(float(p))).cast("int"),
        F.lit(PARA_ID_STRIDE),
    )
    return toked.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n_para - 1)).alias("j"),
    ).select(
        "doc_id",
        (F.col("doc_id") * PARA_ID_STRIDE + F.col("j")).alias("pid"),
        F.array_join(F.expr(f"slice(t, j*{p}+1, {p})"), " ").alias("ptext"),
    )


def sql_paras(table: str = "documents", id_col: str = "doc_id", p: int = PARA_TOKENS) -> str:
    """DuckDB CTEs (ptoks, paras) mirroring paragraph_df; the paras CTE
    exposes its window text under the column name ``text`` so
    sql_shingles/sql_minhash_lsh_scaled re-target it unchanged."""
    return f"""
    ptoks AS (SELECT {id_col} AS doc_id, {SQL_TOKENS} AS t FROM {table}),
    paras AS (
      SELECT doc_id, doc_id * {PARA_ID_STRIDE} + j AS pid,
             array_to_string(t[j*{p}+1 : j*{p}+{p}], ' ') AS text
      FROM (SELECT doc_id, t,
                   unnest(range(0, LEAST(CAST(ceil(len(t)/{p}.0) AS INT),
                                         {PARA_ID_STRIDE}))) AS j
            FROM ptoks WHERE len(t) > 0)
    ),"""


def positional_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = K_SHINGLE
) -> DataFrame:
    """(id, i, sh): every positional k-shingle of every document with ≥ k
    tokens — the distributed suffix-array surrogate the containment law
    aligns over. Factored out (round 10) so the batch operator and the
    streaming ingest twin extract shingles under one law."""
    toked = fan_out(df, id_col).select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") >= k)
    t = F.col("t")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(k)]),
    )
    return toked.select("id", F.posexplode(shingles).alias("i", "sh"))


def containment_verify(
    pos_inner: DataFrame, pos_outer: DataFrame, sizes_inner: DataFrame
) -> DataFrame:
    """The per-offset alignment verify over two positional-shingle
    relations: (id_inner, id_outer, n_occurrences, n_shingles) where
    id_inner's full stream occurs contiguously in id_outer — matched
    count at some offset o equals id_inner's total shingle count
    (``sizes_inner``: (id, n)). Shared by the batch operator (self-join
    case) and the streaming twin (new×stored directional cases)."""
    a, b = pos_inner.alias("a"), pos_outer.alias("b")
    m = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") != F.col("b.id")))
        .select(
            F.col("a.id").alias("id_inner"),
            F.col("b.id").alias("id_outer"),
            (F.col("b.i") - F.col("a.i")).alias("o"),
        )
        .groupBy("id_inner", "id_outer", "o")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    return (
        m.join(sizes_inner.select(F.col("id").alias("id_inner"), "n"), "id_inner")
        .where(F.col("matched") == F.col("n"))
        .groupBy("id_inner", "id_outer", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .select(
            "id_inner",
            "id_outer",
            "n_occurrences",
            F.col("n").cast("long").alias("n_shingles"),
        )
    )


def substring_containment_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = K_SHINGLE
) -> DataFrame:
    """(id_inner, id_outer, n_occurrences, n_shingles): directional exact
    token-level substring containment via sorted positional-shingle runs
    — doc A occurs contiguously in doc B iff some offset o aligns every
    one of A's positional k-shingles with an equal shingle of B (each
    A-position contributes at most one match per offset, so per-offset
    matched count == A's shingle count is exact containment, not a bag
    overlap). See dedup_substring_containment's docstring for the scale
    shape and the oracle for the SQL mirror."""
    pos = positional_shingles(df, id_col, text_col, k)
    sizes = pos.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    return containment_verify(pos, pos, sizes)


# ------------------------------------------------ content-defined chunks

CDC_DIVISOR = 8  # expected chunk length in tokens (LBFS boundary law)


def cdc_chunk_df(
    df: DataFrame, id_col: str, text_col: str, divisor: int = CDC_DIVISOR
) -> DataFrame:
    """(doc_id, chunk_idx, ctext): content-defined chunking — a boundary
    falls AFTER token i iff h32(token_i) % divisor == 0 (plus end of
    doc), so boundaries are a pure function of LOCAL content (the LBFS
    law; see queries.dedup.dedup_cdc_chunks for the full story). Shared
    by the batch profile/emit tiers and the streaming ingest twin — one
    chunking law, three consumers."""
    toked = fan_out(df, id_col).select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") > 0)
    pos = toked.select("doc_id", F.posexplode("t").alias("i", "tok")).select(
        "doc_id", (F.col("i") + 1).cast("long").alias("pos"), "tok"
    )
    fl = pos.withColumn("b", (_h32(F.col("tok")) % divisor == 0).cast("int"))
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = fl.withColumn(
        "chunk_idx", F.coalesce(F.sum("b").over(w_prev), F.lit(0)).cast("long")
    )
    return ch.groupBy("doc_id", "chunk_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("ctext")
    )
