"""Multimodal-column queries: binary payload plumbing with the decode
kernel stubbed deterministically (codec libs absent in this container —
see operators/multimodal.py). The document text stands in for media bytes;
every byte-level value (length, sha256, md5-h32) is engine-portable, so
even the mapInPandas path is oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_spark.operators import multimodal as M
from streamprocessing_spark.registry import register
from streamprocessing_spark.sources.readers import load_table


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal", "llm-pipeline"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (byte length + content
    hash) — computed JVM-side at scan speed, no Python."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS thumb_w,
           CAST(8 AS INTEGER) AS thumb_h,
           CAST(8 * 8 * 3 AS BIGINT) AS thumb_n_bytes,
           sha256(sha256(text) || ':8x8') AS thumb_sha256
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal", "llm-pipeline", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail kernel over mapInPandas (stubbed codec): derived
    asset per payload with a deterministic fingerprint the oracle
    reproduces — proves the bytes-in/bytes-out kernel plumbing at batch
    granularity."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return M.resize_thumbnails(media, 8, 8)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS sha
      FROM documents WHERE text IS NOT NULL
    )
    SELECT media_id,
           CAST(u.i AS BIGINT) AS frame_idx,
           md5(sha || ':' || CAST(u.i AS VARCHAR)) AS frame_fp
    FROM media,
    unnest(range(0, 1 + n_bytes % 240, {M.FRAME_STRIDE})) AS u(i)
    """,
    tags=("multimodal", "llm-pipeline", "flatmap"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-shaped payloads: every 30th frame index
    with a per-frame fingerprint — the 1→N flatMap shape of real frame
    extraction, JVM-side here (a real decoder swaps in a mapInPandas
    kernel with the same output schema)."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return M.frame_sample(media)


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h32
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal", "llm-pipeline", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched mapInPandas decode path (stub kernel). The
    portable outputs (n_bytes, md5-h32) are oracle-checked; the fake
    decode dims are covered by tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return M.extract_features(media).select("media_id", "n_bytes", "h32")


@register(
    "source_binaryfile_ingest",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    """,
    tags=("multimodal", "source", "llm-pipeline"),
)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real multimodal INGESTION path: raw per-media files on disk
    read through Spark's `binaryFile` source (path, length, content per
    file), the media id parsed from the filename, metadata derived from
    the bytes. Staging writes each payload as one `<id>.bin` file from
    the executors (foreachPartition — distributed, filename-idempotent),
    then the scan proves the round trip: (media_id, n_bytes, sha256)
    must equal the metadata computed straight from the source column.
    At 100 TB this is exactly how image/audio corpora land: a manifest
    scan over object-store files, driven by the same binaryFile reader,
    with decode kernels (operators/multimodal.py) downstream.

    Measured quirk (hostile sweep): Spark's binaryFile source does NOT
    list zero-byte files — an empty payload written to disk never comes
    back from the scan. The oracle models that behavior (octet_length >
    0); at scale, empty media files must be manifested separately or
    they silently vanish from binaryFile-driven corpora."""
    import hashlib
    import os
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    out = os.path.join(
        tempfile.gettempdir(),
        f"sp_bin_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_{os.getpid()}",
    )
    os.makedirs(out, exist_ok=True)

    def _write_part(rows):
        import os as _os

        for r in rows:
            tmp = _os.path.join(out, f".{r.media_id}.tmp")
            with open(tmp, "wb") as fh:
                fh.write(bytes(r.payload))
            _os.replace(tmp, _os.path.join(out, f"{r.media_id}.bin"))

    media.select("media_id", "payload").foreachPartition(_write_part)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("media_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("sha256"),
        )
    )


def _sql_phash_oracle() -> str:
    """The perceptual-hash pipeline replayed in SQL: the stub 'decode'
    (md5-byte pixels from tokens) is deliberately SQL-expressible so
    even the mapInPandas kernel path is bit-oracled — the real-codec
    swap point is ONLY the pixel source."""
    from streamprocessing_spark.operators.multimodal import (
        PH_BITS,
        PH_MAX_HAMMING,
    )

    px = (
        "list_transform(range(0, {n}), i -> "
        "CAST(('0x' || substr(md5('px:' || i || ':' || t[(i % n_tok) + 1]), 1, 2)) "
        "AS BIGINT))"
    ).format(n=PH_BITS)
    bits = (
        "list_sum(list_transform(range(0, {n}), i -> "
        "CASE WHEN px[i + 1] > mean THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) "
        "ELSE CAST(0 AS BIGINT) END))"
    ).format(n=PH_BITS)
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents WHERE text IS NOT NULL),
    pxs AS MATERIALIZED (
      SELECT doc_id, {px} AS px
      FROM (SELECT doc_id, t, len(t) AS n_tok FROM toks WHERE len(t) > 0)),
    h AS MATERIALIZED (
      SELECT doc_id, CAST({bits} AS BIGINT) AS phash
      FROM (SELECT doc_id, px, list_sum(px) / {PH_BITS}.0 AS mean FROM pxs)
      UNION ALL
      SELECT doc_id, CAST(0 AS BIGINT) FROM toks WHERE len(t) = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PH_MAX_HAMMING}
    """


@register(
    "multimodal_phash_neardup",
    oracle=_sql_phash_oracle(),
    tags=("multimodal", "dedup", "llm-pipeline", "lsh"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over media payloads: an
    Arrow-batched hash kernel (pixels from the stub decode — the
    real-codec swap point), 4×15-bit band-bucket candidates (SimHash
    pigeonhole ⇒ 100% recall at hamming ≤ 3), popcount verify. The
    image-dedup stage of a multimodal curation pipeline: payloads never
    shuffle, only 8-byte hashes do. The oracle replays the whole
    pipeline including the kernel's arithmetic (its quadratic form —
    fine at oracle scale; the banding IS the scale path)."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return M.phash_neardup_pairs(media)


@register(
    "multimodal_phash_arrow",
    oracle=_sql_phash_oracle(),
    tags=("multimodal", "dedup", "llm-pipeline", "lsh", "arrow"),
)
def multimodal_phash_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phash near-dup pipeline with its hash kernel on the RAW ARROW
    path (mapInArrow) instead of pandas-backed mapInPandas — same
    banding, same verify, same oracle, bit-identical output (asserted
    in tests). Registered separately because the two Python batch
    interfaces are both part of the engine's surface: mapInArrow skips
    the Arrow→pandas copy of the payload column (right for
    bytes-in/scalar-out kernels), mapInPandas buys vectorized numpy
    (right for math-heavy kernels like audio energy)."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    return M.phash_neardup_pairs(media, hasher=M.phash_df_arrow)


def _sql_phash_real_oracle() -> str:
    """The REAL-CODEC phash pipeline replayed in SQL: the oracle
    evaluates the deterministic pixel LAW (operators.multimodal.
    real_pixel_law) directly — the Spark side must get the same pixels
    back out of genuinely ENCODED PPM/BMP payloads via the real decoder,
    so any codec bug (BMP bottom-up rows, stride padding, PPM comment
    parsing) changes decoded pixels → changes the phash → hash-mismatch.
    Same mean-threshold/banding/verify law as the stub oracle."""
    from streamprocessing_spark.operators.multimodal import (
        PH_BITS,
        PH_MAX_HAMMING,
    )

    px = (
        "list_transform(range(0, {n}), i -> CASE WHEN i = doc_id % {n} "
        "THEN CAST(('0x' || substr(md5('pp:' || doc_id || ':' || i), 1, 2)) AS BIGINT) "
        "ELSE CAST(('0x' || substr(md5('rpx:' || (doc_id // 5) || ':' || i), 1, 2)) AS BIGINT) "
        "END)"
    ).format(n=PH_BITS)
    bits = (
        "list_sum(list_transform(range(0, {n}), i -> "
        "CASE WHEN px[i + 1] > mean THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) "
        "ELSE CAST(0 AS BIGINT) END))"
    ).format(n=PH_BITS)
    return f"""
    WITH pxs AS MATERIALIZED (
      SELECT doc_id, {px} AS px FROM documents),
    h AS MATERIALIZED (
      SELECT doc_id, CAST({bits} AS BIGINT) AS phash
      FROM (SELECT doc_id, px, list_sum(px) / {PH_BITS}.0 AS mean FROM pxs))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PH_MAX_HAMMING}
    """


@register(
    "multimodal_phash_neardup_real",
    oracle=_sql_phash_real_oracle(),
    tags=("multimodal", "dedup", "llm-pipeline", "lsh", "real-codec"),
)
def multimodal_phash_neardup_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup ON REAL IMAGE BYTES end-to-end (VERDICT
    r05 item #4 — the pipeline proven on real pixels, not just the
    kernel unit test): every document gets a genuine encoded raster —
    binary PPM (P6) for even ids, bottom-up stride-padded 24-bit BMP
    for odd ids, five docs per base image with a one-pixel per-doc
    perturbation (near-dup structure at hamming 0–2) — which the REAL
    pure-Python decoder (operators/multimodal.decode_image_pixels)
    parses back to pixels inside the Arrow-batched phash kernel
    (phash_real). Banding/verify identical to the stub tier; the oracle
    replays the pixel law in SQL, so the encode→decode→hash→band→verify
    chain is value-hash-checked: a row-order or stride bug in either
    codec fails the gate. Payloads never shuffle; a deployment swaps
    decode_image_pixels for Pillow/libvips to gain JPEG/PNG with every
    downstream stage unchanged."""
    d = load_table(spark, sf_dir, "documents")
    media = M.build_real_media(d, "doc_id")
    return M.phash_neardup_pairs(
        media, hasher=lambda m: M.phash_df(m, hash_fn=M.phash_real)
    )


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL
        AND octet_length(encode(text)) = length(text)),
    f AS (
      SELECT doc_id,
             (p - 1) // {M.AUDIO_FRAME} AS fi,
             ascii(substr(text, CAST(p AS INTEGER), 1)) - 128 AS s
      FROM ascii_docs,
           unnest(range(1, (len(text) // {M.AUDIO_FRAME}) * {M.AUDIO_FRAME} + 1)) AS u(p))
    SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
           CAST(sum(s * s) AS BIGINT) AS energy
    FROM f GROUP BY 1, 2
    """,
    tags=("multimodal", "llm-pipeline"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio energy over media payloads (see
    operators/multimodal.audio_energy_frames): payload bytes as PCM
    samples, Σ s² per 64-sample frame — the silence-trim / VAD /
    loudness feature pass, completing the modality set next to the
    image (phash/resize) and video (frame-sample) kernels. The fixture
    payload is the UTF-8 document text, so the WHOLE kernel, not just
    the plumbing, is bit-oracled; a real corpus swaps only the
    sample-decode line. The oracle replays the kernel's BYTE view with
    character functions (ascii/substr/len), which only coincides with
    the UTF-8 byte stream for pure-ASCII text — both sides therefore
    filter to octet_length == char length EXPLICITLY, so a multi-byte
    character in a future fixture drops out identically on both engines
    instead of silently breaking parity."""
    d = load_table(spark, sf_dir, "documents").where(
        F.expr("octet_length(text) = length(text)")
    )
    media = M.attach_payload(d, "doc_id", "text")
    return M.audio_energy_frames(media)


def _sql_media_manifest() -> str:
    from streamprocessing_spark.operators.dedup import sql_connected_components

    cc = sql_connected_components(_sql_phash_oracle())
    return f"""
    WITH comp AS MATERIALIZED ({cc})
    SELECT d.doc_id AS media_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS canonical_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """


@register(
    "multimodal_dedup_manifest",
    oracle=_sql_media_manifest(),
    tags=("multimodal", "dedup", "llm-pipeline"),
)
def multimodal_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEDIA dedup manifest — the multimodal twin of
    dedup_keep_canonical, composed end-to-end: perceptual-hash kernel
    (Arrow-batched over payload bytes) → 4×15-bit band-bucket candidates
    (pigeonhole-exact at hamming ≤ 3) → popcount verify →
    large-star/small-star connected components → one canonical id per
    near-duplicate cluster. Every media row keeps a manifest entry
    (media_id, canonical_id, is_canonical) — the table a training
    pipeline joins against to drop duplicate images/audio while
    retaining provenance of WHAT was dropped and WHY (canonical_id
    points at the kept twin).

    Scale shape: all stages are the audited paths — payloads never
    shuffle (8-byte hashes do), banding is O(media × 4 bands), the
    component graph is pair-sized, and the manifest join is a broadcast
    of the clustered sliver against the corpus. The oracle replays the
    whole cascade including the kernel arithmetic and the recursive-CTE
    reachability closure."""
    from streamprocessing_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    pairs = M.phash_neardup_pairs(media).select("id_a", "id_b")
    comp = D.connected_components(pairs)
    return (
        d.select(F.col("doc_id").alias("media_id"))
        .join(F.broadcast(comp), F.col("media_id") == F.col("id"), "left")
        .select(
            "media_id",
            F.coalesce(F.col("component"), F.col("media_id"))
            .cast("long")
            .alias("canonical_id"),
            (
                F.coalesce(F.col("component"), F.col("media_id"))
                == F.col("media_id")
            ).alias("is_canonical"),
        )
    )

@register(
    "multimodal_silence_ratio",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL
        AND octet_length(encode(text)) = length(text)),
    f AS (
      SELECT doc_id,
             (p - 1) // {M.AUDIO_FRAME} AS fi,
             ascii(substr(text, CAST(p AS INTEGER), 1)) - 128 AS s
      FROM ascii_docs,
           unnest(range(1, (len(text) // {M.AUDIO_FRAME}) * {M.AUDIO_FRAME} + 1)) AS u(p)),
    fe AS (
      SELECT doc_id, fi, CAST(sum(s * s) AS BIGINT) AS energy
      FROM f GROUP BY 1, 2),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nf,
             CAST(sum(energy) AS BIGINT) AS te
      FROM fe GROUP BY 1),
    q AS (
      SELECT fe.doc_id,
             CAST(sum(CASE WHEN fe.energy * per.nf < per.te THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_quiet
      FROM fe JOIN per USING (doc_id) GROUP BY 1)
    SELECT per.doc_id AS media_id, per.nf AS n_frames,
           per.te AS total_energy, q.n_quiet,
           CAST((1000 * q.n_quiet) // per.nf AS BIGINT) AS quiet_milli
    FROM per JOIN q USING (doc_id)
    """,
    tags=("multimodal", "llm-pipeline", "quality"),
)
def multimodal_silence_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-silence (VAD-style) audit per audio payload: the fraction
    of {M.AUDIO_FRAME}-sample frames whose energy sits BELOW the
    payload's own mean frame energy — the threshold-free form of the
    silence-trim decision (an absolute dB threshold needs calibration
    per corpus; below-own-mean is deterministic and non-vacuous on any
    signal that isn't constant). A curation pipeline drops or trims
    media whose quiet fraction is extreme at either end (near-1 ⇒ mostly
    silence, near-0 with low total energy ⇒ constant hum).

    Exact integers throughout: the mean comparison cross-multiplies
    (energy·n_frames < Σ energy — no division), so quiet_milli is a pure
    BIGINT pipeline over the SAME bit-oracled Arrow kernel as
    multimodal_audio_energy (fixture payload = ASCII text ⇒ DuckDB
    replays sample extraction with ascii/substr; a real corpus swaps
    only the decode line). Scale shape: frames shuffle (media_id-keyed,
    map-side-combinable), payload bytes cross the Arrow boundary once;
    the per-media aggregate and the quiet-count join are both keyed on
    media_id — one partitioning serves all stages."""
    d = load_table(spark, sf_dir, "documents").where(
        F.expr("octet_length(text) = length(text)")
    )
    media = M.attach_payload(d, "doc_id", "text")
    fe = M.audio_energy_frames(media).localCheckpoint(
        eager=True  # frames feed the per-media totals AND the quiet count
    )
    per = fe.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("nf"), F.sum("energy").alias("te")
    )
    q = (
        fe.join(per, "media_id")
        .select(
            "media_id",
            F.when(F.col("energy") * F.col("nf") < F.col("te"), 1)
            .otherwise(0)
            .alias("is_quiet"),
        )
        .groupBy("media_id")
        .agg(F.sum("is_quiet").alias("n_quiet"))
    )
    return per.join(q, "media_id").select(
        "media_id",
        F.col("nf").cast("long").alias("n_frames"),
        F.col("te").cast("long").alias("total_energy"),
        F.col("n_quiet").cast("long").alias("n_quiet"),
        F.expr("CAST((1000 * n_quiet) div nf AS BIGINT)").alias("quiet_milli"),
    )


def _sql_resize_real_oracle(tw: int = 4, th: int = 3) -> str:
    """DuckDB replay of multimodal_resize_real: thumb pixel i maps to
    source pixel (((i div tw)·H) div th)·W + ((i mod tw)·W) div tw — pure
    integer index arithmetic over the same pixel law the real-codec
    phash oracle replays, so the decode → NN-resize chain is value-hash
    checked end to end."""
    from streamprocessing_spark.operators.multimodal import REAL_H, REAL_W, PH_BITS

    src_i = (
        f"((((i // {tw}) * {REAL_H}) // {th}) * {REAL_W}"
        f" + (((i % {tw}) * {REAL_W}) // {tw}))"
    )
    px = (
        f"CASE WHEN {src_i} = doc_id % {PH_BITS} "
        f"THEN CAST(('0x' || substr(md5('pp:' || doc_id || ':' || {src_i}), 1, 2)) AS BIGINT) "
        f"ELSE CAST(('0x' || substr(md5('rpx:' || (doc_id // 5) || ':' || {src_i}), 1, 2)) AS BIGINT) "
        f"END"
    )
    return f"""
    SELECT doc_id AS media_id,
           array_to_string(list_transform(range(0, {tw * th}),
                                          i -> CAST({px} AS VARCHAR)), '-') AS thumb_px
    FROM documents
    """


@register(
    "multimodal_resize_real",
    oracle=_sql_resize_real_oracle(),
    tags=("multimodal", "llm-pipeline", "pandas-udf", "real-codec"),
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail RESIZE on REAL pixels end-to-end — completes the
    real-codec story the phash tier started: genuine PPM/BMP payloads
    (build_real_media, both codecs by id parity) decode inside the
    Arrow-batched kernel and downsample by integer nearest-neighbor
    (thumb(r,c) = src(r·H div th, c·W div tw)), 10×6 → 4×3. The oracle
    replays the pixel law THROUGH the NN index arithmetic, so a bug in
    decode (row order, stride) OR in the resampling index math fails the
    value-hash gate. Thumbnail pixels serialize as an integer string
    (raw bytes would need a binary-capable oracle hash). A deployment
    swaps the NN kernel for Pillow LANCZOS with the same signature;
    payloads never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    media = M.build_real_media(d, "doc_id")
    return M.resize_real_df(media, 4, 3)
