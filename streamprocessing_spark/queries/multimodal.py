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
    FROM documents
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
    FROM documents
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
      FROM documents
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
    FROM documents
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
    with decode kernels (operators/multimodal.py) downstream."""
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
