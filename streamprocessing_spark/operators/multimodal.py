"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for very large assets) carried
next to a typed metadata struct; decode/feature-extraction runs as
Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes cross the
JVM↔Python boundary once per batch, never per row.

The actual codec libraries (Pillow/ffmpeg/torchaudio) are NOT in this
container — the decode kernel is STUBBED: ``decode_image_stub`` derives
deterministic fake dimensions from the payload hash so the Spark-side
plumbing (schema, batch shape, partitioning) is real and testable, and
``decode_image_real`` raises NotImplementedError where the codec call
belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record: payload + metadata struct. Real pipelines
# add modality-specific fields (duration_ms, sample_rate, codec, ...).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", StructType(
            [
                StructField("mime", StringType()),
                StructField("n_bytes", LongType()),
                StructField("sha256", StringType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("h32", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Build the canonical media record from any source column. In the test
    fixtures the 'payload' is the UTF-8 document text standing in for
    image bytes; with real data this is the raw file content
    (spark.read.format('binaryFile')) or bytes fetched by URI."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Where the real codec goes (Pillow/libvips). Not available in this
    container — see module docstring."""
    raise NotImplementedError("image codec not available in this environment")


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from the payload
    sha256 — stable across engines/runs, so tests and oracles can check
    the full pipeline without a codec."""
    h = hashlib.sha256(payload).digest()
    width = 64 + (h[0] % 192)  # 64..255
    height = 64 + (h[1] % 192)
    return width, height


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Each batch arrives as one pandas.DataFrame: the stub kernel is applied
    vectorized per batch (one Python call per ~batch, not per row). h32 is
    the first 8 md5 hex digits of the payload — portable to the SQL oracle
    so even the Pandas-UDF path is value-checked.
    """

    from streamprocessing_spark.shipping import ensure_shippable

    ensure_shippable()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "h32": payloads.map(
                        lambda p: int(hashlib.md5(p).hexdigest()[:8], 16)
                    ).astype("int64"),
                    "fake_width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "fake_height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)
