"""Multimodal plumbing: schema, deterministic stub decode, batch shape."""

from __future__ import annotations

import hashlib

import pytest

from streamprocessing_spark.operators import multimodal as M
from streamprocessing_spark.sources.readers import load_table


def test_attach_payload_schema(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_payload(d, "doc_id", "text")
    # nullability flags differ between computed and declared schemas;
    # names and types are the contract
    assert media.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()


def test_stub_decode_deterministic_and_bounded():
    w, h = M.decode_image_stub(b"hello world")
    assert (w, h) == M.decode_image_stub(b"hello world")
    assert 64 <= w <= 255 and 64 <= h <= 255


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG")


def test_feature_extraction_matches_local_kernel(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    media = M.attach_payload(d, "doc_id", "text")
    rows = {r.media_id: r for r in M.extract_features(media).collect()}
    for src in d.collect():
        payload = src.text.encode("utf-8")
        r = rows[src.doc_id]
        assert r.n_bytes == len(payload)
        assert r.h32 == int(hashlib.md5(payload).hexdigest()[:8], 16)
        assert (r.fake_width, r.fake_height) == M.decode_image_stub(payload)
