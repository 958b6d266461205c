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


def test_media_manifest_partition_laws(spark, sf_dir):
    """(a) every media row has exactly one manifest entry; (b) canonical
    ids are themselves canonical (closure); (c) members of one cluster
    share the canonical = the cluster min; (d) manifest canonicals agree
    with the pair graph's connected components recomputed in Python."""
    from collections import defaultdict

    from streamprocessing_spark.registry import all_specs
    from streamprocessing_spark.sources.readers import load_table

    SPECS = all_specs()
    rows = SPECS["multimodal_dedup_manifest"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    canon = {r.media_id: r.canonical_id for r in rows}
    for r in rows:
        assert canon[r.canonical_id] == r.canonical_id, "canonical not closed"
        assert r.is_canonical == (r.media_id == r.canonical_id)
        assert r.canonical_id <= r.media_id

    pairs = SPECS["multimodal_phash_neardup"].fn(spark, sf_dir).collect()
    adj = defaultdict(set)
    for p in pairs:
        adj[p.id_a].add(p.id_b)
        adj[p.id_b].add(p.id_a)
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            comp.append(u)
            stack.extend(adj[u] - seen)
        rep = min(comp)
        for u in comp:
            assert canon[u] == rep, (u, canon[u], rep)
    assert any(not r.is_canonical for r in rows), "fixture should have dup media"
