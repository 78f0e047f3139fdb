"""Multimodal plumbing: schema, Arrow batch shape, explode sampling;
decode kernels are stubbed by design (no codec libs in this image)."""

from __future__ import annotations

import pytest

from corporate_knowledge_extractor_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.synthesize_media(spark, docs.limit(120))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.first()
    assert bytes(row.payload).startswith(b"payload:")


def test_feature_extract_batched(media):
    feats = multimodal.feature_extract(media)
    rows = feats.collect()
    assert len(rows) == 120
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # determinism: same payload -> same feature
    again = {r.doc_id: r.feature for r in multimodal.feature_extract(media).collect()}
    assert all(again[r.doc_id] == r.feature for r in rows)


def test_payload_sha_is_hashseed_independent(media):
    """payload_sha must be a *content* digest: the same value the driver
    computes with hashlib here must come back from the (separately
    seeded) Python worker processes — builtin hash() would fail this
    under any unpinned PYTHONHASHSEED."""
    import hashlib

    got = {
        r.doc_id: r.payload_sha
        for r in multimodal.feature_extract(media).collect()
    }
    for doc_id in list(got)[:10]:
        payload = f"payload:{doc_id}".encode()
        want = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big") % 2**31
        assert got[doc_id] == want


def test_frame_sample_explodes_videos(media):
    sampled = multimodal.frame_sample(media, every_ms=1000)
    rows = sampled.collect()
    assert len(rows) > 0
    assert all(r.frame_ms % 1000 == 0 for r in rows)
    vids = {r.doc_id for r in media.where("kind = 'video'").collect()}
    assert {r.doc_id for r in rows} <= vids


def test_decode_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"x")
