"""Multimodal plumbing: Arrow mapInPandas feature extraction with values
pinned against a pure-python reference, and the import-gated decode stub.
"""

import hashlib

import pytest

from masd_spark.operators.multimodal import decode_image
from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare_query

REGISTRY = load_all()


def test_multimodal_metadata_parity(spark):
    compare_query(spark, REGISTRY["multimodal_metadata"], SF_ORACLE)


def test_byte_features_match_reference(spark):
    from masd_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents").limit(5).collect()
    }
    out = {
        r["doc_id"]: r
        for r in REGISTRY["multimodal_byte_features"].fn(spark, SF_SMOKE).collect()
    }
    assert len(out) >= len(docs)
    for doc_id, text in docs.items():
        payload = hashlib.md5(text.encode()).digest() + hashlib.md5(
            text[::-1].encode()
        ).digest()
        row = out[doc_id]
        assert row["n_bytes"] == 32
        assert row["byte_min"] == min(payload)
        assert row["byte_max"] == max(payload)
        assert abs(row["byte_mean"] - round(sum(payload) / len(payload), 6)) < 1e-9


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 16)


def test_frame_sample_parity(spark):
    compare_query(spark, REGISTRY["multimodal_frame_sample"], SF_ORACLE)


def test_resize_parity(spark):
    compare_query(spark, REGISTRY["multimodal_resize"], SF_ORACLE)


def test_frame_sample_bytes_match_reference(spark):
    """The 1->N expansion must emit the exact payload slices: 4 frames of
    8 bytes per 32-byte video payload, in order."""
    from masd_spark.operators.multimodal import attach_binary_payload, frame_sample
    from masd_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    videos = docs.filter((docs.doc_id % 3) == 2).limit(3)
    texts = {r["doc_id"]: r["text"] for r in videos.collect()}
    frames = frame_sample(attach_binary_payload(videos), frame_len=8, stride=8)
    got: dict = {}
    for r in frames.collect():
        got.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for doc_id, text in texts.items():
        payload = (
            hashlib.md5(text.encode()).digest()
            + hashlib.md5(text[::-1].encode()).digest()
        )
        expected = {j: payload[j * 8:(j + 1) * 8] for j in range(4)}
        assert got[doc_id] == expected
