"""Multimodal plumbing tests: the Arrow/mapInPandas path produces the
documented schema and deterministic features; frame sampling yields the
expected stride of binary chunks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "hello multimodal world", "en", "web", 22),
            (2, "", "en", "web", 0),
            (3, "x" * 300, "en", "books", 300),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_attach_media_schema(docs):
    m = MM.attach_media(docs)
    # Same names/types as the documented contract (nullability flags are
    # derivation-dependent in Spark and not part of the contract).
    assert m.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in m.collect()}
    assert bytes(rows[1]["media"]) == b"hello multimodal world"
    assert rows[3]["meta"]["n_bytes"] == 300
    assert rows[2]["meta"]["n_bytes"] == 0


def test_extract_features_deterministic(docs):
    out = {r["media_id"]: r for r in MM.extract_features(MM.attach_media(docs)).collect()}
    payload = b"hello multimodal world"
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % MM.N_FEATURES, minlength=MM.N_FEATURES) / arr.size
    got = np.array(out[1]["features"])
    assert np.allclose(got, hist.round(6), atol=1e-6)
    assert out[1]["n_bytes"] == len(payload)
    assert out[2]["features"] == [0.0] * MM.N_FEATURES  # empty payload
    assert len(out[3]["features"]) == MM.N_FEATURES


def test_frame_sample_stride(docs):
    frames = MM.frame_sample(MM.attach_media(docs), frame_bytes=64, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # doc 3: 300 bytes -> chunks 0..4, stride 2 -> frames 0, 2, 4.
    idxs = sorted(r["frame_idx"] for r in by_id[3])
    assert idxs == [0, 2, 4]
    f0 = next(bytes(r["frame"]) for r in by_id[3] if r["frame_idx"] == 0)
    assert f0 == b"x" * 64
    f4 = next(bytes(r["frame"]) for r in by_id[3] if r["frame_idx"] == 4)
    assert f4 == b"x" * (300 - 4 * 64)
    # empty payload -> single empty frame at idx 0 (sequence(0, 0))
    assert [r["frame_idx"] for r in by_id[2]] == [0]


def test_decode_image_is_gated(docs):
    with pytest.raises(NotImplementedError):
        MM.decode_image(MM.attach_media(docs))


def test_resize_media_decimates(docs):
    media = MM.attach_media(docs)
    rows = MM.resize_media(media, factor=4).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["resized_bytes"] == (r["orig_bytes"] + 3) // 4
        # Deterministic: every 4th byte of the original stream.
        assert r["resized_bytes"] == len(r["resized"])
