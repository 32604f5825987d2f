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


def _make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid solid-color RGB PNG via stdlib only (zlib + struct):
    the decode tests stay self-contained — no imaging library needed to
    BUILD a test image, only to decode one."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(
    MM._pil_image() is not None, reason="imaging library present"
)
def test_decode_image_is_gated_without_pil(docs):
    with pytest.raises(NotImplementedError):
        MM.decode_image(MM.attach_media(docs))
    with pytest.raises(NotImplementedError):
        MM.extract_features(MM.attach_media(docs), decode="image")


@pytest.mark.skipif(MM._pil_image() is None, reason="PIL not installed")
def test_decode_image_real(spark):
    media = spark.createDataFrame(
        [
            (1, _make_png(4, 2, (255, 255, 255)), ("image/png", 0, "t")),
            (2, _make_png(3, 3, (0, 0, 0)), ("image/png", 0, "t")),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in MM.decode_image(media).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (4, 2)
    assert (rows[2]["width"], rows[2]["height"]) == (3, 3)
    assert rows[1]["mean_luma"] == pytest.approx(1.0, abs=1e-6)
    assert rows[2]["mean_luma"] == pytest.approx(0.0, abs=1e-6)
    feats = {
        r["media_id"]: r["features"]
        for r in MM.extract_features(media, decode="image").collect()
    }
    # Solid white: all pixels in the TOP luminance bin; solid black: all
    # in the bottom bin. Histograms are pixel-mass fractions (sum to 1).
    assert feats[1][-1] == pytest.approx(1.0, abs=1e-6)
    assert feats[2][0] == pytest.approx(1.0, abs=1e-6)


def test_extract_features_rejects_unknown_decode(docs):
    with pytest.raises(ValueError):
        MM.extract_features(MM.attach_media(docs), decode="audio")


def test_resize_media_decimates(docs):
    media = MM.attach_media(docs)
    rows = MM.resize_media(media, factor=4).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["resized_bytes"] == (r["orig_bytes"] + 3) // 4
        # Deterministic: every 4th byte of the original stream.
        assert r["resized_bytes"] == len(r["resized"])
