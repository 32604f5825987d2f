"""Motion-compensated video codec (operators/mcv.py): the motion search
tracks real motion, static clips pick the zero vector, the bitstream is
strictly parsed, and sizes match the format spec."""

from __future__ import annotations

import hashlib
import struct

import pytest

from graph_database_spark.operators.mcv import decode_video_mc, encode_video_mc

H = W = 16


def _frame0() -> list[list[int]]:
    rows = []
    for y in range(H):
        digest = hashlib.md5(f"mcv-test|{y}".encode()).digest()
        rows.append(list(digest))
    return rows


def _vid0(frames) -> bytes:
    planes = bytes(v for fr in frames for row in fr for v in row)
    return b"VID0" + struct.pack("<III", len(frames), H, W) + planes


def _encode_one(spark, blob: bytes) -> bytes:
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, video binary")
    return bytes(encode_video_mc(df).collect()[0]["stream"])


def _decode_one(spark, stream: bytes):
    df = spark.createDataFrame(
        [(1, bytearray(stream))], "media_id long, stream binary"
    )
    return decode_video_mc(df).collect()[0]


def test_translation_is_tracked(spark):
    # frame1 = frame0 shifted one pixel left (content moves +x under the
    # clamped-source convention: pred[y][x] = prev[y][x+1]), so every
    # block's best candidate must be index 1 = (dy=0, dx=+1), and the
    # residuals reduce to the intra quantization error.
    f0 = _frame0()
    f1 = [[row[min(x + 1, W - 1)] for x in range(W)] for row in f0]
    stream = _encode_one(spark, _vid0([f0, f1]))
    mv = stream[17 + 128 : 17 + 128 + 16]
    assert set(mv) == {1}
    row = _decode_one(spark, stream)
    assert row["mv_zero_blocks"] == 0
    assert row["mv_blocks"] == 16
    # per-pixel inter residual is bounded by the intra quantization
    # error (|orig - recon| <= 15), i.e. |rq| <= 1 -> magnitude <= 256;
    # uncompensated md5 noise would be ~40x that.
    inter_mag = row["residual_mag"]
    assert inter_mag <= 256 + 7 * 256  # intra nibbles + small inter part


def test_static_clip_picks_zero_vector(spark):
    f0 = _frame0()
    stream = _encode_one(spark, _vid0([f0, f0, f0]))
    row = _decode_one(spark, stream)
    assert row["mv_blocks"] == 32
    assert row["mv_zero_blocks"] == 32
    assert row["stream_bytes"] == 17 + 128 + 2 * 144 == len(stream)


def test_strict_parse_raises(spark):
    f0 = _frame0()
    stream = _encode_one(spark, _vid0([f0, f0]))
    with pytest.raises(Exception, match="bad MCV1 magic"):
        _decode_one(spark, b"XXXX" + stream[4:])
    with pytest.raises(Exception, match="quantizer"):
        _decode_one(spark, stream[:16] + bytes([7]) + stream[17:])
    with pytest.raises(Exception, match="trailing bytes"):
        _decode_one(spark, stream + b"\x00")
