"""PNG codec round-trip (operators/png.py): strictness (CRC, framing,
filters), full five-filter decode, and PIL cross-validation when
available."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from graph_database_spark.operators.png import (
    PNG_H,
    PNG_W,
    attach_png,
    decode_png,
)
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_from_rows(rows, filters):
    """Encode arbitrary pixel rows with the given per-row filter types
    (an independent mini-encoder covering Average/Paeth too)."""
    w = len(rows[0])
    raw = bytearray()
    prev = [0] * w
    for r, ft in zip(rows, filters):
        raw.append(ft)
        for x in range(w):
            a = r[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ft == 0:
                v = r[x]
            elif ft == 1:
                v = r[x] - a
            elif ft == 2:
                v = r[x] - b
            elif ft == 3:
                v = r[x] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = r[x] - pr
            raw.append(v & 0xFF)
        prev = r
    ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _decode_one(spark, blob):
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, png binary")
    return decode_png(df).collect()[0]


def test_all_five_filters_decode(spark):
    rows = [
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [100, 0, 255, 7],
        [1, 2, 3, 4],
        [200, 199, 198, 197],
    ]
    blob = _png_from_rows(rows, [0, 1, 2, 3, 4])
    got = _decode_one(spark, blob)
    assert got["luma_sum"] == sum(sum(r) for r in rows)
    assert got["peak_luma"] == 255
    assert got["grad_sum"] == sum(
        abs(r[x] - r[x - 1]) for r in rows for x in range(1, 4)
    )


def test_crc_tamper_raises(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    blob = bytes(attach_png(docs).collect()[0]["png"])
    # flip one byte inside the IDAT body
    i = blob.index(b"IDAT") + 10
    bad = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
    with pytest.raises(Exception, match="CRC|PythonException"):
        _decode_one(spark, bad)


def test_bad_signature_raises(spark):
    with pytest.raises(Exception, match="signature|PythonException"):
        _decode_one(spark, b"NOTAPNG!" + bytes(64))


def test_roundtrip_matches_generator_pixels(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(8)
    out = {r["media_id"]: r for r in decode_png(attach_png(docs)).collect()}
    for mid, r in out.items():
        rows = [
            hashlib.md5(f"{mid}|png|{y}".encode()).digest() for y in range(PNG_H)
        ]
        assert r["luma_sum"] == sum(sum(row) for row in rows)
        assert r["width"] == PNG_W and r["height"] == PNG_H


def test_pil_cross_validates_container(spark):
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed in this container")
    docs = load_table(spark, SF_DIR, "documents").limit(4)
    for row in attach_png(docs).collect():
        img = Image.open(BytesIO(bytes(row["png"])))
        assert img.size == (PNG_W, PNG_H) and img.mode == "L"
        px = list(img.getdata())
        want = [
            b
            for y in range(PNG_H)
            for b in hashlib.md5(f"{row['media_id']}|png|{y}".encode()).digest()
        ]
        assert px == want
