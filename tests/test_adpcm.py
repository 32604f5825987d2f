"""IMA ADPCM codec (operators/adpcm.py): encoder/decoder parity,
container strictness, and the 4:1 compression shape."""

from __future__ import annotations

import struct

import pytest

from graph_database_spark.operators.adpcm import (
    ADPCM_BASE,
    _encode_decode,
    _src_samples,
    attach_adpcm,
    decode_adpcm,
)
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_roundtrip_matches_encoder_internal_decode(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(6)
    out = {r["media_id"]: r for r in decode_adpcm(attach_adpcm(docs)).collect()}
    meta = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    for mid, r in out.items():
        n = ADPCM_BASE + int(meta[mid]) % 97
        _, decoded = _encode_decode(_src_samples(mid, n))
        assert r["n_samples"] == n
        assert r["energy"] == sum(x * x for x in decoded)
        assert r["peak"] == max(abs(x) for x in decoded)
        assert r["compressed_bytes"] == 11 + (n + 1) // 2  # ~4:1 vs 2n raw


def test_decode_is_close_but_lossy(spark):
    # ADPCM tracks the waveform: decoded energy within 2x of source
    # energy, but not equal (it IS lossy on this white-noise-ish input).
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    for r in decode_adpcm(attach_adpcm(docs)).collect():
        n = r["n_samples"]
        src = _src_samples(r["media_id"], n)
        src_energy = sum(x * x for x in src)
        assert 0.1 * src_energy < r["energy"] < 10 * src_energy
        _, decoded = _encode_decode(src)
        assert decoded != src  # genuinely lossy


def test_bad_magic_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOPE" + bytes(16)))], "media_id long, adpcm binary"
    )
    with pytest.raises(Exception, match="magic|PythonException"):
        decode_adpcm(df).collect()


def test_truncated_raises(spark):
    blob = b"ADP1" + struct.pack("<IhB", 100, 0, 0) + bytes(10)  # needs 50
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, adpcm binary"
    )
    with pytest.raises(Exception, match="truncated|PythonException"):
        decode_adpcm(df).collect()
