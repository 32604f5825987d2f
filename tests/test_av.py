"""Audio/video codec tests (operators/av.py).

The catalog oracle certifies the round-trip against the generator; here
the WAV container is additionally validated by the stdlib ``wave``
module (an independent RIFF implementation), and the parsers' strict
failure modes are pinned.
"""

from __future__ import annotations

import io
import wave

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators import av


def _docs(spark):
    return spark.createDataFrame(
        [(1, 100), (2, 257)], "doc_id long, n_chars long"
    )


def test_wav_container_readable_by_stdlib(spark):
    rows = av.attach_audio(_docs(spark)).collect()
    assert len(rows) == 2
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["audio"]))) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == av.SAMPLE_RATE
            n_expected = av.AUDIO_BASE + {1: 100, 2: 257}[r["media_id"]] % av.AUDIO_MOD
            assert w.getnframes() == n_expected


def test_audio_roundtrip_features(spark):
    feats = {
        r["media_id"]: r
        for r in av.decode_audio(av.attach_audio(_docs(spark))).collect()
    }
    import hashlib

    for mid, nc in ((1, 100), (2, 257)):
        n = av.AUDIO_BASE + nc % av.AUDIO_MOD
        s = [
            int(hashlib.md5(f"{mid}|{k}".encode()).hexdigest()[:4], 16) - 32768
            for k in range(n)
        ]
        r = feats[mid]
        assert r["n_samples"] == n
        assert r["sample_rate"] == av.SAMPLE_RATE
        assert r["energy"] == sum(x * x for x in s)
        assert r["peak"] == max(abs(x) for x in s)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )


def test_video_roundtrip_shapes_and_motion(spark):
    out = {
        r["media_id"]: r
        for r in av.decode_video(av.attach_video(_docs(spark))).collect()
    }
    assert out[1]["n_frames"] == av.VID_BASE + 100 % av.VID_MOD
    assert out[1]["width"] == av.VID_W and out[1]["height"] == av.VID_H
    # md5 bytes are uniform-ish: luma_sum close to 127.5 * n_pixels
    npix = out[1]["n_frames"] * av.VID_W * av.VID_H
    assert 0 < out[1]["luma_sum"] < 255 * npix
    assert out[1]["peak_luma"] <= 255
    assert out[1]["motion_sum"] > 0  # frames differ


def test_decoders_reject_corrupt_containers(spark):
    bad_audio = spark.createDataFrame(
        [(1, bytearray(b"JUNKJUNKJUNK"))], "media_id long, audio binary"
    )
    with pytest.raises(Exception, match="RIFF|WAVE"):
        av.decode_audio(bad_audio).collect()
    bad_video = spark.createDataFrame(
        [(1, bytearray(b"NOPE" + b"\x00" * 20))], "media_id long, video binary"
    )
    with pytest.raises(Exception, match="magic"):
        av.decode_video(bad_video).collect()
