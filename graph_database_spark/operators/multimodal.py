"""Multimodal (binary-column) operators (SURVEY.md §2.11 X4 extension).

Design for image/audio/video at 100 TB: media is an opaque BINARY column
travelling next to a typed metadata struct; decode / feature-extract /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes cross
the JVM<->Python boundary once per batch, vectorized, never per row.

The actual codec layer is STUBBED in this environment (no image/audio
libraries in the container): ``extract_features`` applies a
deterministic byte-level featurizer (real Arrow plumbing, fake decode),
and ``decode_image`` raises NotImplementedError behind an import guard.
The Spark-side contract — schema, batch shape, partition behavior — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

from graph_database_spark.operators.spread import spread

__all__ = ["attach_media", "media_metadata", "extract_features", "resize_media", "frame_sample", "decode_image"]

N_FEATURES = 8

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media", BinaryType()),
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ])),
])


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build the canonical media frame from the documents table: binary
    payload (the UTF-8 bytes — a deterministic stand-in for image/audio
    blobs) + typed metadata struct. In a real pipeline this frame comes
    straight off the object-store manifest; everything downstream only
    sees (media_id, media BINARY, meta STRUCT)."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        media.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    """Metadata rollup per source: ``(source, n_media, total_bytes)`` —
    the JVM-only slice of the pipeline (no Python), oracle-checkable."""
    m = attach_media(docs)
    return m.groupBy(F.col("meta.source").alias("source")).agg(
        F.count("*").alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
    )


def _feature_batches(batches: Iterator, n_features: int):
    # Runs on executors: one pandas DataFrame per Arrow batch. The
    # "decode" here is a deterministic byte-histogram moment vector —
    # the stand-in for a real image/audio featurizer; swap this body for
    # the codec call and nothing else changes. The histogram is ONE
    # vectorized pass over the batch's concatenated bytes (np.add.at on
    # a (row, bucket) index), not a per-row Python loop.
    import numpy as np
    import pandas as pd

    for pdf in batches:
        bufs = [np.frombuffer(bytes(b), dtype=np.uint8) for b in pdf["media"]]
        lens = np.fromiter((b.size for b in bufs), dtype=np.int64, count=len(bufs))
        hist = np.zeros((len(bufs), n_features), dtype=np.float64)
        if lens.sum() > 0:
            flat = np.concatenate(bufs) % n_features
            row_idx = np.repeat(np.arange(len(bufs)), lens)
            np.add.at(hist, (row_idx, flat), 1.0)
        feats = (hist / np.maximum(lens, 1)[:, None]).round(6)
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
            "features": list(feats),
        })


def _pil_image():
    """The PIL Image module, or None when no imaging library is baked in
    (this container). Import-guarded so the byte-level paths never
    depend on it."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _image_feature_batches(batches: Iterator, n_features: int):
    # Executor-side REAL decode kernel: PIL-decode each blob, then an
    # n_features-bin luminance histogram over the normalized pixels —
    # the per-image codec call is inherently per-row (that IS the
    # decode), but the histogram/normalize math is numpy-vectorized per
    # image and bytes still cross the JVM boundary once per Arrow batch.
    import io

    import numpy as np
    import pandas as pd
    from PIL import Image

    for pdf in batches:
        feats, sizes = [], []
        for b in pdf["media"]:
            raw = bytes(b)
            arr = (
                np.asarray(
                    Image.open(io.BytesIO(raw)).convert("RGB"), dtype=np.float64
                )
                / 255.0
            )
            luma = arr @ np.array([0.2126, 0.7152, 0.0722])
            hist, _ = np.histogram(luma, bins=n_features, range=(0.0, 1.0))
            feats.append((hist / max(luma.size, 1)).round(6))
            sizes.append(len(raw))
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "n_bytes": pd.Series(sizes, dtype="int64"),
            "features": feats,
        })


def extract_features(
    media: DataFrame, n_features: int = N_FEATURES, decode: str = "bytes"
) -> DataFrame:
    """Vectorized feature extraction: ``(media_id, n_bytes,
    features ARRAY<FLOAT>)`` via mapInPandas (Arrow batches).

    ``decode="bytes"`` (default) uses the deterministic byte-histogram
    featurizer — no codec dependency, oracle-checkable. ``decode="image"``
    runs the REAL decode kernel (PIL → RGB → luminance histogram); it
    raises NotImplementedError when no imaging library is installed, so
    the capability is explicit rather than silently degraded.

    Partition-preserving and shuffle-free; at scale the only knobs are
    input partition size (keep batches of media under executor memory)
    and ``spark.sql.execution.arrow.maxRecordsPerBatch`` for very large
    blobs."""
    if decode not in ("bytes", "image"):
        raise ValueError(f"unknown decode mode {decode!r}")
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ])
    if decode == "image":
        if _pil_image() is None:
            raise NotImplementedError(
                "decode='image' needs an imaging library (PIL) absent from "
                "this environment; decode='bytes' is the codec-free path"
            )
        return spread(media).mapInPandas(
            lambda it: _image_feature_batches(it, n_features), schema
        )
    return spread(media).mapInPandas(
        lambda it: _feature_batches(it, n_features), schema
    )


def _resize_batches(batches: Iterator, factor: int):
    # Executor-side: deterministic byte decimation (every factor-th
    # byte) stands in for pixel-space downsampling — swap the slice for
    # a real resampler (PIL/opencv) and the plumbing is unchanged. One
    # vectorized numpy slice per row buffer; no per-byte Python.
    import numpy as np
    import pandas as pd

    for pdf in batches:
        resized = [
            np.frombuffer(bytes(b), dtype=np.uint8)[::factor].tobytes()
            for b in pdf["media"]
        ]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "orig_bytes": pdf["media"].map(len),
            "resized_bytes": [len(r) for r in resized],
            "resized": resized,
        })


def resize_media(media: DataFrame, factor: int = 4) -> DataFrame:
    """Downsample each blob by ``factor``: ``(media_id, orig_bytes,
    resized_bytes, resized BINARY)`` — the resize leg of the multimodal
    quartet (decode / feature-extract / RESIZE / frame-sample), run as
    the same Arrow ``mapInPandas`` shape as extract_features:
    partition-preserving, shuffle-free, bytes cross the Python boundary
    once per batch."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized", BinaryType()),
    ])
    return spread(media).mapInPandas(lambda it: _resize_batches(it, factor), schema)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Sample every ``every_n``-th fixed-size chunk of each payload:
    ``(media_id, frame_idx, frame BINARY)`` — the video-frame-sampling
    shape (split a container into frames, keep a stride) with byte
    chunks standing in for decoded frames. Pure JVM (no Python): slices
    of the binary column via higher-order functions over a chunk index."""
    n_chunks = F.ceil(F.octet_length("media") / F.lit(frame_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return (
        media.select("media_id", "media", F.explode(idx).alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            F.expr(f"substring(media, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias("frame"),
        )
    )


def _decode_batches(batches: Iterator):
    # Executor-side: PIL-decode each blob to (width, height, mode,
    # mean_luma). Decode is per-image by nature; everything around it is
    # Arrow-batched.
    import io

    import numpy as np
    import pandas as pd
    from PIL import Image

    for pdf in batches:
        widths, heights, modes, lumas = [], [], [], []
        for b in pdf["media"]:
            img = Image.open(io.BytesIO(bytes(b)))
            widths.append(img.width)
            heights.append(img.height)
            modes.append(img.mode)
            arr = np.asarray(img.convert("RGB"), dtype=np.float64) / 255.0
            lumas.append(
                round(float((arr @ np.array([0.2126, 0.7152, 0.0722])).mean()), 6)
            )
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "width": pd.Series(widths, dtype="int64"),
            "height": pd.Series(heights, dtype="int64"),
            "mode": modes,
            "mean_luma": lumas,
        })


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode: ``(media_id, width, height, mode, mean_luma)``
    via PIL inside the same Arrow ``mapInPandas`` shape as
    extract_features. Raises NotImplementedError when no imaging library
    is installed (this container) — the capability gate is explicit; the
    plumbing (schema, batching, partition behavior) is identical to the
    tested byte-level paths."""
    if _pil_image() is None:
        raise NotImplementedError(
            "image codec not available in this environment; extract_features "
            "demonstrates the mapInPandas plumbing with a byte-level featurizer"
        )
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("mean_luma", DoubleType()),
    ])
    return spread(media).mapInPandas(_decode_batches, schema)
