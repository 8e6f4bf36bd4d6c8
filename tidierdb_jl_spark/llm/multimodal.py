"""Multimodal (image/audio/video) column handling for LLM data pipelines.

Convention: media travel as opaque ``binary`` content columns with a typed
metadata struct alongside::

    content   BINARY
    media     STRUCT<kind: STRING, mime: STRING, width: INT, height: INT,
                     duration_ms: BIGINT>

Decoding/feature extraction runs as Arrow-batched ``mapInPandas`` — one
Python worker per partition, batches of rows, never per-row UDF overhead.
The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``,
which substitutes a deterministic fake decoder (hash-derived pixels) —
the Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested either way.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_STRUCT",
    "attach_media_metadata",
    "decode_image",
    "resize_image",
    "extract_audio_features",
    "frame_sample",
]

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_metadata(tf, content_col: str, kind: str, mime: str):
    """Wrap a binary column with the standard media-metadata struct
    (sizes unknown until decode → NULL)."""
    return tf.mutate(
        media=(
            f"named_struct('kind', '{kind}', 'mime', '{mime}', "
            f"'width', CAST(NULL AS INT), 'height', CAST(NULL AS INT), "
            f"'duration_ms', CAST(NULL AS BIGINT))"
        )
    )


def decode_image(tf, content_col: str = "content", fake: bool = False):
    """Decode image bytes → (width, height, mean_luma) features via
    Arrow-batched mapInPandas.

    Real decoding needs an image codec library not present in this
    container; ``fake=True`` uses a deterministic stand-in (md5-derived
    "dimensions") so the distributed plumbing can be exercised and
    benchmarked end-to-end.
    """
    out_schema = T.StructType(
        list(tf.df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass fake=True to exercise the pipeline"
                )
            widths, heights, lumas = [], [], []
            for blob in pdf[content_col]:
                h = hashlib.md5(bytes(blob) if blob is not None else b"").digest()
                widths.append(64 + h[0])
                heights.append(64 + h[1])
                lumas.append(h[2] / 255.0)
            pdf = pdf.assign(width=widths, height=heights, mean_luma=lumas)
            pdf["width"] = pdf["width"].astype("int32")
            pdf["height"] = pdf["height"].astype("int32")
            yield pdf

    from ..core import TidyFrame

    return TidyFrame(tf.df.mapInPandas(run, out_schema))


def resize_image(
    tf,
    content_col: str = "content",
    width: int = 224,
    height: int = 224,
    fake: bool = False,
):
    """Resize image bytes to (width, height), replacing ``content`` and
    stamping the media struct dims.  Same Arrow-batched mapInPandas shape
    as decode; the fake path emits a deterministic digest-derived blob of
    the right conceptual size so downstream plumbing sees realistic
    bytes-in/bytes-out."""
    fields = []
    for f_ in tf.df.schema.fields:
        fields.append(f_)
    out_schema = T.StructType(fields)

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass fake=True to exercise the pipeline"
                )
            blobs = []
            for blob in pdf[content_col]:
                src = bytes(blob) if blob is not None else b""
                seed = hashlib.md5(src + f"{width}x{height}".encode()).digest()
                # deterministic stand-in: digest tiled to a small payload
                blobs.append((seed * 8)[: 64])
            pdf = pdf.assign(**{content_col: blobs})
            yield pdf

    from ..core import TidyFrame

    out = TidyFrame(tf.df.mapInPandas(run, out_schema))
    if "media" in tf.df.columns:
        out = out.mutate(
            media=(
                "named_struct('kind', media.kind, 'mime', media.mime, "
                f"'width', CAST({width} AS INT), 'height', CAST({height} AS INT), "
                "'duration_ms', media.duration_ms)"
            )
        )
    return out


def extract_audio_features(tf, content_col: str = "content", fake: bool = False):
    """Audio bytes → (duration_ms, rms, zero_crossings) via mapInPandas.
    Real decoding needs an audio codec; the fake path derives features
    from the content digest, deterministically."""
    out_schema = T.StructType(
        list(tf.df.schema.fields)
        + [
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio codec not available in this environment; "
                    "pass fake=True to exercise the pipeline"
                )
            dur, rms, zc = [], [], []
            for blob in pdf[content_col]:
                h = hashlib.md5(bytes(blob) if blob is not None else b"").digest()
                dur.append(1000 + int.from_bytes(h[0:2], "big"))
                rms.append(h[2] / 255.0)
                zc.append(int.from_bytes(h[3:5], "big"))
            pdf = pdf.assign(duration_ms=dur, rms=rms, zero_crossings=zc)
            pdf["duration_ms"] = pdf["duration_ms"].astype("int64")
            pdf["zero_crossings"] = pdf["zero_crossings"].astype("int64")
            yield pdf

    from ..core import TidyFrame

    return TidyFrame(tf.df.mapInPandas(run, out_schema))


def frame_sample(tf, content_col: str = "content", every_ms: int = 1000, fake: bool = False):
    """Sample frames from video bytes → one row per frame with
    ``frame_idx`` and a (stub) frame fingerprint.  Same mapInPandas
    pattern; deterministic fake derives a frame count from the blob hash."""
    out_schema = T.StructType(
        list(tf.df.schema.fields)
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_fp", T.StringType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codec not available in this environment; "
                    "pass fake=True to exercise the pipeline"
                )
            rows = []
            for _, row in pdf.iterrows():
                blob = bytes(row[content_col]) if row[content_col] is not None else b""
                h = hashlib.md5(blob).digest()
                n_frames = 1 + h[0] % 4
                for i in range(n_frames):
                    d = dict(row)
                    d["frame_idx"] = i
                    d["frame_fp"] = hashlib.md5(blob + bytes([i])).hexdigest()
                    rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    from ..core import TidyFrame

    return TidyFrame(tf.df.mapInPandas(run, out_schema))
