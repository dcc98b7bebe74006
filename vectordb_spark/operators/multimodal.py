"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The image/audio codec libraries are not in this environment, so the
*codec* step is stubbed: real media formats raise NotImplementedError
with the integration point documented, and a deterministic fake format
("VDBF") exercises the full pipeline — schema, partitioning, UDF
signatures, and batch shapes are all real and tested. Swapping the stub
for PIL/ffmpeg changes only `_decode_payload`.

Scale notes: binary payloads stay in Arrow record batches end-to-end
(no Python-object rows); mapInPandas streams batches so executor memory
is bounded by batch size, not partition size; feature vectors come back
as array<float> ready for the KNN/ANN operators.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"VDBF"  # deterministic fake media format for tests


def make_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image: magic + dims + seeded pixel bytes."""
    seed = hashlib.blake2b(str(media_id).encode(), digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(seed[:4], "little"))
    pixels = rng.randint(0, 256, size=width * height, dtype=np.uint8)
    return _MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        rows.append(
            (
                i,
                "image",
                make_fake_image(i, w, h),
                ("VDBF", w, h, None, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(content: bytes, fmt: str | None) -> np.ndarray:
    """Codec boundary. Real formats need PIL/ffmpeg — not available
    here; the fake VDBF format decodes deterministically."""
    if content[:4] == _MAGIC:
        w, h = struct.unpack("<II", content[4:12])
        return np.frombuffer(content[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
    raise NotImplementedError(
        f"codec for format {fmt!r} not available in this environment; "
        "plug PIL.Image.open / soundfile / ffmpeg into _decode_payload"
    )


def extract_image_features(df: DataFrame, *, bins: int = 16) -> DataFrame:
    """content → histogram feature vector (array<float>), via
    mapInPandas: one Arrow batch in, one out; schema = input minus
    content plus features."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                px = _decode_payload(bytes(content), None)
                hist, _ = np.histogram(px, bins=bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append([float(np.float32(x / total)) for x in hist])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize inside the fake codec (real formats hit
    the NotImplementedError boundary). Output schema mirrors input."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for content in pdf["content"]:
                px = _decode_payload(bytes(content), None)
                h, w = px.shape
                yi = (np.arange(height) * h // height).clip(0, h - 1)
                xi = (np.arange(width) * w // width).clip(0, w - 1)
                resized = px[np.ix_(yi, xi)]
                out_content.append(
                    _MAGIC + struct.pack("<II", width, height) + resized.tobytes()
                )
            pdf = pdf.copy()
            pdf["content"] = out_content
            pdf["meta"] = [
                {"format": "VDBF", "width": width, "height": height,
                 "duration_ms": None, "sample_rate": None}
                for _ in out_content
            ]
            yield pdf

    return df.mapInPandas(_resize, MEDIA_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: explode (media_id, frame_ts_ms) rows
    from duration metadata — pure Column ops; the frame *decode* is the
    same codec boundary as above."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
