"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The codec boundary decodes REAL formats that need no third-party
libraries — PGM/PPM images (netpbm P2/P3/P5/P6, pure numpy parse) and
WAV audio (stdlib ``wave``) — plus the deterministic "VDBF" fake that
the synthetic pipeline tests use. Compressed formats (PNG/JPEG/MP3/
MP4) still raise NotImplementedError with the integration point
documented: plugging PIL/soundfile/ffmpeg in changes only
``_decode_image`` / ``_decode_audio``.

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


def make_wav(media_id: int, *, rate: int = 8000, ms: int = 250) -> bytes:
    """Deterministic 16-bit mono WAV: seeded sine + low noise floor."""
    import io
    import wave

    rng = np.random.RandomState(media_id + 1)
    n = rate * ms // 1000
    t = np.arange(n) / rate
    freq = 200 + (media_id % 10) * 50
    sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
    samples = (np.clip(sig, -1.0, 1.0) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


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


def _pnm_tokens(content: bytes, n: int, start: int = 2) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer header tokens from a
    netpbm payload (skipping ``#`` comments); returns (tokens, offset
    one past the single whitespace that terminates the last token)."""
    toks: list[int] = []
    i, size = start, len(content)
    while len(toks) < n:
        while i < size and content[i : i + 1].isspace():
            i += 1
        if i < size and content[i : i + 1] == b"#":
            while i < size and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < size and not content[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(content[i:j]))
        i = j
    return toks, i + 1  # consume exactly one whitespace after the header


def _decode_image(content: bytes, fmt: str | None = None) -> np.ndarray:
    """Image codec boundary: VDBF (test fake), PGM (P2/P5) → (h, w)
    uint8, PPM (P3/P6) → (h, w, 3) uint8. Compressed formats (PNG/JPEG)
    need PIL — raise with the integration point named."""
    if content[:4] == _MAGIC:
        w, h = struct.unpack("<II", content[4:12])
        return np.frombuffer(content[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
    magic = content[:2]
    if magic in (b"P2", b"P3", b"P5", b"P6"):
        (w, h, maxval), off = _pnm_tokens(content, 3)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm samples not supported")
        channels = 3 if magic in (b"P3", b"P6") else 1
        count = w * h * channels
        if magic in (b"P5", b"P6"):  # binary raster
            px = np.frombuffer(content[off : off + count], dtype=np.uint8)
        else:  # ASCII raster
            px = np.array(content[off - 1 :].split()[:count], dtype=np.uint8)
        if px.size != count:
            raise ValueError("truncated netpbm raster")
        return px.reshape((h, w, 3) if channels == 3 else (h, w))
    raise NotImplementedError(
        f"codec for format {fmt!r} not available in this environment; "
        "plug PIL.Image.open into _decode_image for compressed formats"
    )


def _encode_image(px: np.ndarray, fmt: str) -> bytes:
    """Re-encode a decoded raster in the named uncompressed format."""
    if fmt == "VDBF":
        h, w = px.shape[:2]
        if px.ndim == 3:  # VDBF is grayscale-only
            px = _to_gray(px)
        return _MAGIC + struct.pack("<II", w, h) + px.astype(np.uint8).tobytes()
    if fmt in ("PGM", "PPM"):
        want_rgb = fmt == "PPM"
        if want_rgb and px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        if not want_rgb and px.ndim == 3:
            px = _to_gray(px)
        h, w = px.shape[:2]
        magic = b"P6" if want_rgb else b"P5"
        return magic + f"\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()
    raise NotImplementedError(f"encoder for format {fmt!r} not available")


def _to_gray(px: np.ndarray) -> np.ndarray:
    """RGB → luma (integer BT.601 — deterministic, no float drift)."""
    if px.ndim == 2:
        return px
    r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _format_of(content: bytes) -> str:
    if content[:4] == _MAGIC:
        return "VDBF"
    if content[:2] in (b"P2", b"P5"):
        return "PGM"
    if content[:2] in (b"P3", b"P6"):
        return "PPM"
    return "unknown"


def _decode_audio(content: bytes, fmt: str | None = None) -> tuple[np.ndarray, int]:
    """Audio codec boundary: WAV (stdlib ``wave``) → (mono int32
    samples, sample_rate). Compressed audio needs soundfile/ffmpeg."""
    import io
    import wave

    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        with wave.open(io.BytesIO(content), "rb") as wf:
            rate = wf.getframerate()
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise NotImplementedError(f"{width * 8}-bit WAV not supported")
        samples = np.frombuffer(raw, dtype=dtype).astype(np.int32)
        if dtype is np.uint8:
            samples -= 128
        if nch > 1:  # downmix: mean over channels
            samples = samples[: len(samples) - len(samples) % nch]
            samples = samples.reshape(-1, nch).mean(axis=1).astype(np.int32)
        return samples, rate
    raise NotImplementedError(
        f"codec for audio format {fmt!r} not available in this environment; "
        "plug soundfile/ffmpeg into _decode_audio for compressed audio"
    )


def _decode_payload(content: bytes, fmt: str | None) -> np.ndarray:
    """Back-compat image decode entry (grayscale view of any image)."""
    return _to_gray(_decode_image(content, fmt))


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
                px = _to_gray(_decode_image(bytes(content)))
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


def extract_audio_features(df: DataFrame, *, frames: int = 8) -> DataFrame:
    """content (WAV) → feature vector: per-frame RMS energy profile
    (``frames`` equal windows, normalized by peak RMS) + overall
    zero-crossing rate. Same mapInPandas batch shape as the image path;
    output feeds the KNN/ANN operators directly."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, rates = [], []
            for content in pdf["content"]:
                samples, rate = _decode_audio(bytes(content))
                rates.append(rate)
                n = len(samples)
                if n == 0:
                    feats.append([0.0] * (frames + 1))
                    continue
                edges = (np.arange(frames + 1) * n) // frames
                rms = np.array(
                    [
                        np.sqrt(np.mean(samples[edges[i] : max(edges[i + 1], edges[i] + 1)].astype(np.float64) ** 2))
                        for i in range(frames)
                    ]
                )
                peak = rms.max() or 1.0
                zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
                feats.append(
                    [float(np.float32(x)) for x in rms / peak]
                    + [float(np.float32(zcr))]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sample_rate": rates,
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize for any decodable format (VDBF/PGM/PPM);
    the output re-encodes in the input's own format. Output schema
    mirrors input."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for content in pdf["content"]:
                raw = bytes(content)
                fmt = _format_of(raw)
                px = _decode_image(raw)
                h, w = px.shape[:2]
                yi = (np.arange(height) * h // height).clip(0, h - 1)
                xi = (np.arange(width) * w // width).clip(0, w - 1)
                resized = px[np.ix_(yi, xi)]
                out_content.append(_encode_image(resized, fmt))
                out_meta.append(
                    {"format": fmt, "width": width, "height": height,
                     "duration_ms": None, "sample_rate": None}
                )
            pdf = pdf.copy()
            pdf["content"] = out_content
            pdf["meta"] = out_meta
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


def extract_image_ahash(df: DataFrame, *, bands: int = 8) -> DataFrame:
    """content → 128-bit average-hash, emitted as ``bands`` 16-bit
    integer band columns b0..b{bands-1} (the LSH-joinable layout: a
    near-dup self-join is an equi-join on any one band, and 8 bands of
    16 bits make banding LOSSLESS for Hamming <= 7 by pigeonhole).

    The hash bit for pixel p_i is the integer predicate
    ``npx * p_i > sum(p)`` — the classic brighter-than-mean aHash, kept
    in pure integer arithmetic so Spark, the closed-form oracle, and
    any other engine agree bit-for-bit (no float mean). Same Arrow
    batch shape as the sibling extractors: Python only at the codec
    boundary, one batch in / one out. Reference parity: the reference
    has no media pipeline at all; this is the image twin of its
    binary-vector Hamming index (SURVEY §2.6 T3/binary)."""
    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"b{j}", T.LongType(), False) for j in range(bands)]
    )
    bits_per = 128 // bands

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                px = _to_gray(_decode_image(bytes(content))).ravel().astype(np.int64)
                npx = px.size
                bits = (npx * px > px.sum()).astype(np.int64)
                # 128-pixel contract: smaller media zero-pad (bit=0:
                # a missing pixel is never brighter than the mean)
                if bits.size < 128:
                    bits = np.pad(bits, (0, 128 - bits.size))
                vals = [
                    int((bits[j * bits_per : (j + 1) * bits_per]
                         << np.arange(bits_per)).sum())
                    for j in range(bands)
                ]
                rows.append(vals)
            out = {"media_id": pdf["media_id"]}
            for j in range(bands):
                out[f"b{j}"] = [r[j] for r in rows]
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, out_schema)
