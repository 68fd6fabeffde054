"""Multimodal column operators — image/audio/video as opaque binary columns.

The reference's multimodal surface is thin (core_vision ``PromptedVQAGenerator``,
core_speech ``Speech2TextGenerator``, pdf2vqa — all external-model calls,
dataflow/operators/core_vision, core_speech).  The engine treats media as a
first-class column kind instead:

    payload : binary          -- the encoded media bytes (never parsed by Spark)
    media   : struct<kind:string, format:string, n_bytes:int, sha:string>

and implements the standard prep stages — decode, feature-extract, resize,
frame-sample — as Arrow-batched ``mapInPandas`` stages.  Decode is REAL for
formats the Python stdlib can parse — binary netpbm (P5/P6), uncompressed
24-bit BMP, and PCM WAV (``wave`` module) — and honestly gated for formats
that need a codec library not in this container (png/jpeg/mp4 raise
``NotImplementedError`` with guidance; ``fake=True`` selects a deterministic
pure-numpy stand-in that exercises the same Spark plumbing end-to-end).

Scale notes: media rows are fat (payload dominates).  ``repartition_for_media``
targets a bytes-per-partition budget instead of a row count so Arrow batches
stay within executor memory; metadata-only stages prune ``payload`` (Catalyst
column pruning keeps the scan narrow when the sink only needs features).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("format", T.StringType()),    # png | wav | mp4 | raw …
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha", T.StringType()),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", kind: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Typed metadata struct from the raw binary — pure JVM expressions."""
    p = F.col(payload_col)
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.length(p).cast("int").alias("n_bytes"),
            F.sha2(p, 256).alias("sha"),
        ),
    )


def repartition_for_media(
    df: DataFrame, payload_col: str = "payload", target_mb: int = 64
) -> DataFrame:
    """Repartition so each partition carries ~``target_mb`` of payload bytes —
    the knob that keeps Arrow batches bounded when rows are megabytes each."""
    total = df.agg(F.sum(F.length(payload_col))).collect()[0][0] or 0
    n = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n)


# ---------------------------------------------------------------------------
# decode kernels
# ---------------------------------------------------------------------------


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P6 color / P5 gray, maxval<=255) -> (h, w, 3) uint8.
    Pure stdlib+numpy — no codec library involved."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens; pixel data starts after the single whitespace byte that follows
    # maxval.
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=i)
    px = px.reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8 RGB.
    Rows are 4-byte aligned and stored bottom-up, pixels BGR."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP decoded here (bpp={bpp}, "
            f"compression={compression}); install a codec for the rest"
        )
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    return px[::-1] if flipped else px


def _decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV -> (n_samples, n_channels) float32 in [-1, 1], via the stdlib
    ``wave`` module (real decode, no external codec)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, sw, _rate, nframes = (
            wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"sample width {sw} not supported")
    return x.reshape(-1, nch)


def wav_rate(payload: bytes) -> int:
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        return wf.getframerate()


def _decode_real(payload: bytes, fmt: str) -> np.ndarray:
    """Real decode for formats the stdlib can parse (netpbm, uncompressed
    24-bit BMP, PCM WAV); png/jpeg/mp4 genuinely need a codec library that is
    not in this container, and raise with guidance."""
    f = (fmt or "").lower()
    if f in ("ppm", "pgm", "pnm"):
        return _decode_ppm(payload)
    if f == "bmp":
        return _decode_bmp(payload)
    if f == "wav":
        return _decode_wav(payload)
    if f == "raw" and payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if f == "raw" and payload[:2] == b"BM":
        return _decode_bmp(payload)
    if f == "raw" and payload[:4] == b"RIFF":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"decoding {fmt!r} requires an image/audio codec library (PIL / cv2 / "
        "librosa), which is not installed in this environment; ppm/pgm, "
        "uncompressed 24-bit bmp, and pcm wav decode natively — or run with "
        "fake=True for the deterministic stand-in"
    )


def _decode_fake(payload: bytes, fmt: str) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> (h, w, 3) uint8 'pixels'.
    h and w derive from the payload's sha256 so results are stable across
    engines and runs; pixel values tile the payload bytes."""
    digest = hashlib.sha256(payload).digest()
    h = 8 + digest[0] % 25          # 8..32
    w = 8 + digest[1] % 25
    need = h * w * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(need / len(buf)))
    return np.tile(buf, reps)[:need].reshape(h, w, 3)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode + per-channel feature extraction via ``mapInPandas`` (Arrow
    batches; one Python worker per partition, vectorized inside)."""
    decode = _decode_fake if fake else _decode_real
    fields = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(IMAGE_FEATURES_SCHEMA.fields)
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode(bytes(payload), "raw").astype(np.float64)
                means = px.mean(axis=(0, 1))
                rows.append(
                    (
                        _id,
                        px.shape[0],
                        px.shape[1],
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        float(px.mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col] + fields)

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def image_resize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    size: tuple[int, int] = (8, 8),
    fake: bool = False,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw bytes.  The resize
    itself is pure numpy (index grid), codec only at the decode edge."""
    decode = _decode_fake if fake else _decode_real
    th, tw = size
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("resized", T.BinaryType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
        ]
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode(bytes(payload), "raw")
                h, w, _ = px.shape
                yi = (np.arange(th) * h // th).astype(int)
                xi = (np.arange(tw) * w // tw).astype(int)
                small = px[yi][:, xi]
                rows.append((_id, small.tobytes(), th, tw))
            yield pd.DataFrame(rows, columns=[id_col, "resized", "height", "width"])

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio feature extraction over PCM WAV payloads — the decode is the
    stdlib ``wave`` module (no codec stub): per row emits sample counts,
    rate, duration, RMS, peak, and zero-crossing rate of the mono mix.  Same
    ``mapInPandas`` batch shape as image_features; pair with
    ``repartition_for_media`` so Arrow batches stay bytes-bounded."""
    fields = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(AUDIO_FEATURES_SCHEMA.fields)
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                # features in float64: int16/2^15 is exact in f64, which
                # keeps simple signals bit-equal to closed-form oracles
                x = _decode_wav(b).astype(np.float64)
                rate = wav_rate(b)
                mono = x.mean(axis=1)
                n = len(mono)
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                rows.append(
                    (
                        _id,
                        n,
                        x.shape[1],
                        rate,
                        n / rate if rate else 0.0,
                        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
                        float(np.max(np.abs(x))) if n else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col] + fields)

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 256,
    every_k: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stand-in: treat the payload as a sequence of
    fixed-size frames, keep every k-th, emit (id, frame_idx, frame).  The
    explode happens Python-side inside ``mapInPandas`` so a 1 GB video never
    materializes as a single Spark row downstream."""
    if not fake:
        _decode_real(b"", "mp4")  # raises with guidance
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_bytes)
                for i in range(0, n_frames, every_k):
                    ids.append(_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)
