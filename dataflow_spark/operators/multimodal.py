"""Multimodal column operators — image/audio/video as opaque binary columns.

The reference's multimodal surface is thin (core_vision ``PromptedVQAGenerator``,
core_speech ``Speech2TextGenerator``, pdf2vqa — all external-model calls,
dataflow/operators/core_vision, core_speech).  The engine treats media as a
first-class column kind instead:

    payload : binary          -- the encoded media bytes (never parsed by Spark)
    media   : struct<kind:string, format:string, n_bytes:int, sha:string>

and implements the standard prep stages — decode, feature-extract, resize,
frame-sample — as Arrow-batched ``mapInPandas`` stages.  The image/audio codec
libraries are NOT in this container, so the decode kernel is stubbed: by
default it raises ``NotImplementedError`` (clearly marked), and tests run with
``fake=True``, a deterministic pure-numpy stand-in that exercises the REAL
Spark plumbing (schema, batching, partitioning, UDF signature) end-to-end.

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


def _decode_real(payload: bytes, fmt: str) -> np.ndarray:
    """Real decode requires PIL/cv2/librosa — not in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library (PIL / cv2 / "
        "librosa), which is not installed in this environment; run with "
        "fake=True for the deterministic stand-in, or install a codec and "
        "plug it in here"
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
