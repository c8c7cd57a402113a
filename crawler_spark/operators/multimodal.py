"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through ``mapInPandas`` stages.

The Spark-side contract is real and tested — schemas, partition-preserving
batch shapes, Arrow binary transfer, deterministic outputs. The codec
layer follows the attachment-parser pattern (operators/attachments.py):
each per-kind decoder ATTEMPTS its real library import (Pillow for
images, PyAV for audio/video) and decodes for real when it is present —
a cluster with the libraries installed needs no code change. The import
raising (library genuinely absent, as in this sandbox) fails fast;
per-row DECODE errors (corrupt payload) flow to the failure path
(``feature`` NULL), never kill the job. ``fake=True`` is the
deterministic sandbox test path: a sha256-seeded feature vector stands
in for the decoder output.

Design notes for 100 TB of media:
* blobs stay in the ``payload`` binary column end-to-end (no driver
  collect); ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the
  per-batch memory (payloads ~MBs → set it low, e.g. 64);
* decode/feature stages are ``mapInPandas`` so one task streams batches
  (constant memory), not one giant pandas DataFrame;
* frame sampling emits multiple rows per input row (iterator → explode
  shape), which mapInPandas expresses naturally.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

FRAMES = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded floats."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _decode_image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real image features: grayscale thumbnail column means. The PIL
    import is guarded like attachments._parse_pdf — absent library →
    ImportError (fail fast: an environment problem, not a data one)."""
    import io

    from PIL import Image  # import-guarded: absent in this sandbox

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr.mean(axis=0).astype(np.float32)


def _decode_av_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real audio/video features via PyAV: first decoded frame pooled to
    ``dim`` bins (video: grayscale column means; audio: RMS per bin)."""
    import io

    import av  # import-guarded: absent in this sandbox

    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode():
            if hasattr(frame, "to_ndarray"):
                arr = frame.to_ndarray().astype(np.float32).ravel()
                if arr.size == 0:
                    break
                bins = np.array_split(arr, dim)
                return np.array(
                    [float(np.sqrt(np.mean(b * b))) if b.size else 0.0 for b in bins],
                    dtype=np.float32,
                )
    raise ValueError("no decodable frame")


_REAL_DECODERS = {
    "image": _decode_image_features,
    "audio": _decode_av_features,
    "video": _decode_av_features,
}


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload → feature vector, one row per asset (mapInPandas).

    ``fake=False`` runs the real per-kind decoders: a missing library
    raises (environment error), while a row whose payload fails to
    decode yields ``feature = NULL`` (data error → failure path, the
    job survives). ``fake=True`` is the deterministic stand-in."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode_features(p).tolist() for p in pdf["payload"]
                ]
            else:
                feats = []
                for k, p in zip(pdf["kind"], pdf["payload"]):
                    decoder = _REAL_DECODERS.get(k)
                    try:
                        feats.append(
                            decoder(bytes(p or b"")).tolist() if decoder else None
                        )
                    except ImportError:
                        raise  # library absent: fail fast, don't mask
                    except Exception:
                        feats.append(None)  # corrupt payload → NULL
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                }
            )

    return df.mapInPandas(gen, FEATURES)


def _decode_video_frames(
    payload: bytes, duration_ms: int, every_ms: int
) -> list[tuple[int, bytes]]:
    """Real frame sampling via PyAV: seek to ``frame_idx * every_ms`` and
    emit the first decoded video frame at/after that timestamp as raw
    grayscale bytes. Same guarded-import shape as
    :func:`_decode_av_features` — absent library → ImportError (fail
    fast); a payload that opens but yields no frame at some timestamp
    simply stops emitting (data, not environment)."""
    import io

    import av  # import-guarded: absent in this sandbox

    out: list[tuple[int, bytes]] = []
    n_frames = max(1, int(duration_ms) // every_ms)
    with av.open(io.BytesIO(payload)) as container:
        stream = next((s for s in container.streams if s.type == "video"), None)
        if stream is None:
            raise ValueError("no video stream")
        tb = float(stream.time_base) if stream.time_base else None
        for i in range(n_frames):
            target_ms = i * every_ms
            if tb:
                # seek backward to the keyframe at/before the target, then
                # decode forward to the first frame at/after it
                container.seek(
                    int(target_ms / 1000.0 / tb), stream=stream, backward=True
                )
            got = None
            for frame in container.decode(stream):
                pts_ms = (
                    float(frame.pts) * tb * 1000.0
                    if (tb and frame.pts is not None)
                    else target_ms
                )
                if pts_ms >= target_ms:
                    got = frame
                    break
            if got is None:
                break  # past end of stream
            out.append((i, got.to_ndarray(format="gray").tobytes()))
    return out


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video → one row per sampled frame (fan-out mapInPandas stage).

    ``fake=False`` seeks/decodes for real via PyAV (grayscale frame bytes
    at ``frame_idx * every_ms``); a missing library raises ImportError
    (environment error), while a row whose payload fails to open or
    decode emits no frames (data error → the job survives). ``fake=True``
    slices the payload deterministically per frame (sandbox test path)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                if r["kind"] != "video" or not r["duration_ms"]:
                    continue
                if fake:
                    n_frames = max(1, int(r["duration_ms"]) // every_ms)
                    payload = r["payload"] or b""
                    step = max(1, len(payload) // max(1, n_frames))
                    frames = [
                        (i, payload[i * step : (i + 1) * step])
                        for i in range(n_frames)
                    ]
                else:
                    try:
                        frames = _decode_video_frames(
                            bytes(r["payload"] or b""),
                            int(r["duration_ms"]),
                            every_ms,
                        )
                    except ImportError:
                        raise  # library absent: fail fast, don't mask
                    except Exception:
                        frames = []  # corrupt payload → no frames
                for i, blob in frames:
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(blob)
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, FRAMES)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + (i % 7) * 128)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                640 if kind == "image" else None,
                480 if kind == "image" else None,
                (i % 5 + 1) * 2000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA)
