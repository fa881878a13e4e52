"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video alongside text.
The engine treats media as ``binary`` columns with typed metadata and runs
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages — the same executor-kernel shape as the sketch
builds, so partitioning, salting, and checkpointing all apply unchanged.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is pluggable: ``decoder='real'`` raises NotImplementedError
with the integration point documented, ``decoder='fake'`` is a
deterministic stand-in (content-hash-seeded) that keeps every piece of
Spark-side plumbing — schema, batch shapes, UDF signatures, downstream
ANN/dedup compatibility — real and testable. Swap ``_REGISTRY['image']``
for a real decoder on a cluster with codecs installed; nothing else
changes.

Media table convention::

    media(media_id long, kind string, payload binary,
          meta map<string,string>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta map<string,string>")


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-decode: content-hash-seeded unit vector.

    Stands in for (e.g.) a CLIP image embedding; same payload -> same
    vector on every executor, every retry, every cluster size.
    """
    import hashlib

    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _image_decode(payload: bytes, dim: int) -> np.ndarray:
    """REAL decode for BMP/PPM/PNG payloads (pure-NumPy codecs, PNG via

    stdlib zlib — sources/imagecodec.py): decode -> grayscale tile
    feature. Formats needing external codecs (JPEG/video) raise
    ValueError with the supported list.
    """
    from mahout_spark.sources.imagecodec import image_feature

    return image_feature(payload, dim)


def _real_decode(payload: bytes, dim: int) -> np.ndarray:
    """Codec-library integration point. BMP/PPM/PNG and both JPEG

    processes (baseline SOF0 + progressive SOF2) ARE implemented
    pure-NumPy (decoder='image'); this slot is for media that need
    external libraries (video/audio via ffmpeg, 12-bit/lossless JPEG
    via libjpeg) absent from this container.
    """
    raise NotImplementedError(
        "external media codecs are not installed in this environment; "
        "implemented pure-NumPy: decoder='image' (BMP/PPM/PNG/JPEG "
        "baseline+progressive), decoder='audio' (PCM WAV), sample_frames(decoder="
        "'mjpeg') (MJPEG AVI). This slot is for compressed formats "
        "that genuinely need ffmpeg/libav (H.264, AAC, MP3, ...): plug "
        "a decoder into mahout_spark.sources.multimodal._REGISTRY")


def _audio_decode(payload: bytes, dim: int) -> np.ndarray:
    """REAL decode for PCM WAV payloads (sources/avcodec.py): decode ->
    per-frame (RMS energy, zero-crossing rate) descriptor."""
    from mahout_spark.sources.avcodec import audio_feature

    return audio_feature(payload, dim)


_REGISTRY = {"fake": _fake_decode, "image": _image_decode,
             "audio": _audio_decode, "real": _real_decode}


def extract_features(media: DataFrame, dim: int = 64,
                     decoder: str = "fake",
                     payload_col: str = "payload") -> DataFrame:
    """media rows -> (original cols minus payload, feature array<float>).

    One Arrow batch in, one out; payload bytes never leave the executor.
    Output feeds the ANN / embedding-dedup operators directly.
    """
    fn = _REGISTRY[decoder]
    keep = [f for f in media.schema.fields if f.name != payload_col]
    schema = ", ".join([f"{f.name} {f.dataType.simpleString()}"
                        for f in keep] + ["feature array<float>"])
    names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [fn(bytes(p), dim) for p in pdf[payload_col]]
            out = pdf[names].copy()
            out["feature"] = feats
            yield out

    return media.mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_n: int = 10,
                  decoder: str = "fake",
                  payload_col: str = "payload") -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx,

    frame binary). UDTF shape: one row in, many out via mapInPandas.
    The fake decoder derives a deterministic frame count from the payload
    and slices payload bytes as stand-in frames.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                if decoder == "mjpeg":
                    # REAL path: every_n-th video chunk of an MJPEG AVI,
                    # emitted as standalone JPEG bytes (decode_image-
                    # ready downstream)
                    from mahout_spark.sources.avcodec import \
                        iter_avi_video_chunks

                    for i, chunk in enumerate(iter_avi_video_chunks(b)):
                        if i % every_n == 0:
                            rows.append((mid, i, chunk))
                    continue
                if decoder == "real":
                    _real_decode(b, 0)
                n_frames = max(1, len(b) // 64)
                for i in range(0, n_frames, every_n):
                    rows.append((mid, i, b[i * 64:(i + 1) * 64]))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                                  "frame"])

    return media.mapInPandas(run,
                             schema="media_id long, frame_idx int, "
                                    "frame binary")


def fake_media_table(spark, n: int = 100, seed: int = 5,
                     kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        size = int(rng.integers(256, 2048))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload),
                     {"w": str(int(rng.integers(64, 1024))),
                      "h": str(int(rng.integers(64, 1024)))}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
