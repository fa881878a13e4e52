"""Pure-NumPy audio/video codecs: PCM WAV and MJPEG-in-AVI.

With baseline JPEG implemented (sources/jpegcodec.py), the classic
uncompressed container formats become decodable stdlib-only, making the
multimodal audio/video paths REAL end-to-end:

- WAV (RIFF/WAVE): 'fmt ' (PCM 8/16-bit, any rate/channels) + 'data'
  → (n_samples, channels) float64 in [-1, 1). Encoder for fixtures.
- AVI (RIFF/'AVI '): generic recursive chunk walk collecting '..dc' /
  '..db' video payloads that carry JPEG magic → frame-sampled decode
  through decode_jpeg. Encoder writes a minimal RIFF('AVI ',
  LIST('movi', 00dc…)) fixture the same walk reads.

Reference anchors (studied, not copied): the reference repo ships no
media codecs (builder brief asks for multimodal columns); layouts follow
the public RIFF/WAVE/AVI specifications.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "audio_feature",
           "encode_mjpeg_avi", "iter_avi_video_chunks",
           "decode_avi_frames"]


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float samples in [-1, 1) (n,) or (n, channels) -> 16-bit PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2")
    n, ch = pcm.shape
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n, channels) float64 in [-1, 1))."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag != 1:
                raise ValueError(f"non-PCM WAV (format tag {tag}) "
                                 "not supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(data, np.uint8).astype(np.float64)
               - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported (8/16 only)")
    n = len(arr) // channels
    return rate, arr[:n * channels].reshape(n, channels)


def audio_feature(payload: bytes, dim: int = 64) -> np.ndarray:
    """REAL audio feature: decode WAV, split into ``dim/2`` frames, emit
    per-frame (RMS energy, zero-crossing rate) interleaved — a classic
    lightweight descriptor, deterministic, codec-free."""
    _, samples = decode_wav(payload)
    mono = samples.mean(axis=1)
    n_frames = max(1, dim // 2)
    frames = np.array_split(mono, n_frames)
    feat = np.zeros(2 * n_frames)
    for i, f in enumerate(frames):
        if len(f):
            feat[2 * i] = np.sqrt(np.mean(f * f))
            feat[2 * i + 1] = np.mean(np.abs(np.diff(np.signbit(f))))
    out = np.zeros(dim, dtype=np.float32)
    out[:len(feat)] = feat[:dim]
    return out


# ---------------------------------------------------------------------------
# AVI (MJPEG)
# ---------------------------------------------------------------------------


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """(h, w, 3) uint8 frames -> minimal MJPEG AVI fixture."""
    from mahout_spark.sources.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    movi = bytearray(b"movi")
    for fr in frames:
        blob = encode_jpeg(np.asarray(fr, np.uint8), quality=quality)
        movi += b"00dc" + struct.pack("<I", len(blob)) + blob
        if len(blob) & 1:
            movi += b"\x00"
    avih = struct.pack("<14I", 10 ** 6 // fps, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl = bytearray(b"hdrl" + b"avih"
                     + struct.pack("<I", len(avih)) + avih)
    body = (b"AVI "
            + b"LIST" + struct.pack("<I", len(hdrl)) + bytes(hdrl)
            + b"LIST" + struct.pack("<I", len(movi)) + bytes(movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_avi_video_chunks(payload: bytes):
    """Yield raw video-stream chunk payloads ('..dc'/'..db') from an AVI
    via a generic recursive RIFF walk (handles nested LISTs)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            start = pos + 8
            if cid in (b"RIFF", b"LIST"):
                yield from walk(buf, start + 4, start + size)
            elif cid[2:4] in (b"dc", b"db"):
                yield buf[start:start + size]
            pos = start + size + (size & 1)

    yield from walk(payload, 8 + 4, 8 + struct.unpack(
        "<I", payload[4:8])[0])


def decode_avi_frames(payload: bytes, every_n: int = 1
                      ) -> list[tuple[int, np.ndarray]]:
    """[(frame_idx, (h, w, 3) uint8)] — every ``every_n``-th MJPEG frame.

    Non-JPEG video chunks (other FourCCs) raise ValueError naming the
    limitation; audio chunks are skipped by the chunk filter."""
    from mahout_spark.sources.jpegcodec import decode_jpeg

    out = []
    for i, chunk in enumerate(iter_avi_video_chunks(payload)):
        if i % every_n:
            continue
        if chunk[:2] != b"\xff\xd8":
            raise ValueError(
                "non-MJPEG video stream (frame lacks JPEG magic) — "
                "only MJPEG AVI is decodable without external codecs")
        out.append((i, decode_jpeg(chunk)))
    return out
