"""Pure-NumPy image codecs: 24-bit uncompressed BMP and binary PPM (P6).

No third-party codec libraries exist in this environment, so the
multimodal decode path implements the two classic uncompressed formats
directly from their public specifications — enough to make the Spark-side
decode -> feature pipeline real end-to-end (JPEG/PNG still require
external codecs and raise with a clear message).

Formats:
- BMP: BITMAPFILEHEADER (14 bytes, 'BM' magic, pixel offset at byte 10)
  + BITMAPINFOHEADER (width/height/bpp/compression), 24 bpp, BI_RGB
  (uncompressed), rows stored bottom-up, BGR byte order, each row padded
  to a 4-byte boundary.
- PPM: 'P6' magic, ASCII header (width height maxval, '#' comments),
  single whitespace, then raw RGB bytes, maxval <= 255.

Both decoders return (h, w, 3) uint8 RGB arrays; the encoders exist so
tests can round-trip byte-exactly without fixtures on disk.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + pixel_bytes, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up, BGR
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed (BI_RGB) BMP supported; "
            f"got bpp={bpp} compression={compression}")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * h, offset=offset)
    rows = data.reshape(h, row_size)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Parse n ASCII integer tokens after the magic, honoring '#' comments.

    Returns (values, offset of the first raster byte).
    """
    vals: list[int] = []
    i = 2  # skip 'P6'
    cur = b""
    while len(vals) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[i:i + 1]
        if ch == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
        elif ch in b" \t\r\n":
            if cur:
                vals.append(int(cur))
                cur = b""
        else:
            cur += ch
        i += 1
    return vals, i


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload (missing 'P6' magic)")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval > 255:
        raise ValueError(f"16-bit PPM (maxval={maxval}) not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=off)
    return data.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# dispatch + features
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from BMP or PPM bytes, by magic sniffing."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise ValueError(
        "unsupported image format (no external codecs in this "
        "environment): expected BMP ('BM') or binary PPM ('P6'), got "
        f"magic {payload[:2]!r}")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index sampling, deterministic)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def image_feature(payload: bytes, dim: int = 64) -> np.ndarray:
    """Unit-norm float32 feature: decode -> s x s grayscale tile ->

    flatten (s = sqrt(dim), dim a perfect square). A deterministic,
    codec-free stand-in for a learned embedding with the same contract
    (fixed dim, unit norm) — feeds the ANN / embedding-dedup operators.
    """
    s = int(round(dim ** 0.5))
    if s * s != dim:
        raise ValueError(f"dim must be a perfect square, got {dim}")
    img = decode_image(payload)
    gray = resize_nearest(img, s, s).astype(np.float64).mean(axis=2)
    v = gray.ravel()
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)
