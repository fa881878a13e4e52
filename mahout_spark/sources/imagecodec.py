"""Pure-NumPy image codecs: 24-bit BMP, binary PPM (P6), PNG (stdlib
zlib) and — via sources/jpegcodec — baseline JPEG.

No third-party codec libraries exist in this environment, so the
multimodal decode path implements these formats directly from their
public specifications, making the Spark-side decode -> feature pipeline
real end-to-end for all four mainstream still-image formats (video/audio
remain an external-library integration point).

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
import zlib

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
    """(h, w, 3) uint8 RGB from BMP, PPM, PNG or baseline JPEG bytes
    (magic sniff)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from mahout_spark.sources.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(
        "unsupported image format (no external codecs in this "
        "environment): expected BMP ('BM'), binary PPM ('P6'), PNG or "
        f"baseline JPEG, got magic {payload[:2]!r}")


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


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + NumPy filter undo)
# ---------------------------------------------------------------------------
#
# Public spec (RFC 2083 / W3C PNG): 8-byte signature, length-prefixed
# chunks (IHDR, PLTE, IDAT+, IEND), IDAT = zlib stream of scanlines, each
# scanline = 1 filter byte + w*bpp filtered bytes; filters 0..4 = None,
# Sub, Up, Average, Paeth. Supported here: bit depth 8, color types 0
# (gray), 2 (RGB), 3 (palette), 6 (RGBA; alpha dropped), non-interlaced.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filter_type: int = 0,
               level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> color-type-2 PNG bytes. ``filter_type``

    applies that scanline filter to every row (0/1/2/3/4) so decoder
    tests exercise each undo path."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bpp = 3
    rows = img.reshape(h, w * 3).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * 3, dtype=np.int16)
    for y in range(h):
        cur = rows[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:   # Sub
            a = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - a
        elif filter_type == 2:   # Up
            filt = cur - prev
        elif filter_type == 3:   # Average
            a = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - (a + prev) // 2
        elif filter_type == 4:   # Paeth
            a = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            ca = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
            filt = cur - _paeth(a, prev, ca)
        else:
            raise ValueError(f"bad filter {filter_type}")
        out.append(filter_type)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    idat = zlib.compress(bytes(out), level)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (int16 in/out)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.int16)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (pure zlib + NumPy)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    idat = bytearray()
    plte = None
    ihdr = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} interlace={interlace}); "
            "only 8-bit non-interlaced supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    bpp = channels
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = ftypes[y]
        cur = raw[y, 1:].astype(np.int16)
        if ft == 0:
            rec = cur
        elif ft == 2:    # Up
            rec = (cur + prev) % 256
        elif ft in (1, 3, 4):   # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, bpp)
    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    return plte[px[:, :, 0]].copy()
