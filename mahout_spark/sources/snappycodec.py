"""Pure-Python Snappy codec + Hadoop block framing — no native libs.

Lifts the last stdlib-codec exclusion in ``sources/seqfile.py``: Hadoop
SequenceFiles written with ``org.apache.hadoop.io.compress.SnappyCodec``
can now be read and written without Hadoop or python-snappy.

Two layers, both from public specifications (nothing in the reference —
jalhajj/mahout delegates compression entirely to Hadoop's codec factory,
e.g. SequenceFile.createWriter callers in mr/):

1. Raw Snappy block format (google/snappy ``format_description.txt``):
   a little-endian varint preamble with the uncompressed length, then
   tagged elements — literals (tag&3 == 0) and copies with 1/2/4-byte
   offsets (tag&3 == 1/2/3). The compressor mirrors the reference
   library's shape: greedy 4-byte hash matching inside 64 KiB fragments
   (so every offset fits the 2-byte form) — NOT a port, just the same
   published algorithm family; correctness is round-trip + hand-built
   golden streams, not byte-parity with libsnappy (any valid encoding
   decompresses identically by construction of the format).

2. Hadoop ``BlockCompressorStream`` framing (hadoop-common
   ``o.a.h.io.compress.BlockCompressorStream``): per input chunk of
   ``buffer_size`` bytes, a 4-byte big-endian uncompressed length, then
   one or more (4-byte BE compressed length, raw-snappy piece) until the
   chunk is covered. SequenceFile record/block sections hold exactly
   this stream for block-style codecs like Snappy.

Scale note: this codec runs inside the per-file ``mapInPandas`` ingest
path (one Python call per file section), never per row; the 100-TB
posture is unchanged — SequenceFile ingest parallelism is per part-file.
"""

from __future__ import annotations

import struct

_MAX_OFFSET_2B = 65535
_FRAGMENT = 65536  # match window per fragment keeps offsets <= 65535


# -- varint (little-endian base-128, snappy preamble) --------------------------


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


# -- raw snappy ----------------------------------------------------------------


def _emit_literal(out: bytearray, lit: memoryview) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += struct.pack("<H", n)
    elif n < (1 << 24):
        out.append(62 << 2)
        out += struct.pack("<I", n)[:3]
    else:
        out.append(63 << 2)
        out += struct.pack("<I", n)
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # chunk so every op is 4..64 bytes (leave >=4 for the remainder)
    while length > 0:
        op = 64 if length >= 68 or length == 64 else min(length, 60)
        if 4 <= op <= 11 and offset < 2048:
            out.append(0x01 | ((op - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        else:
            out.append(0x02 | ((op - 1) << 2))
            out += struct.pack("<H", offset)
        length -= op


def compress_raw(data: bytes) -> bytes:
    """Raw snappy block: varint length + greedy literal/copy elements."""
    out = bytearray(_write_uvarint(len(data)))
    view = memoryview(data)
    for frag_start in range(0, len(data), _FRAGMENT):
        frag_end = min(frag_start + _FRAGMENT, len(data))
        table: dict[bytes, int] = {}
        i = s = frag_start
        limit = frag_end - 3
        while i < limit:
            key = bytes(view[i:i + 4])
            cand = table.get(key)
            table[key] = i
            if cand is None or i - cand > _MAX_OFFSET_2B:
                i += 1
                continue
            j, k = i + 4, cand + 4
            while j < frag_end and data[j] == data[k]:
                j += 1
                k += 1
            if i > s:
                _emit_literal(out, view[s:i])
            _emit_copy(out, i - cand, j - i)
            i = s = j
        if frag_end > s:
            _emit_literal(out, view[s:frag_end])
    return bytes(out)


def decompress_raw(data: bytes) -> bytes:
    """Decode any valid raw snappy stream (spec-complete, incl. 4-byte
    offsets and overlapping copies)."""
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if offset >= ln:
            start = len(out) - offset
            out += out[start:start + ln]
        else:  # overlapping copy: repeat the tail
            start = len(out) - offset
            for idx in range(ln):
                out.append(out[start + idx])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {expected}")
    return bytes(out)


# -- Hadoop BlockCompressorStream framing ---------------------------------------


def hadoop_snappy_compress(data: bytes,
                           buffer_size: int = 256 * 1024) -> bytes:
    """BlockCompressorStream layout: per <=buffer_size input chunk,
    uint32-BE uncompressed length + (uint32-BE piece length, piece)."""
    out = bytearray()
    if not data:
        return bytes(out)
    for start in range(0, len(data), buffer_size):
        chunk = data[start:start + buffer_size]
        piece = compress_raw(chunk)
        out += struct.pack(">I", len(chunk))
        out += struct.pack(">I", len(piece))
        out += piece
    return bytes(out)


def hadoop_snappy_decompress(data: bytes) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("snappy: truncated hadoop chunk header")
        ulen = struct.unpack_from(">I", data, pos)[0]
        pos += 4
        got = 0
        while got < ulen:
            if pos + 4 > n:
                raise ValueError("snappy: truncated hadoop piece header")
            clen = struct.unpack_from(">I", data, pos)[0]
            pos += 4
            if pos + clen > n:
                raise ValueError("snappy: truncated hadoop piece")
            piece = decompress_raw(data[pos:pos + clen])
            pos += clen
            out += piece
            got += len(piece)
        if got != ulen:
            raise ValueError("snappy: hadoop chunk length mismatch")
    return bytes(out)
