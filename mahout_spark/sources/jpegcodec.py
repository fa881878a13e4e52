"""Pure-NumPy baseline JPEG codec (stdlib only — no external codecs).

Closes the last documented multimodal decode stub: `decode_jpeg` handles
baseline sequential DCT JPEGs (SOF0, 8-bit, 1 or 3 components, 4:4:4 /
4:2:2 / 4:2:0 chroma subsampling, restart markers), and `encode_jpeg`
produces fixtures/output (4:4:4 or 4:2:0, per-image optimal Huffman
tables). The codec is SELF-CONSISTENT by construction: quantization and
Huffman tables are read from the file's own DQT/DHT segments, never
assumed, so any spec-conformant baseline JPEG decodes — including ones
our encoder didn't produce.

Reference anchors (studied, not copied): the reference repo ships no
image codecs at all (the builder brief asks for multimodal columns);
format layout follows the public ITU-T T.81 baseline process — marker
segments (SOI/DQT/SOF0/DHT/SOS/EOI), zigzag order, DC-prediction +
(run, size) AC coding, canonical Huffman from (BITS, HUFFVAL),
0xFF00 byte stuffing, level shift ±128, BT.601 YCbCr.

Everything is deterministic; the DCT is an exact 8x8 orthonormal matrix
product (no libjpeg fast-path approximations), so decode(encode(x)) is
bounded only by quantization loss (tested via PSNR).
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------------------
# shared math
# ---------------------------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5  # orthonormal: C @ C.T = I


_C = _dct_matrix()


def _zigzag_order() -> np.ndarray:
    """Indices mapping zigzag position -> (row-major) block position."""
    order = sorted(((u + v, v if (u + v) % 2 == 0 else u, u, v)
                    for u in range(8) for v in range(8)))
    return np.array([u * 8 + v for _, _, u, v in order])


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Frequency-weighted table scaled by an IJG-style quality knob.
    (Synthetic base table — valid because DQT carries it in the file.)"""
    quality = min(max(int(quality), 1), 100)  # IJG clamps; q<=0 would /0
    u, v = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    base = 8.0 + (u + v) * (6.0 if chroma else 4.0)
    base[0, 0] = 6.0 if chroma else 4.0
    scale = (5000.0 / quality if quality < 50 else 200.0 - 2 * quality) / 100
    return np.clip(np.round(base * scale), 1, 255).astype(np.int32)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    out = img.astype(np.float64) @ m.T
    out[..., 1:] += 128.0
    return out


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0,
                   255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H/8 * W/8, 8, 8) row-major blocks of an 8-aligned plane."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")


def _bit_size(v: np.ndarray | int) -> np.ndarray:
    """JPEG magnitude category: bits needed for |v| (0 -> 0)."""
    a = np.abs(v)
    return np.where(a == 0, 0,
                    np.floor(np.log2(np.maximum(a, 1))).astype(int) + 1)


# ---------------------------------------------------------------------------
# Huffman (canonical, <=16-bit, encoder-built / DHT-parsed)
# ---------------------------------------------------------------------------


_HUFF_DUMMY = 256  # outside the 0-255 JPEG symbol space


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length, max 16 (the classic BITS-adjustment).

    A frequency-0 dummy symbol (libjpeg's 256th-symbol trick, T.81
    Annex K) is merged in first, lands at max depth, sorts last in
    canonical (length, symbol) order and therefore owns the all-ones
    codeword; it is dropped before return, so the emitted (slightly
    incomplete) table never assigns all-1s to a real symbol and the
    1-bit entropy-tail padding can never form a valid code."""
    if not freqs:
        return {}
    freqs = dict(freqs)
    freqs[_HUFF_DUMMY] = 0
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    tick = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    bits = [0] * (max(depth.values()) + 1)
    for s in depth:
        bits[depth[s]] += 1
    # enforce <=16: repeatedly move a pair from an over-long level up
    while len(bits) > 17:
        top = len(bits) - 1
        while bits[top] > 0:
            j = top - 2
            while bits[j] == 0:
                j -= 1
            bits[top] -= 2
            bits[top - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        bits.pop()
    order = sorted(freqs, key=lambda s: (depth[s], s))
    lengths, i = {}, 0
    for ln in range(1, len(bits)):
        for _ in range(bits[ln]):
            lengths[order[i]] = ln
            i += 1
    lengths.pop(_HUFF_DUMMY, None)
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length); canonical order (length, symbol)."""
    codes, code, prev = {}, 0, 0
    for s, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= (ln - prev)
        codes[s] = (code, ln)
        code += 1
        prev = ln
    return codes


def _dht_payload(table_class: int, table_id: int,
                 lengths: dict[int, int]) -> bytes:
    counts = [0] * 17
    for ln in lengths.values():
        counts[ln] += 1
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    return (bytes([table_class << 4 | table_id]) + bytes(counts[1:])
            + bytes(syms))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            m = d[self.pos] if self.pos < len(d) else 0xD9
            if m == 0x00:
                self.pos += 1
            elif 0xD0 <= m <= 0xD7:  # restart marker mid-fill
                raise ValueError("unexpected restart marker inside fill")
            else:
                # reached the next real marker (e.g. EOI) — pad with 1s
                self.pos -= 1
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self) -> None:
        """Drop pad bits and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


class _HuffDecoder:
    """Canonical (BITS, HUFFVAL) decode via per-length code windows."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.min_code, self.max_code, self.val_ptr = {}, {}, {}
        self.symbols = symbols
        code, k = 0, 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bits(1)
            mx = self.max_code.get(ln)
            if mx is not None and code <= mx:
                return self.symbols[self.val_ptr[ln]
                                    + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code in JPEG stream")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_value(v: int) -> tuple[int, int]:
    """(size, size-bit amplitude) per T.81 F.1.2.1."""
    size = int(_bit_size(v))
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _component_symbols(qblocks: np.ndarray) -> tuple[list, list, list]:
    """Per-block (dc_sym, dc_amp), [(ac_sym, ac_amp, ac_size)] streams."""
    dc_stream, ac_stream = [], []
    prev = 0
    for blk in qblocks:
        zz = blk.ravel()[_ZZ]
        diff = int(zz[0]) - prev
        prev = int(zz[0])
        dc_stream.append(_encode_value(diff))
        acs = []
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                acs.append((0xF0, 0, 0))
                run -= 16
            size, amp = _encode_value(v)
            acs.append(((run << 4) | size, amp, size))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))  # EOB
        ac_stream.append(acs)
    return dc_stream, ac_stream, prev


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JPEG bytes (4:4:4, or 4:2:0 with
    ``subsample=True``). Per-image optimal Huffman tables, all tables
    written into DQT/DHT."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 RGB")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img)
    qt = [_quant_table(quality, False), _quant_table(quality, True)]

    hs = 2 if subsample else 1
    planes, plane_q = [], []
    mh, mw = -(-h // (8 * hs)) * 8 * hs, -(-w // (8 * hs)) * 8 * hs
    y = _pad_to(ycc[..., 0], mh, mw)
    planes.append(y)
    plane_q.append(0)
    for c in (1, 2):
        p = _pad_to(ycc[..., c], mh, mw)
        if subsample:
            p = p.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3))
        planes.append(p)
        plane_q.append(1)

    comp_blocks = []
    for p, qi in zip(planes, plane_q):
        bl = _blocks(p - 128.0)
        coef = np.einsum("ij,bjk,lk->bil", _C, bl, _C)
        comp_blocks.append(
            np.round(coef / qt[qi][None]).astype(np.int32))

    # interleaved MCU order
    mcu_rows, mcu_cols = mh // (8 * hs), mw // (8 * hs)
    per_comp_streams = [_component_symbols(_mcu_order(b, hs if i == 0
                                                      else 1, mcu_rows,
                                                      mcu_cols))
                        for i, b in enumerate(comp_blocks)]

    dc_freq = [{}, {}]
    ac_freq = [{}, {}]
    for i, (dcs, acs, _) in enumerate(per_comp_streams):
        t = 0 if i == 0 else 1
        for size, _amp in dcs:
            dc_freq[t][size] = dc_freq[t].get(size, 0) + 1
        for blk in acs:
            for sym, _a, _s in blk:
                ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
    dc_codes = [_canonical_codes(_huffman_lengths(f)) for f in dc_freq]
    ac_codes = [_canonical_codes(_huffman_lengths(f)) for f in ac_freq]

    bw = _BitWriter()
    n_mcus = mcu_rows * mcu_cols
    y_per_mcu = hs * hs
    for m in range(n_mcus):
        for ci in range(3):
            t = 0 if ci == 0 else 1
            k = y_per_mcu if ci == 0 else 1
            dcs, acs, _ = per_comp_streams[ci]
            for b in range(m * k, m * k + k):
                size, amp = dcs[b]
                code, ln = dc_codes[t][size]
                bw.write(code, ln)
                if size:
                    bw.write(amp, size)
                for sym, a, s in acs[b]:
                    code, ln = ac_codes[t][sym]
                    bw.write(code, ln)
                    if s:
                        bw.write(a, s)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2,
                                                                   "big") \
            + payload

    out = bytearray(b"\xff\xd8")
    for i, q in enumerate(qt):
        out += seg(0xDB, bytes([i]) + bytes(q.ravel()[_ZZ].astype(
            np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3])
    sampling = [(hs, hs), (1, 1), (1, 1)]
    for ci in range(3):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, plane_q[ci]])
    out += seg(0xC0, sof)
    for t in range(2):
        out += seg(0xC4, _dht_payload(0, t, _huffman_lengths(dc_freq[t])))
        out += seg(0xC4, _dht_payload(1, t, _huffman_lengths(ac_freq[t])))
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _mcu_order(blocks: np.ndarray, s: int, mcu_rows: int,
               mcu_cols: int) -> np.ndarray:
    """Reorder row-major 8x8 blocks into interleaved-MCU block order."""
    if s == 1:
        return blocks
    b = blocks.reshape(mcu_rows, s, mcu_cols, s, 8, 8)
    return b.transpose(0, 2, 1, 3, 4, 5).reshape(-1, 8, 8)


def _mcu_unorder(blocks: np.ndarray, s: int, mcu_rows: int,
                 mcu_cols: int) -> np.ndarray:
    if s == 1:
        return blocks
    b = blocks.reshape(mcu_rows, mcu_cols, s, s, 8, 8)
    return b.transpose(0, 2, 1, 3, 4, 5).reshape(-1, 8, 8)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: size-bit amplitude -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports SOF0, 8-bit, 1 or 3 components, sampling factors 1-2,
    restart intervals. Progressive (SOF2) / arithmetic / 12-bit inputs
    raise ValueError naming the unsupported feature.
    """
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1  # spec-legal 0xFF fill bytes before the marker
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        ln = int.from_bytes(d[pos:pos + 2], "big")
        seg = d[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec:
                    raise ValueError("16-bit DQT not supported")
                tbl = np.zeros(64, np.int32)
                tbl[_ZZ] = np.frombuffer(seg[p + 1:p + 65], np.uint8)
                qt[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                syms = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(counts, syms)
                p += 17 + n
        elif marker == 0xC0:
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}) — "
                "only baseline sequential (SOF0) is implemented")
        elif marker == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_tabs = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(d, pos + ln, frame, qt, huff, scan_tabs,
                                restart)
        pos += ln
    raise ValueError("no scan data found (missing SOS)")


def _decode_scan(d, pos, frame, qt, huff, scan_tabs, restart):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcu_cols, mcu_rows = -(-w // mcu_w), -(-h // mcu_h)
    br = _BitReader(d, pos)
    coef = {c["id"]: [] for c in comps}
    pred = {c["id"]: 0 for c in comps}
    n_mcus = mcu_rows * mcu_cols
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            br.align_restart()
            pred = {c["id"]: 0 for c in comps}
        for c in comps:
            tdc, tac = scan_tabs[c["id"]]
            dct = huff[(0, tdc)]
            act = huff[(1, tac)]
            for _ in range(c["h"] * c["v"]):
                zz = np.zeros(64, np.int32)
                size = dct.decode(br)
                diff = _extend(br.bits(size), size) if size else 0
                pred[c["id"]] += diff
                zz[0] = pred[c["id"]]
                k = 1
                while k < 64:
                    sym = act.decode(br)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += sym >> 4
                    size = sym & 0xF
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef[c["id"]].append(zz)

    rgb_planes = []
    for c in comps:
        blocks = np.stack(coef[c["id"]]).astype(np.float64)
        blocks = blocks[:, _UNZZ].reshape(-1, 8, 8)
        blocks *= qt[c["tq"]][None]
        pix = np.einsum("ji,bjk,kl->bil", _C, blocks, _C) + 128.0
        s_h, s_v = c["h"], c["v"]
        # component plane is (mcu_rows*s_v x 8, mcu_cols*s_h x 8) in
        # interleaved order
        ordered = _mcu_unorder_hv(pix, s_h, s_v, mcu_rows, mcu_cols)
        plane = _unblocks(ordered, mcu_rows * s_v * 8, mcu_cols * s_h * 8)
        # upsample to full MCU grid then crop
        plane = np.repeat(np.repeat(plane, vmax // s_v, axis=0),
                          hmax // s_h, axis=1)
        rgb_planes.append(plane[:h, :w])
    if len(rgb_planes) == 1:
        y = np.clip(rgb_planes[0] + 0.5, 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(*rgb_planes)


def _mcu_unorder_hv(blocks, s_h, s_v, mcu_rows, mcu_cols):
    if s_h == 1 and s_v == 1:
        return blocks
    b = blocks.reshape(mcu_rows, mcu_cols, s_v, s_h, 8, 8)
    return b.transpose(0, 2, 1, 3, 4, 5).reshape(-1, 8, 8)
