"""Pure-NumPy baseline JPEG codec (stdlib only — no external codecs).

Closes the last documented multimodal decode stub: `decode_jpeg` handles
both DCT processes — baseline sequential (SOF0) and progressive (SOF2,
spectral selection + successive approximation) — for 8-bit, 1 or 3
components, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers;
`encode_jpeg` produces fixtures/output (4:4:4 or 4:2:0, per-image
optimal Huffman tables, baseline or a progressive scan script whose
decode equals the baseline bit-for-bit). The codec is SELF-CONSISTENT by construction: quantization and
Huffman tables are read from the file's own DQT/DHT segments, never
assumed, so any spec-conformant baseline JPEG decodes — including ones
our encoder didn't produce.

Reference anchors (studied, not copied): the reference repo ships no
image codecs at all (the builder brief asks for multimodal columns);
format layout follows the public ITU-T T.81 processes — marker
segments (SOI/DQT/SOF0|SOF2/DHT/SOS/EOI), zigzag order, DC-prediction +
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
                subsample: bool = False,
                progressive: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> JPEG bytes (4:4:4, or 4:2:0 with
    ``subsample=True``). Per-image optimal Huffman tables, all tables
    written into DQT/DHT. ``progressive=True`` emits SOF2 with a
    spectral-selection + successive-approximation scan script; the
    quantized coefficients sent are identical to the baseline path, so
    decode(progressive) == decode(baseline) exactly (pytest-pinned)."""
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
    if progressive:
        return _encode_progressive(h, w, qt, plane_q, comp_blocks, hs,
                                   mcu_rows, mcu_cols)
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
    """JPEG bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports baseline (SOF0) and progressive (SOF2) DCT processes,
    8-bit, 1 or 3 components, sampling factors 1-2, restart intervals.
    Arithmetic-coded / hierarchical / lossless / 12-bit inputs raise
    ValueError naming the unsupported feature.
    """
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart = 0
    progressive = False
    prog = None  # per-component coefficient grids (progressive only)
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
        elif marker in (0xC0, 0xC2):
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
            if progressive:
                prog = _ProgressiveState(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}) — "
                "baseline sequential (SOF0) and progressive (SOF2) are "
                "implemented")
        elif marker == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            scan_comps = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cid] = (tt >> 4, tt & 0xF)
                scan_comps.append(cid)
            if not progressive:
                return _decode_scan(d, pos + ln, frame, qt, huff,
                                    scan_tabs, restart)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = prog.decode_scan(d, pos + ln, huff, scan_comps,
                                   scan_tabs, ss, se, ahal >> 4,
                                   ahal & 0xF, restart)
            continue
        pos += ln
    if progressive and prog is not None and prog.saw_scan:
        return prog.reconstruct(qt)
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


# ---------------------------------------------------------------------------
# progressive (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------


class _ProgressiveState:
    """SOF2 decode state: per-component zigzag coefficient grids filled
    across scans (T.81 G.2). DC scans may be interleaved; AC scans are
    single-component over the component's TRUE block grid (ceil(dim/8)
    from the frame dims, not the MCU-padded grid). The AC refinement
    walk follows the spec's decode procedure (figure G.7): r counts
    zero-HISTORY positions only, correction bits are consumed at every
    nonzero-history position passed, and an EOB run corrects the rest
    of the band."""

    def __init__(self, frame):
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcu_cols = -(-w // (8 * self.hmax))
        self.mcu_rows = -(-h // (8 * self.vmax))
        self.by_id = {c["id"]: c for c in comps}
        self.grids = {}
        self.true_dims = {}
        for c in comps:
            bv, bh = self.mcu_rows * c["v"], self.mcu_cols * c["h"]
            self.grids[c["id"]] = np.zeros((bv, bh, 64), np.int32)
            ch = -(-h * c["v"] // self.vmax)
            cw = -(-w * c["h"] // self.hmax)
            self.true_dims[c["id"]] = (-(-ch // 8), -(-cw // 8))
        self.saw_scan = False

    def decode_scan(self, d, pos, huff, scan_comps, scan_tabs,
                    ss, se, ah, al, restart) -> int:
        """Consume one scan's entropy data; return the stream position of
        the next marker."""
        self.saw_scan = True
        br = _BitReader(d, pos)
        if len(scan_comps) > 1:
            if ss != 0 or se != 0:
                raise ValueError(
                    "interleaved progressive scan must be DC-only")
            self._dc_interleaved(br, huff, scan_comps, scan_tabs, ah, al,
                                 restart)
        elif ss == 0:
            self._dc_single(br, huff, scan_comps[0],
                            scan_tabs[scan_comps[0]], ah, al, restart)
        else:
            self._ac_scan(br, huff, scan_comps[0],
                          scan_tabs[scan_comps[0]], ss, se, ah, al,
                          restart)
        p, n = br.pos, len(d)
        while p + 1 < n:
            if (d[p] == 0xFF and d[p + 1] != 0x00
                    and not 0xD0 <= d[p + 1] <= 0xD7):
                return p
            p += 1
        return n

    # -- DC band ---------------------------------------------------------
    def _dc_interleaved(self, br, huff, scan_comps, scan_tabs, ah, al,
                        restart):
        comps = [self.by_id[cid] for cid in scan_comps]
        pred = {cid: 0 for cid in scan_comps}
        for m in range(self.mcu_rows * self.mcu_cols):
            if restart and m and m % restart == 0:
                br.align_restart()
                pred = {cid: 0 for cid in scan_comps}
            r, c0 = divmod(m, self.mcu_cols)
            for comp in comps:
                cid = comp["id"]
                grid = self.grids[cid]
                for v in range(comp["v"]):
                    for u in range(comp["h"]):
                        zz = grid[r * comp["v"] + v, c0 * comp["h"] + u]
                        if ah == 0:
                            size = huff[(0, scan_tabs[cid][0])].decode(br)
                            pred[cid] += (_extend(br.bits(size), size)
                                          if size else 0)
                            zz[0] = pred[cid] << al
                        else:
                            zz[0] |= br.bits(1) << al

    def _dc_single(self, br, huff, cid, tabs, ah, al, restart):
        grid = self.grids[cid]
        rows, cols = self.true_dims[cid]
        pred, i = 0, 0
        for r in range(rows):
            for c in range(cols):
                if restart and i and i % restart == 0:
                    br.align_restart()
                    pred = 0
                i += 1
                zz = grid[r, c]
                if ah == 0:
                    size = huff[(0, tabs[0])].decode(br)
                    pred += _extend(br.bits(size), size) if size else 0
                    zz[0] = pred << al
                else:
                    zz[0] |= br.bits(1) << al

    # -- AC band ---------------------------------------------------------
    def _ac_scan(self, br, huff, cid, tabs, ss, se, ah, al, restart):
        grid = self.grids[cid]
        rows, cols = self.true_dims[cid]
        act = huff[(1, tabs[1])]
        eobrun, i = 0, 0
        for r in range(rows):
            for c in range(cols):
                if restart and i and i % restart == 0:
                    br.align_restart()
                    eobrun = 0
                i += 1
                if ah == 0:
                    eobrun = self._ac_first(br, act, grid[r, c], ss, se,
                                            al, eobrun)
                else:
                    eobrun = self._ac_refine(br, act, grid[r, c], ss, se,
                                             al, eobrun)

    @staticmethod
    def _ac_first(br, act, zz, ss, se, al, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            sym = act.decode(br)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                return eobrun
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(br, act, zz, ss, se, al, eobrun):
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = act.decode(br)
                r, s = sym >> 4, sym & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break
                    # r == 15: ZRL — pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "invalid symbol in AC refinement scan")
                    val = p1 if br.bits(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        if br.bits(1) and (int(zz[k]) & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if br.bits(1) and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- reconstruction ---------------------------------------------------
    def reconstruct(self, qt) -> np.ndarray:
        h, w, comps = self.frame
        planes = []
        for comp in comps:
            grid = self.grids[comp["id"]]
            bv, bh = grid.shape[:2]
            blocks = grid.reshape(-1, 64)[:, _UNZZ].astype(np.float64)
            blocks = blocks.reshape(-1, 8, 8) * qt[comp["tq"]][None]
            pix = np.einsum("ji,bjk,kl->bil", _C, blocks, _C) + 128.0
            plane = _unblocks(pix, bv * 8, bh * 8)
            plane = np.repeat(
                np.repeat(plane, self.vmax // comp["v"], axis=0),
                self.hmax // comp["h"], axis=1)
            planes.append(plane[:h, :w])
        if len(planes) == 1:
            y = np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
            return np.stack([y, y, y], axis=-1)
        return _ycbcr_to_rgb(*planes)


# ---------------------------------------------------------------------------
# progressive encoder
# ---------------------------------------------------------------------------


def _ac_first_tokens(grid, rows, cols, ss, se, al):
    """AC first scan (Ah=0): run/size coding of sign*(|v|>>Al) with ZRL
    and a per-block EOB0 (eobrun accumulation is a size optimization the
    format does not require)."""
    toks, freq = [], {}

    def sym(s):
        freq[s] = freq.get(s, 0) + 1
        toks.append(("s", s))

    for r in range(rows):
        for c in range(cols):
            zz = grid[r, c]
            vals = [int(zz[k]) for k in range(ss, se + 1)]
            ts = [abs(v) >> al for v in vals]
            last = max((i for i, t in enumerate(ts) if t), default=-1)
            run = 0
            for i in range(last + 1):
                t = ts[i]
                if t == 0:
                    run += 1
                    continue
                while run >= 16:
                    sym(0xF0)
                    run -= 16
                size, amp = _encode_value(t if vals[i] > 0 else -t)
                sym((run << 4) | size)
                toks.append(("b", amp, size))
                run = 0
            if last < se - ss:
                sym(0x00)  # EOB0
    return freq, toks


def _ac_refine_tokens(grid, rows, cols, ss, se, al):
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    (run, 1)+sign, correction bits buffered for already-significant
    coefficients and flushed after each emitted symbol — the
    check-ZRL-before-buffer ordering keeps every flushed bit inside the
    decoder's walk for that symbol (T.81 figure G.7 discipline)."""
    toks, freq = [], {}

    def sym(s):
        freq[s] = freq.get(s, 0) + 1
        toks.append(("s", s))

    def flush(pending):
        for b in pending:
            toks.append(("b", b, 1))
        pending.clear()

    for r in range(rows):
        for c in range(cols):
            zz = grid[r, c]
            vals = [int(zz[k]) for k in range(ss, se + 1)]
            news = [i for i, v in enumerate(vals) if (abs(v) >> al) == 1]
            last_new = news[-1] if news else -1
            run, pending = 0, []
            for i, v in enumerate(vals):
                t = abs(v) >> al
                if i <= last_new:
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        sym(0xF0)
                        flush(pending)
                        run -= 16
                    if t > 1:  # already significant: one correction bit
                        pending.append(t & 1)
                        continue
                    sym((run << 4) | 1)  # newly significant
                    toks.append(("b", 1 if v > 0 else 0, 1))
                    flush(pending)
                    run = 0
                elif t > 1:  # trailing region: bits ride the EOB
                    pending.append(t & 1)
            if last_new < se - ss or pending:
                sym(0x00)
                flush(pending)
    return freq, toks


def _encode_progressive(h, w, qt, plane_q, comp_blocks, hs, mcu_rows,
                        mcu_cols):
    """SOF2 writer. Scan script (spec-legal, exercises every progressive
    decode path): (1) interleaved DC first scan at Al=1; (2) DC
    refinement to Al=0 (raw bits); per component and spectral band
    (1-5, 6-63): (3) AC first scan at Al=1, (4) AC refinement to Al=0.
    Every coefficient bit is eventually sent, so the decoded image
    equals the baseline encoding of the same input exactly."""
    sampling = [(hs, hs), (1, 1), (1, 1)]
    grids, trues = [], []
    for ci, blocks in enumerate(comp_blocks):
        sh, sv = sampling[ci]
        bv, bh = mcu_rows * sv, mcu_cols * sh
        grids.append(blocks.reshape(-1, 64)[:, _ZZ].reshape(bv, bh, 64))
        ch, cw = -(-h * sv // hs), -(-w * sh // hs)
        trues.append((-(-ch // 8), -(-cw // 8)))

    def seg(marker, payload):
        return bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    for i, q in enumerate(qt):
        out += seg(0xDB, bytes([i]) + bytes(q.ravel()[_ZZ].astype(
            np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3])
    for ci in range(3):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, plane_q[ci]])
    out += seg(0xC2, sof)

    def emit_scan(scan_comps, ss, se, ah, al, tables, toks):
        """tables: {(cls, tid): freq}; toks: ('s', sym) keyed to the
        scan's single class-1 table, or ('s2', tid, sym) for the
        two-table DC scan, or ('b', val, n)."""
        codes = {}
        for (cls, tid), freq in tables.items():
            lengths = _huffman_lengths(freq)
            out.extend(seg(0xC4, _dht_payload(cls, tid, lengths)))
            codes[(cls, tid)] = _canonical_codes(lengths)
        sos = bytes([len(scan_comps)])
        for cid, tab in scan_comps:
            sos += bytes([cid, tab])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(seg(0xDA, sos))
        bw = _BitWriter()
        for tok in toks:
            if tok[0] == "s":
                code, ln = codes[(1, 0)][tok[1]]
                bw.write(code, ln)
            elif tok[0] == "s2":
                code, ln = codes[(0, tok[1])][tok[2]]
                bw.write(code, ln)
            else:
                _, v, n = tok
                if n:
                    bw.write(v, n)
        out.extend(bw.flush())

    # scan 1: DC first, interleaved, Al=1 (arithmetic shift, T.81 G.1.2.1)
    toks, freqs = [], {(0, 0): {}, (0, 1): {}}
    pred = [0, 0, 0]
    for m in range(mcu_rows * mcu_cols):
        r, c = divmod(m, mcu_cols)
        for ci in range(3):
            sh, sv = sampling[ci]
            t = 0 if ci == 0 else 1
            for v in range(sv):
                for u in range(sh):
                    dc = int(grids[ci][r * sv + v, c * sh + u, 0]) >> 1
                    size, amp = _encode_value(dc - pred[ci])
                    pred[ci] = dc
                    freqs[(0, t)][size] = freqs[(0, t)].get(size, 0) + 1
                    toks.append(("s2", t, size))
                    if size:
                        toks.append(("b", amp, size))
    dc_comps = [(ci + 1, ((0 if ci == 0 else 1) << 4)) for ci in range(3)]
    emit_scan(dc_comps, 0, 0, 0, 1, freqs, toks)

    # scan 2: DC refinement Ah=1 -> Al=0 (one raw bit per block, no DHT)
    toks = []
    for m in range(mcu_rows * mcu_cols):
        r, c = divmod(m, mcu_cols)
        for ci in range(3):
            sh, sv = sampling[ci]
            for v in range(sv):
                for u in range(sh):
                    toks.append(
                        ("b", int(grids[ci][r * sv + v, c * sh + u, 0])
                         & 1, 1))
    emit_scan(dc_comps, 0, 0, 1, 0, {}, toks)

    # scans 3-4: per-component AC bands, first pass then refinement
    bands = [(1, 5), (6, 63)]
    for maker, ah, al in ((_ac_first_tokens, 0, 1),
                          (_ac_refine_tokens, 1, 0)):
        for ci in range(3):
            rows, cols = trues[ci]
            for ss, se in bands:
                freq, toks = maker(grids[ci], rows, cols, ss, se, al)
                if not freq:  # all-zero band still needs its EOBs
                    freq = {0x00: 1}
                emit_scan([(ci + 1, 0)], ss, se, ah, al, {(1, 0): freq},
                          toks)

    out += b"\xff\xd9"
    return bytes(out)
