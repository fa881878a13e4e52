"""Pure-NumPy baseline JPEG codec tests (sources/jpegcodec.py).

No external codec exists in this container to cross-check against, so
the tests attack the codec structurally: quantization-bounded PSNR
round-trips across subsampling modes / qualities / odd (non-multiple-
of-8/16) dimensions, exact recovery of DC-only content, grayscale and
restart handling through the marker parser, and hard failures on
non-baseline streams.
"""

import numpy as np
import pytest

from mahout_spark.sources.jpegcodec import (_canonical_codes,
                                            _huffman_lengths,
                                            decode_jpeg, encode_jpeg)


def _test_img(h=40, w=56, seed=5):
    # spatial frequency independent of size (0.1 rad/px) so tiny images
    # aren't disproportionately high-frequency relative to the 8x8 DCT
    y, x = np.meshgrid(np.arange(h) * 0.1, np.arange(w) * 0.1,
                       indexing="ij")
    img = np.stack([128 + 100 * np.sin(x), 128 + 90 * np.cos(y),
                    60 + x * 25 + y * 25], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


@pytest.mark.parametrize("quality,subsample,floor", [
    (95, False, 45), (85, False, 40), (85, True, 33), (50, True, 30)])
def test_roundtrip_psnr(quality, subsample, floor):
    img = _test_img()
    out = decode_jpeg(encode_jpeg(img, quality=quality,
                                  subsample=subsample))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > floor


@pytest.mark.parametrize("h,w", [(17, 23), (8, 8), (9, 33), (31, 16)])
def test_odd_dimensions(h, w):
    img = _test_img(h, w)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == (h, w, 3)
        assert _psnr(img, out) > (30 if sub else 38)


def test_flat_image_exact():
    flat = np.full((16, 24, 3), (37, 180, 99), np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert int(np.max(np.abs(out.astype(int) - flat.astype(int)))) == 0


def test_deterministic_bytes():
    img = _test_img(24, 24)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_dispatch_and_errors():
    from mahout_spark.sources.imagecodec import decode_image

    img = _test_img(16, 16)
    blob = encode_jpeg(img, 90)
    assert decode_image(blob).shape == (16, 16, 3)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01garbage")
    # lossless (SOF3) must be rejected by name, not mis-decoded
    lossless = bytearray(blob)
    idx = lossless.find(b"\xff\xc0")
    lossless[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0|baseline|progressive"):
        decode_jpeg(bytes(lossless))
    with pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # truncated before any scan


def test_huffman_canonical_properties():
    rng = np.random.default_rng(9)
    freqs = {int(s): int(f) for s, f in
             zip(rng.choice(256, 60, replace=False),
                 rng.integers(1, 10_000, 60))}
    lengths = _huffman_lengths(freqs)
    assert set(lengths) == set(freqs)
    assert max(lengths.values()) <= 16
    codes = _canonical_codes(lengths)
    # prefix-free: no code is a prefix of another
    as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)
    # kraft inequality holds (valid code)
    assert sum(2.0 ** -ln for _, ln in codes.values()) <= 1.0 + 1e-12


def test_huffman_reserves_all_ones_codeword():
    """T.81 Annex K / libjpeg 256th-symbol trick: no REAL symbol may own
    the all-1s code, so 1-padding in the entropy tail can never decode
    as a symbol."""
    rng = np.random.default_rng(21)
    for trial in range(8):
        n = int(rng.integers(1, 80))
        freqs = {int(s): int(f) for s, f in
                 zip(rng.choice(256, n, replace=False),
                     rng.integers(1, 5_000, n))}
        codes = _canonical_codes(_huffman_lengths(freqs))
        for sym, (c, ln) in codes.items():
            assert c != (1 << ln) - 1, (trial, sym, c, ln)
        # reserving one codeword makes the code strictly incomplete
        assert sum(2.0 ** -ln for _, ln in codes.values()) < 1.0


def test_decode_tolerates_ff_fill_bytes():
    """0xFF fill bytes before a marker are spec-legal padding."""
    img = (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
    payload = encode_jpeg(img, quality=90)
    assert payload[:2] == b"\xff\xd8"
    padded = payload[:2] + b"\xff" + payload[2:]
    out = decode_jpeg(padded)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, decode_jpeg(payload))


def test_quality_clamped():
    img = np.full((8, 8, 3), 128, np.uint8)
    for q in (-5, 0, 150):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == (8, 8, 3)


# -- progressive (SOF2) ----------------------------------------------------------


@pytest.mark.parametrize("quality,subsample", [
    (85, False), (85, True), (50, True), (95, False)])
def test_progressive_equals_baseline_exactly(quality, subsample):
    # the scan script sends every coefficient bit, so the decoded pixels
    # must equal the baseline encoding of the same input bit-for-bit
    img = _test_img()
    base = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsample=subsample))
    prog = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsample=subsample, progressive=True))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("h,w", [(8, 8), (17, 23), (40, 56), (9, 64)])
def test_progressive_odd_dimensions(h, w):
    img = _test_img(h, w)
    base = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    prog = decode_jpeg(encode_jpeg(img, quality=80, subsample=True,
                                   progressive=True))
    assert prog.shape == (h, w, 3)
    assert np.array_equal(base, prog)


def test_progressive_random_content():
    # incompressible noise exercises long symbol runs, ZRLs in both AC
    # passes, and the correction-bit buffering
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_flat_image():
    # all-zero AC bands: every AC scan is pure EOB runs
    img = np.full((24, 24, 3), 77, np.uint8)
    prog = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert int(np.abs(prog.astype(int) - 77).max()) <= 1


def test_progressive_is_sof2():
    blob = encode_jpeg(_test_img(), progressive=True)
    assert b"\xff\xc2" in blob[:200] and b"\xff\xc0" not in blob[:200]
    # multiple SOS segments (1 DC first + 1 DC refine + 12 AC scans)
    assert blob.count(b"\xff\xda") == 14


def test_progressive_deterministic_bytes():
    img = _test_img()
    assert encode_jpeg(img, progressive=True) == \
        encode_jpeg(img, progressive=True)
