"""Pure-NumPy BMP/PPM codecs + the real multimodal decode path."""

import numpy as np
import pytest

from mahout_spark.sources.imagecodec import (decode_bmp, decode_image,
                                             decode_ppm, encode_bmp,
                                             encode_ppm, image_feature,
                                             resize_nearest)


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


class TestBMP:
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 17])  # padding cases
    def test_roundtrip_byte_exact(self, w):
        img = _img(7, w, seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_row_padding_layout(self):
        # width 3 -> 9 pixel bytes padded to 12 per row
        img = _img(2, 3, seed=1)
        payload = encode_bmp(img)
        row_size = (3 * 3 + 3) & ~3
        assert row_size == 12
        assert len(payload) == 14 + 40 + row_size * 2

    def test_bottom_up_and_bgr(self):
        img = np.zeros((2, 1, 3), dtype=np.uint8)
        img[0, 0] = [255, 0, 0]   # top row pure red
        payload = encode_bmp(img)
        # first stored row is the BOTTOM image row; stored as BGR
        first_stored = payload[54:57]
        assert first_stored == b"\x00\x00\x00"
        second_stored = payload[58:61]
        assert second_stored == bytes([0, 0, 255])  # B,G,R of red
        assert np.array_equal(decode_bmp(payload), img)

    def test_rejects_wrong_magic_and_bpp(self):
        with pytest.raises(ValueError, match="BM"):
            decode_bmp(b"XX123456")
        img = _img(2, 2)
        bad = bytearray(encode_bmp(img))
        bad[28] = 8  # claim 8 bpp
        with pytest.raises(ValueError, match="24-bit"):
            decode_bmp(bytes(bad))


class TestPPM:
    def test_roundtrip_byte_exact(self):
        img = _img(5, 9, seed=2)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_comments_in_header(self):
        img = _img(2, 3, seed=3)
        payload = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(payload), img)

    def test_rejects_16bit(self):
        payload = b"P6\n2 2\n65535\n" + b"\x00" * 24
        with pytest.raises(ValueError, match="maxval"):
            decode_ppm(payload)


class TestDispatchAndFeature:
    def test_dispatch_by_magic(self):
        img = _img(4, 4, seed=4)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        with pytest.raises(ValueError, match="unsupported image format"):
            decode_image(b"\x89PNG\r\n")

    def test_resize_nearest_exact_on_downscale_by_2(self):
        img = _img(8, 8, seed=5)
        out = resize_nearest(img, 4, 4)
        assert np.array_equal(out, img[::2, ::2])

    def test_feature_contract(self):
        img = _img(33, 17, seed=6)
        f_bmp = image_feature(encode_bmp(img), dim=64)
        f_ppm = image_feature(encode_ppm(img), dim=64)
        assert f_bmp.shape == (64,) and f_bmp.dtype == np.float32
        assert abs(np.linalg.norm(f_bmp) - 1.0) < 1e-6
        # same pixels through either container -> identical feature
        assert np.array_equal(f_bmp, f_ppm)
        with pytest.raises(ValueError, match="perfect square"):
            image_feature(encode_bmp(img), dim=60)


class TestSparkPath:
    def test_extract_features_with_real_image_decoder(self, spark):
        from mahout_spark.sources.multimodal import extract_features

        rng = np.random.default_rng(7)
        rows = []
        for i in range(12):
            img = rng.integers(0, 256, size=(10 + i, 6 + i, 3),
                               dtype=np.uint8)
            enc = encode_bmp(img) if i % 2 == 0 else encode_ppm(img)
            rows.append((i, "image", bytearray(enc), {}))
        media = spark.createDataFrame(
            rows, "media_id long, kind string, payload binary, "
                  "meta map<string,string>")
        out = extract_features(media, dim=16, decoder="image").collect()
        assert len(out) == 12
        for r in out:
            v = np.array(r["feature"], dtype=np.float32)
            assert v.shape == (16,)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        # deterministic: same payload decodes to the same feature
        again = extract_features(media, dim=16, decoder="image").collect()
        a = {r["media_id"]: list(r["feature"]) for r in out}
        b = {r["media_id"]: list(r["feature"]) for r in again}
        assert a == b


class TestPNG:
    def test_roundtrip_byte_exact_all_filters(self):
        from mahout_spark.sources.imagecodec import decode_png, encode_png

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(decode_png(encode_png(img, ft)), img), ft

    def test_gradient_image_filters_agree(self):
        # smooth gradients: every filter reconstructs identically
        from mahout_spark.sources.imagecodec import decode_png, encode_png

        y, x = np.mgrid[0:16, 0:16]
        img = np.stack([(y * 16) % 256, (x * 16) % 256,
                        ((x + y) * 8) % 256], axis=2).astype(np.uint8)
        outs = [decode_png(encode_png(img, ft)) for ft in range(5)]
        for o in outs:
            assert np.array_equal(o, img)

    def test_gray_and_rgba_and_palette(self):
        import struct
        import zlib

        from mahout_spark.sources.imagecodec import decode_png

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data)))

        sig = b"\x89PNG\r\n\x1a\n"
        # grayscale 2x2
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        raw = bytes([0, 10, 20, 0, 30, 40])
        png = sig + chunk(b"IHDR", ihdr) + \
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        got = decode_png(png)
        assert got.shape == (2, 2, 3)
        assert (got[0, 0] == [10, 10, 10]).all()
        # RGBA 1x2 -> alpha dropped
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
        raw = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
        png = sig + chunk(b"IHDR", ihdr) + \
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        got = decode_png(png)
        assert got.shape == (1, 2, 3)
        assert (got[0, 1] == [4, 5, 6]).all()
        # palette 1x2
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
        plte = bytes([255, 0, 0, 0, 255, 0])
        raw = bytes([0, 0, 1])
        png = sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + \
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        got = decode_png(png)
        assert (got[0, 0] == [255, 0, 0]).all()
        assert (got[0, 1] == [0, 255, 0]).all()

    def test_rejects_unsupported(self):
        from mahout_spark.sources.imagecodec import (decode_image,
                                                     decode_png,
                                                     encode_png)

        with pytest.raises(ValueError, match="signature"):
            decode_png(b"nope")
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(img)), img)

    def test_feature_from_png_matches_bmp(self):
        from mahout_spark.sources.imagecodec import (encode_bmp,
                                                     encode_png,
                                                     image_feature)

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        assert np.array_equal(image_feature(encode_png(img), 16),
                              image_feature(encode_bmp(img), 16))
