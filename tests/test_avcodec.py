"""PCM WAV + MJPEG AVI codec tests (sources/avcodec.py) and the Spark

multimodal wiring they make real (decoder='audio', frame sampling via
decoder='mjpeg')."""

import numpy as np
import pytest

from mahout_spark.sources.avcodec import (audio_feature,
                                          decode_avi_frames, decode_wav,
                                          encode_mjpeg_avi, encode_wav)


def _tone(n=8000, hz=440, rate=16000):
    t = np.arange(n) / rate
    return 0.5 * np.sin(2 * np.pi * hz * t)


def _frames(k=6, h=24, w=32):
    y, x = np.meshgrid(np.arange(h) * 0.1, np.arange(w) * 0.1,
                       indexing="ij")
    return [np.clip(np.stack([128 + 100 * np.sin(x + i),
                              128 + 90 * np.cos(y),
                              60 + x * 25 + y * 25], -1), 0,
                    255).astype(np.uint8) for i in range(k)]


def test_wav_roundtrip_mono_and_stereo():
    sig = _tone()
    rate, out = decode_wav(encode_wav(sig, 16_000))
    assert rate == 16_000 and out.shape == (8000, 1)
    assert np.max(np.abs(out[:, 0] - sig)) < 1e-4  # 16-bit quantization
    st = np.stack([sig, -sig], axis=1)
    _, o2 = decode_wav(encode_wav(st))
    assert o2.shape == (8000, 2)
    assert np.max(np.abs(o2 - st)) < 1e-4


def test_wav_errors():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    blob = bytearray(encode_wav(_tone(100)))
    blob[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(blob))


def test_audio_feature_shape_and_signal():
    loud = audio_feature(encode_wav(_tone()), 64)
    quiet = audio_feature(encode_wav(_tone() * 0.01), 64)
    assert loud.shape == (64,) and loud.dtype == np.float32
    assert loud[0] > 10 * quiet[0]          # RMS energy tracks amplitude
    lo = audio_feature(encode_wav(_tone(hz=100)), 64)
    hi = audio_feature(encode_wav(_tone(hz=3000)), 64)
    assert hi[1] > lo[1]                    # ZCR tracks frequency


def test_mjpeg_avi_roundtrip_and_sampling():
    frames = _frames()
    avi = encode_mjpeg_avi(frames, fps=5)
    dec = decode_avi_frames(avi, every_n=2)
    assert [i for i, _ in dec] == [0, 2, 4]
    for i, fr in dec:
        assert fr.shape == frames[i].shape
        mse = np.mean((fr.astype(float) - frames[i].astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 35
    with pytest.raises(ValueError, match="AVI"):
        decode_avi_frames(b"RIFFxxxxWAVE")


def test_spark_audio_features_and_frame_sampling(spark):
    from mahout_spark.sources.imagecodec import decode_image
    from mahout_spark.sources.multimodal import (extract_features,
                                                 sample_frames)

    wavs = [(i, "audio", bytearray(encode_wav(_tone(hz=200 + 100 * i))),
             {}) for i in range(4)]
    media = spark.createDataFrame(
        wavs, "media_id long, kind string, payload binary, "
              "meta map<string,string>")
    feats = extract_features(media, dim=16, decoder="audio").collect()
    assert len(feats) == 4
    assert all(len(r["feature"]) == 16 and r["feature"][0] > 0
               for r in feats)

    avi = encode_mjpeg_avi(_frames(5))
    vid = spark.createDataFrame(
        [(9, "video", bytearray(avi), {})],
        "media_id long, kind string, payload binary, "
        "meta map<string,string>")
    fr = sample_frames(vid, every_n=2, decoder="mjpeg").collect()
    assert [r["frame_idx"] for r in fr] == [0, 2, 4]
    img = decode_image(bytes(fr[0]["frame"]))   # chunks are real JPEGs
    assert img.shape == (24, 32, 3)
