"""Multimodal plumbing tests: schema, batch shape, deterministic fake
features, stubbed real-decode path."""

from __future__ import annotations

import pytest

from ispaq_spark.functions.media import (
    decode_image_real,
    frame_sample_stub,
    image_features,
)
from ispaq_spark.schemas import MEDIA


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("u1", "image", b"\x89PNGfake1", 64, 48, None),
        ("u2", "image", b"\x89PNGfake2", 32, 32, None),
        ("u3", "audio", b"RIFFfake", None, None, 1500),
        ("u4", "video", b"\x00\x00ftypfake", 640, 360, 3500),
        ("u5", "image", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_image_features_shape_and_determinism(media, spark):
    out = image_features(media, fake=True)
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {"u1", "u2", "u3", "u4", "u5"}
    assert rows["u1"]["width"] == 64 and len(rows["u1"]["feature"]) == 8
    assert rows["u3"]["feature"] is None  # non-image passes through null
    assert rows["u5"]["feature"] is None  # null payload quarantined
    # determinism across runs
    again = {r["url"]: r for r in image_features(media, fake=True).collect()}
    assert again["u1"]["feature"] == rows["u1"]["feature"]


def test_frame_sampling_rows(media):
    frames = frame_sample_stub(media, every_n_ms=1000).collect()
    by_url = {}
    for r in frames:
        by_url.setdefault(r["url"], []).append(r["frame_ms"])
    assert by_url == {"u4": [0, 1000, 2000, 3000]}


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"bytes")


# --- real numpy codecs ------------------------------------------------------

import numpy as np

from ispaq_spark.functions.media import (
    _parse_ppm_at,
    audio_feature,
    audio_features_df,
    decode_appm,
    decode_ppm,
    decode_wav,
    encode_appm,
    encode_ppm,
    encode_wav,
    frame_features,
    image_feature,
)


def _img(seed: int, h: int = 8, w: int = 6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_round_trip():
    img = _img(1)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_comment_header():
    img = _img(2, 2, 2)
    raw = encode_ppm(img)
    commented = b"P6\n# a comment\n2 2\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), img)


def test_wav_round_trip_and_centroid():
    rate = 8000
    t = np.arange(rate) / rate
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, r = decode_wav(encode_wav(sine, rate))
    assert r == rate and len(samples) == rate
    assert np.allclose(samples, sine, atol=1e-3)
    rms, zcr, centroid, dur = audio_feature(samples, r)
    assert abs(centroid - 440.0) < 5.0  # pure tone -> centroid at f0
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(dur - 1.0) < 1e-9


def test_image_feature_known_values():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # one pure-red pixel
    f = image_feature(img)
    assert abs(f[0] - 0.25) < 1e-6  # mean R
    assert f[1] == 0.0 and f[2] == 0.0
    # 2x2 pool of the 2x2 gray image is the per-pixel gray values
    assert abs(f[4] - (1 / 3)) < 1e-6 and f[5] == 0.0


def test_real_image_features_pipeline(spark):
    img1, img2 = _img(3, 4, 4), _img(4, 6, 2)
    rows = [
        ("r1", "image", bytes(encode_ppm(img1)), 999, 999, None),  # lying meta
        ("r2", "image", bytes(encode_ppm(img2)), None, None, None),
        ("r3", "image", b"\x89PNG....", 10, 10, None),  # absent codec
    ]
    media = spark.createDataFrame(rows, MEDIA)
    out = {r["url"]: r for r in image_features(media, fake=False).collect()}
    # dimensions come from the DECODED pixels, not metadata
    assert (out["r1"]["width"], out["r1"]["height"]) == (4, 4)
    assert (out["r2"]["width"], out["r2"]["height"]) == (2, 6)
    assert out["r1"]["feature"] == pytest.approx(image_feature(img1), abs=1e-6)
    assert out["r3"]["feature"] is None  # quarantined, job didn't fail


def test_real_audio_features_pipeline(spark):
    rate = 8000
    t = np.arange(rate // 2) / rate
    wav = bytes(encode_wav(0.3 * np.sin(2 * np.pi * 200 * t), rate))
    rows = [
        ("a1", "audio", wav, None, None, 500),
        ("a2", "audio", b"ID3mp3junk", None, None, 500),  # absent codec
    ]
    media = spark.createDataFrame(rows, MEDIA)
    out = {r["url"]: r for r in audio_features_df(media).collect()}
    assert abs(out["a1"]["spectral_centroid"] - 200.0) < 5.0
    assert abs(out["a1"]["duration_s"] - 0.5) < 1e-6
    assert out["a2"]["rms"] is None  # quarantined


def test_real_frame_sampling_pipeline(spark):
    frames = [_img(i, 4, 4) for i in range(6)]
    vid = bytes(encode_appm(frames, fps=2))
    media = spark.createDataFrame(
        [("v1", "video", vid, 4, 4, 3000)], MEDIA
    )
    out = sorted(
        frame_features(media, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert [r["frame_ms"] for r in out] == [0, 1000, 2000]
    assert out[1]["feature"] == pytest.approx(
        image_feature(frames[2]), abs=1e-6
    )


def test_truncated_ppm_header_raises_not_hangs():
    # Regression: a truncated header used to infinite-loop the executor
    # task instead of quarantining (ADVICE r2).
    for payload in (b"P6\n100", b"P6\n100 ", b"P6\n# only a comment"):
        with pytest.raises(ValueError):
            _parse_ppm_at(payload, 0)


# --- optional-codec plug-in registry ---------------------------------------

import sys
import types

from ispaq_spark.functions import media as media_mod
from ispaq_spark.functions.media import (
    decode_audio_real,
    register_audio_decoder,
    register_image_decoder,
)


@pytest.fixture
def clean_registry():
    media_mod._reset_codec_registry()
    yield
    media_mod._reset_codec_registry()


def test_absent_codecs_quarantine(clean_registry):
    """With no optional libraries and no registered plug-ins, compressed
    magic raises NotImplementedError — the batch quarantine contract."""
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3mp3junk")


def test_registered_decoder_routes_compressed(clean_registry):
    img = _img(7, 2, 2)

    def fake_png(payload):
        if payload[:4] != b"\x89PNG":
            raise ValueError("not png")
        return img

    register_image_decoder(fake_png)
    assert np.array_equal(decode_image_real(b"\x89PNG1234"), img)
    # PPM still takes the native numpy path
    ppm = _img(8, 2, 2)
    assert np.array_equal(decode_image_real(encode_ppm(ppm)), ppm)
    # magic no decoder accepts still quarantines
    with pytest.raises(NotImplementedError):
        decode_image_real(b"GIF89a..")


def test_probe_detects_mock_pil(clean_registry, monkeypatch):
    """Presence case: a PIL on the worker's path is auto-detected at first
    decode and used for non-PPM payloads."""
    img = _img(9, 3, 3)

    class _FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return img

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=lambda buf: _FakeImg())
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    assert np.array_equal(decode_image_real(b"\x89PNGwhatever"), img)


def test_probe_detects_mock_soundfile(clean_registry, monkeypatch):
    samples = np.linspace(-1, 1, 16, dtype=np.float32)
    fake_sf = types.ModuleType("soundfile")
    fake_sf.read = lambda buf, dtype: (samples, 44100)
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
    got, rate = decode_audio_real(b"OggSjunk")
    assert rate == 44100 and np.allclose(got, samples)


def test_registered_audio_decoder_passes_on_error(clean_registry):
    """A decoder that raises ValueError passes to the next / quarantine
    instead of failing the row hard."""
    register_audio_decoder(
        lambda payload: (_ for _ in ()).throw(ValueError("nope"))
    )
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3mp3junk")


def test_truncated_wav_chunks_raise_value_error():
    # Regression: short fmt/data chunk bodies used to escape as
    # struct.error past the quarantine except-tuple (ADVICE r2).
    import struct as _s

    bad_fmt = (
        b"RIFF" + _s.pack("<I", 20) + b"WAVE"
        + b"fmt " + _s.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError):
        decode_wav(bad_fmt)
    truncated_body = (
        b"RIFF" + _s.pack("<I", 100) + b"WAVE"
        + b"fmt " + _s.pack("<I", 16) + b"\x01\x00\x01\x00" + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        decode_wav(truncated_body)
