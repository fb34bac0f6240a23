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
