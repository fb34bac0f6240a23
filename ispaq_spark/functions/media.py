"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, mapInPandas batch shape, partitioning) is
real and tested; the actual codec calls are STUBS — the decode libraries
(PIL/ffmpeg/librosa) are not in this container. Each stub either raises
NotImplementedError (real-decode mode) or produces a deterministic fake
derived from the payload bytes (test mode), clearly marked.

Graft slot: the reference's per-target auxiliary model tables (evalresp FAP
responses fetched/computed per channel, ispaq/utils.py:558-673) — sideband
feature extraction keyed by the same id as the main table.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real embedding: bytes -> sha256 -> floats
    in [0,1). Stable across executors/runs."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def decode_image_real(payload: bytes):
    """Real decode path — requires an image codec library.

    STUB: not available in this environment.
    """
    raise NotImplementedError(
        "image decoding requires PIL/turbojpeg; not present in this container"
    )


def image_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature-extraction stage over MEDIA-shaped input.

    The batch shape is the contract: each pandas batch carries the binary
    payloads of up to maxRecordsPerBatch rows; the UDF must never hold more
    than one batch (no accumulation across yields) so executor memory is
    bounded by batch size x payload size, not partition size.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, mt, payload, w, h in zip(
                pdf["url"],
                pdf["media_type"],
                pdf["payload"],
                pdf["meta_width"],
                pdf["meta_height"],
            ):
                if payload is None or mt != "image":
                    rows.append((url, None, None, None))
                    continue
                if fake:
                    rows.append(
                        (
                            url,
                            int(w) if pd.notna(w) else None,
                            int(h) if pd.notna(h) else None,
                            _fake_feature(bytes(payload)),
                        )
                    )
                else:
                    decode_image_real(bytes(payload))  # raises
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "feature"]
            )

    return media.mapInPandas(extract, schema=IMAGE_FEATURES)


def frame_sample_stub(media: DataFrame, every_n_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    STUB decode: frames are deterministic fakes (payload hash + frame idx);
    a real implementation swaps `_fake_feature` for an ffmpeg seek+decode.
    Schema/explode shape is the real contract.
    """
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("frame_ms", IntegerType(), False),
            StructField("feature", ArrayType(FloatType()), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, mt, payload, dur in zip(
                pdf["url"], pdf["media_type"], pdf["payload"],
                pdf["meta_duration_ms"],
            ):
                if payload is None or mt != "video" or pd.isna(dur):
                    continue
                for ms in range(0, int(dur), every_n_ms):
                    rows.append(
                        (url, ms, _fake_feature(bytes(payload) + str(ms).encode()))
                    )
            yield pd.DataFrame(rows, columns=["url", "frame_ms", "feature"])

    return media.mapInPandas(sample, schema=schema)
