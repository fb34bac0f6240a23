"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, mapInPandas batch shape, partitioning) is
real and tested. Decode is REAL for the numpy-expressible codecs — P6 PPM
images, RIFF/WAVE 16-bit PCM audio, and an animated-PPM frame stream for
video — parsed and feature-extracted with numpy alone (header parse,
frombuffer, reshape, pooling, FFT). Compressed codecs (JPEG/PNG/H.264/MP3)
route through a plug-in registry: PIL / soundfile are auto-detected at
first decode inside each Python worker, and deployments can register
their own decoders; when no decoder accepts a payload the row quarantines
to nulls instead of failing the job (the reference's qualityFlag=-9
posture, ispaq/simple_metrics.py:128-140). A deterministic bytes->floats
fake remains available for plumbing tests.

Graft slot: the reference's per-target auxiliary model tables (evalresp FAP
responses fetched/computed per channel, ispaq/utils.py:558-673) — sideband
feature extraction keyed by the same id as the main table.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
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

# ---------------------------------------------------------------------------
# Real codecs (numpy-only formats)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) array -> binary P6 PPM."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3)")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _parse_ppm_at(payload: bytes, off: int) -> tuple[np.ndarray, int]:
    """Parse one P6 image starting at `off`; returns (image, next offset)."""
    if payload[off : off + 2] != b"P6":
        raise NotImplementedError(
            "not a P6 PPM; compressed image codecs (JPEG/PNG) require "
            "libraries absent from this container"
        )
    # header: magic, whitespace-separated width height maxval, one ws byte
    fields: list[int] = []
    i = off + 2
    while len(fields) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"":  # truncated header: EOF mid-fields
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":  # comment line
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            if payload[j : j + 1] == b"":
                raise ValueError("truncated PPM header")
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    n = w * h * 3
    img = np.frombuffer(payload, np.uint8, count=n, offset=i).reshape(h, w, 3)
    return img, i + n


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> uint8 (h, w, 3). Real parse, no codec library."""
    img, _ = _parse_ppm_at(payload, 0)
    return img


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float array in [-1, 1] -> minimal RIFF/WAVE mono 16-bit PCM."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE mono 16-bit PCM -> (float32 samples in [-1, 1], rate).
    Real chunk-walking parse."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE payload; compressed audio codecs require "
            "libraries absent from this container"
        )
    off, rate, data = 12, None, None
    while off + 8 <= len(payload):
        cid, size = payload[off : off + 4], struct.unpack(
            "<I", payload[off + 4 : off + 8]
        )[0]
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("truncated RIFF chunk body")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only mono 16-bit PCM supported")
        elif cid == b"data":
            data = np.frombuffer(body, "<i2").astype(np.float32) / 32767.0
        off += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


_APPM_MAGIC = b"APPMv1\n"


def encode_appm(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """Animated-PPM video stream: magic, n_frames, fps, then concatenated
    P6 frames. A real (if homebrew) container with a real sequential parse."""
    head = _APPM_MAGIC + b"%d %d\n" % (len(frames), fps)
    return head + b"".join(encode_ppm(f) for f in frames)


def decode_appm(payload: bytes) -> tuple[list[np.ndarray], int]:
    if payload[: len(_APPM_MAGIC)] != _APPM_MAGIC:
        raise NotImplementedError(
            "not an APPM stream; compressed video codecs require "
            "libraries absent from this container"
        )
    nl = payload.index(b"\n", len(_APPM_MAGIC))
    n_frames, fps = map(int, payload[len(_APPM_MAGIC) : nl].split())
    frames, off = [], nl + 1
    for _ in range(n_frames):
        img, off = _parse_ppm_at(payload, off)
        frames.append(img)
    return frames, fps


def image_feature(img: np.ndarray) -> list[float]:
    """8-dim real image descriptor: per-channel means, grayscale std, and a
    2x2 average-pooled grayscale thumbnail (resize-by-pooling — the
    mapInPandas analog of a thumbnail stage)."""
    f = img.astype(np.float32) / 255.0
    gray = f.mean(axis=2)
    h, w = gray.shape
    hh, wh = max(1, h // 2), max(1, w // 2)
    pool = [
        float(gray[i * hh : (i + 1) * hh or None, j * wh : (j + 1) * wh or None].mean())
        for i in range(2)
        for j in range(2)
    ]
    return [
        float(f[..., 0].mean()),
        float(f[..., 1].mean()),
        float(f[..., 2].mean()),
        float(gray.std()),
        *pool,
    ]


def audio_feature(samples: np.ndarray, rate: int) -> list[float]:
    """4-dim real audio descriptor: RMS, zero-crossing rate, spectral
    centroid (Hz, via numpy rFFT), duration in seconds."""
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples)))))
    spec = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(len(samples), d=1.0 / rate)
    centroid = float((freqs * spec).sum() / spec.sum()) if spec.sum() else 0.0
    return [rms, zcr, centroid, len(samples) / rate]

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


# ---------------------------------------------------------------------------
# Optional-codec plug-in registry
#
# The numpy codecs above always work; compressed formats (JPEG/PNG/MP3/OGG)
# need libraries this container lacks. Rather than hard-coding the
# quarantine, decode routes unknown magic through a registry that is
# populated two ways:
#   * explicit `register_image_decoder` / `register_audio_decoder` calls
#     (a deployment that ships its own codec wheel via --py-files), and
#   * a one-shot probe for PIL / soundfile at first decode inside each
#     Python worker (mapInPandas imports this module per executor worker,
#     so presence is evaluated where the decode actually runs, not on the
#     driver).
# A decoder either returns the decoded value or raises ValueError /
# NotImplementedError to pass; when every decoder passes, the row
# quarantines to nulls exactly as before.
# ---------------------------------------------------------------------------

_IMAGE_DECODERS: list = []  # payload -> uint8 (h, w, 3)
_AUDIO_DECODERS: list = []  # payload -> (float32 samples, rate)
_PROBED = False


def register_image_decoder(fn) -> None:
    """Add a compressed-image decoder: payload -> uint8 (h, w, 3) ndarray,
    raising ValueError/NotImplementedError on payloads it can't handle."""
    _IMAGE_DECODERS.append(fn)


def register_audio_decoder(fn) -> None:
    """Add a compressed-audio decoder: payload -> (float32 mono samples in
    [-1, 1], rate), raising ValueError/NotImplementedError to pass."""
    _AUDIO_DECODERS.append(fn)


def _reset_codec_registry() -> None:
    """Test hook: clear plug-ins and re-arm the import probe."""
    global _PROBED
    _IMAGE_DECODERS.clear()
    _AUDIO_DECODERS.clear()
    _PROBED = False


def _probe_optional_codecs() -> None:
    """One-shot per-worker detection of PIL / soundfile."""
    global _PROBED
    if _PROBED:
        return
    _PROBED = True
    import io

    try:
        from PIL import Image  # optional; absent from this container

        def _pil_decode(payload: bytes) -> np.ndarray:
            try:
                img = Image.open(io.BytesIO(payload)).convert("RGB")
            except Exception as e:  # PIL raises codec-specific errors
                raise ValueError(f"PIL decode failed: {e}") from e
            return np.asarray(img, dtype=np.uint8)

        _IMAGE_DECODERS.append(_pil_decode)
    except ImportError:
        pass

    try:
        import soundfile  # optional; absent from this container

        def _sf_decode(payload: bytes) -> tuple[np.ndarray, int]:
            try:
                data, rate = soundfile.read(
                    io.BytesIO(payload), dtype="float32"
                )
            except Exception as e:
                raise ValueError(f"soundfile decode failed: {e}") from e
            if data.ndim > 1:
                data = data.mean(axis=1)
            return data.astype(np.float32), int(rate)

        _AUDIO_DECODERS.append(_sf_decode)
    except ImportError:
        pass


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real image decode: binary P6 PPM via numpy; any other magic is
    offered to the plug-in registry (PIL when present, or explicitly
    registered decoders). No decoder -> NotImplementedError, which the
    batch path quarantines to nulls."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    _probe_optional_codecs()
    for dec in _IMAGE_DECODERS:
        try:
            return dec(payload)
        except (NotImplementedError, ValueError):
            continue
    raise NotImplementedError(
        "not a P6 PPM and no registered codec accepts this payload; "
        "compressed image codecs (JPEG/PNG) require libraries absent "
        "from this container"
    )


def decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    """Real audio decode: RIFF/WAVE PCM16 via numpy; other containers go
    through the plug-in registry (soundfile when present). No decoder ->
    NotImplementedError -> quarantine."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    _probe_optional_codecs()
    for dec in _AUDIO_DECODERS:
        try:
            return dec(payload)
        except (NotImplementedError, ValueError):
            continue
    raise NotImplementedError(
        "not a RIFF/WAVE payload and no registered codec accepts it; "
        "compressed audio codecs require libraries absent from this "
        "container"
    )


def image_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature-extraction stage over MEDIA-shaped input.

    fake=False is the REAL path: decode the payload (P6 PPM), take
    width/height from the decoded pixels (never trusting metadata), and
    emit the 8-dim `image_feature` descriptor. Rows whose payload needs an
    absent codec quarantine to nulls — the job never fails for one row.

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
                    try:
                        img = decode_image_real(bytes(payload))
                    except (NotImplementedError, ValueError):
                        rows.append((url, None, None, None))  # quarantine
                        continue
                    rows.append(
                        (
                            url,
                            int(img.shape[1]),
                            int(img.shape[0]),
                            image_feature(img),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "feature"]
            )

    return media.mapInPandas(extract, schema=IMAGE_FEATURES)


AUDIO_FEATURES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rms", FloatType(), True),
        StructField("zcr", FloatType(), True),
        StructField("spectral_centroid", FloatType(), True),
        StructField("duration_s", FloatType(), True),
    ]
)


def audio_features_df(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction: RIFF/PCM16 parse + numpy FFT per
    payload, one batch at a time; undecodable rows quarantine to nulls."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, mt, payload in zip(
                pdf["url"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None or mt != "audio":
                    rows.append((url, None, None, None, None))
                    continue
                try:
                    samples, rate = decode_audio_real(bytes(payload))
                except (NotImplementedError, ValueError):
                    rows.append((url, None, None, None, None))
                    continue
                rows.append((url, *audio_feature(samples, rate)))
            yield pd.DataFrame(
                rows,
                columns=["url", "rms", "zcr", "spectral_centroid",
                         "duration_s"],
            )

    return media.mapInPandas(extract, schema=AUDIO_FEATURES)


FRAME_FEATURES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ms", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling: parse the APPM stream, keep every Nth
    frame, emit one row per sampled frame with its real image descriptor —
    the fan-out (explode) shape of a production ffmpeg seek+decode stage,
    with a decoder that actually runs here."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, mt, payload in zip(
                pdf["url"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None or mt != "video":
                    continue
                try:
                    frames, fps = decode_appm(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue  # quarantine: no frames for undecodable video
                for idx in range(0, len(frames), every_n):
                    rows.append(
                        (
                            url,
                            idx,
                            int(idx * 1000 / fps),
                            image_feature(frames[idx]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "frame_idx", "frame_ms", "feature"]
            )

    return media.mapInPandas(sample, schema=FRAME_FEATURES)


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
