"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with typed metadata
structs; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so the heavy per-item work stays
in vectorized Python workers and the rest of the pipeline stays
Catalyst.

Codec capability gating: ``decode_image`` uses a REAL decoder
(PIL/Pillow) when the library imports, falling back to the documented
deterministic fake (payload hash → synthetic dimensions/pixel stats)
with ``fake=True``, and raising when neither applies. This container
ships no codec libraries, so the real image path is exercised only
where Pillow exists (skip-marked test); the Spark-side contract —
schemas, Arrow batch iteration, partition sizing — is identical for
both. ``decode_audio``'s real path needs NO external codec: soundfile
when installed (full format coverage), else the stdlib PCM-WAV
decoder — real decode is tested unconditionally.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, payload binary, media_type string, "
    "width int, height int, mean_luma double, decode_ok boolean"
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test scaffolding: wrap a text column as a binary payload with a
    media-type tag (standing in for real image/audio bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decoder: payload digest → (w, h, mean_luma)."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    mean_luma = digest[2] / 255.0
    return width, height, mean_luma


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> tuple[int, int, float]:
    """Real decoder: bytes → (width, height, mean luma in [0,1])."""
    import io

    import numpy as np
    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        luma = np.asarray(img.convert("L"), dtype=np.float64)
        return width, height, float(luma.mean() / 255.0)


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode binary payloads to image metadata + stats via mapInPandas.

    The Arrow batch loop is the production shape: one pandas batch in,
    one out, no per-row Python dispatch overhead. ``fake=True`` selects
    the deterministic stub decoder; otherwise Pillow must be importable
    on the executors (capability-checked up front on the driver so the
    failure is immediate, not mid-job). Undecodable payloads on the
    real path yield ``decode_ok=False`` rows, never task failures.
    """
    if not fake and not _pil_available():
        raise NotImplementedError(
            "real image decode requires Pillow on driver and executors; "
            "pass fake=True for the deterministic stub decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            ok = []
            for p in pdf[payload_col]:
                if fake:
                    meta.append(_fake_decode(bytes(p)))
                    ok.append(True)
                else:
                    try:
                        meta.append(_pil_decode(bytes(p)))
                        ok.append(True)
                    except ImportError:
                        # executor lacks PIL though the driver check
                        # passed — misconfiguration, fail loudly (see
                        # decode_audio)
                        raise
                    except Exception:
                        meta.append((0, 0, 0.0))
                        ok.append(False)
            out = pdf.copy()
            out["width"] = [m[0] for m in meta]
            out["height"] = [m[1] for m in meta]
            out["mean_luma"] = [m[2] for m in meta]
            out["decode_ok"] = ok
            yield out

    return df.mapInPandas(decode_batches, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id long, payload binary, media_type string, "
    "sample_rate int, n_samples long, rms double, decode_ok boolean"
)


def _fake_audio_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake audio decoder: payload digest →
    (sample_rate, n_samples, rms in [0,1])."""
    digest = hashlib.sha256(payload).digest()
    sample_rate = (8, 16, 22, 44)[digest[0] % 4] * 1000
    n_samples = 1000 + (digest[1] * 256 + digest[2]) * 37
    rms = digest[3] / 255.0
    return sample_rate, n_samples, rms


def _soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401
        return True
    except ImportError:
        return False


def _soundfile_decode(payload: bytes) -> tuple[int, int, float]:
    """Real decoder: bytes → (sample_rate, n_samples, rms in [0,1])."""
    import io
    import math

    import soundfile as sf

    data, rate = sf.read(io.BytesIO(payload), dtype="float64", always_2d=True)
    mono = data.mean(axis=1)
    rms = math.sqrt(float((mono * mono).mean())) if len(mono) else 0.0
    return int(rate), int(len(mono)), rms


def _wav_decode(payload: bytes) -> tuple[int, int, float]:
    """Real PCM-WAV decoder with NO external codec — stdlib ``wave``
    parses the container, numpy vectorizes the sample math. Covers
    8/16/32-bit PCM mono/multichannel WAV (channel-averaged to mono for
    the RMS, matching ``_soundfile_decode``); anything else raises and
    becomes a ``decode_ok=False`` row upstream. This is the decoder
    that makes ``decode_audio``'s REAL path live in codec-less
    containers like this one."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:  # signed little-endian 16-bit
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:  # signed little-endian 32-bit
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {width} bytes")
    if nch > 1:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return int(rate), int(x.size), rms


def decode_audio(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Audio twin of ``decode_image``: binary payloads → sample rate /
    length / RMS level via the same Arrow ``mapInPandas`` shape. The
    REAL path is always available: soundfile when the library imports
    (full codec coverage — flac/ogg/mp3/…), else the stdlib PCM-WAV
    decoder ``_wav_decode`` (wave + numpy — no external dependency), so
    ``fake=False`` genuinely decodes in codec-less containers like this
    one; payloads the selected decoder cannot parse yield
    ``decode_ok=False`` rows, never task failures. ``fake=True``
    selects the deterministic stub (the portable-oracle path). Schema,
    batching, and partitioning are identical across all three."""
    # decoder selection happens ONCE on the driver and is captured by
    # the closure, so every executor uses the same decoder even on a
    # heterogeneous image where soundfile exists only on some nodes
    use_soundfile = not fake and _soundfile_available()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            ok = []
            for p in pdf[payload_col]:
                if fake:
                    meta.append(_fake_audio_decode(bytes(p)))
                    ok.append(True)
                else:
                    try:
                        meta.append(
                            _soundfile_decode(bytes(p))
                            if use_soundfile
                            else _wav_decode(bytes(p))
                        )
                        ok.append(True)
                    except ImportError:
                        # the driver-side capability check passed but
                        # THIS executor lacks soundfile (heterogeneous
                        # cluster image): misconfiguration, not bad
                        # data — fail the task loudly instead of
                        # marking the whole corpus undecodable
                        raise
                    except Exception:
                        meta.append((0, 0, 0.0))
                        ok.append(False)
            out = pdf.copy()
            out["sample_rate"] = [m[0] for m in meta]
            out["n_samples"] = [m[1] for m in meta]
            out["rms"] = [m[2] for m in meta]
            out["decode_ok"] = ok
            yield out

    return df.mapInPandas(decode_batches, schema=AUDIO_META_SCHEMA)


def resample_plan(
    df: DataFrame, target_rate: int = 16000
) -> DataFrame:
    """Audio resample bookkeeping (target length after rate conversion,
    duration) as pure Catalyst expressions — the sample-level resample
    itself would live in the decode ``mapInPandas`` stage."""
    return df.withColumns(
        {
            "duration_sec": F.col("n_samples") / F.col("sample_rate"),
            # double multiply-then-divide, the oracle's exact op order
            "out_samples": F.ceil(
                F.col("n_samples").cast("double")
                * F.lit(float(target_rate))
                / F.col("sample_rate")
            ).cast("long"),
        }
    )


def resize_plan(
    df: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Resize bookkeeping (scale factors, letterboxing) as pure
    Catalyst expressions over decoded metadata — the pixel resample
    itself would live in the same mapInPandas stage as decode."""
    sw = F.lit(target_w) / F.col("width")
    sh = F.lit(target_h) / F.col("height")
    scale = F.least(sw, sh)
    return df.withColumns(
        {
            "scale": scale,
            "out_w": F.round(F.col("width") * scale).cast("int"),
            "out_h": F.round(F.col("height") * scale).cast("int"),
            "pad_x": (F.lit(target_w) - F.round(F.col("width") * scale)).cast("int"),
            "pad_y": (F.lit(target_h) - F.round(F.col("height") * scale)).cast("int"),
        }
    )


def frame_sample_plan(
    df: DataFrame, duration_col: str, fps: float, max_frames: int
) -> DataFrame:
    """Video frame-sampling plan: deterministic timestamps (uniform
    stride, capped) as an array column; the decoder stage consumes it.
    Pure expression — no Python."""
    n = F.least(
        F.floor(F.col(duration_col) * fps).cast("int"), F.lit(max_frames)
    )
    return df.withColumn(
        "frame_ts",
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
            lambda i: i / F.lit(fps),
        ),
    )
