"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

``decode='strict'`` is REAL for PNG and baseline JPEG images and WAV
audio via the pure-Python codecs in ``functions/codecs.py`` (zlib/struct
PNG, numpy Huffman+IDCT JPEG, ``wave`` WAV — no third-party library
needed); video formats keep the fail-fast contract
(``NotImplementedError`` naming the missing codec) because container
demuxing genuinely needs av/ffmpeg, absent here.
``decode='fake'`` produces a deterministic fake decode derived from the
payload bytes so the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) stays testable against any payload.

Batch-size guidance baked into the stage defaults: binary payloads are
wide — ``batch_size`` stays small (256) so batch × concurrency fits the
worker heap (engine memory rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from chomper_ray.functions.codecs import (decode_avi_mjpeg, decode_jpeg,
                                          decode_png, decode_wav,
                                          encode_avi_mjpeg, encode_jpeg,
                                          encode_png, encode_wav,
                                          sniff_media_format)

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("url", pa.string()),
    pa.field("media_type", pa.string()),     # 'image' | 'audio' | 'video'
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),           # typed metadata, nullable
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),
])

DEFAULT_MEDIA_BATCH_SIZE = 256


def _require_codec(modules: tuple[str, ...], what: str) -> None:
    """Strict-mode contract: fail at STAGE CONSTRUCTION (actor __init__ /
    pipeline build), not mid-run on the first payload — a 100 TB job must
    refuse to start without its codec, not die hours in."""
    import importlib

    missing = []
    for m in modules:
        try:
            importlib.import_module(m)
        except ImportError:
            missing.append(m)
    if missing:
        raise NotImplementedError(
            f"strict {what} decoding needs {'/'.join(missing)} (not in "
            "this container); run with mode='fake' for plumbing tests")


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes → (h, w, 3) uint8."""
    seed = int(pd.util.hash_array(np.array([payload], dtype=object))[0]) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class DecodeImage:
    """payload(binary) → decoded pixel stats + optional resize features.

    Actor-pool stage; ``__init__`` is where a real decoder would load its
    codec state once per actor.
    """

    def __init__(self, mode: str = "fake", resize: tuple[int, int] = (32, 32)):
        if mode not in ("fake", "strict"):
            raise ValueError("mode must be 'fake' or 'strict'")
        # strict PNG/JPEG decode is pure Python+numpy
        # (functions/codecs.py) — no build-time codec requirement;
        # unknown formats fail fast at decode naming the format
        self.mode = mode
        self.resize = resize

    def _decode_image_impl(self, payload: bytes, w, h) -> np.ndarray:
        if self.mode == "strict":
            fmt = sniff_media_format(payload)
            if fmt == "png":
                return decode_png(payload)  # REAL stdlib decode
            if fmt == "jpeg":
                return decode_jpeg(payload)  # REAL numpy baseline decode
            raise NotImplementedError(
                f"strict image decode: unsupported format {fmt!r} "
                "(PNG and baseline JPEG decode natively)")
        rh = int(h) if pd.notna(h) else 16
        rw = int(w) if pd.notna(w) else 16
        return _fake_pixels(payload, min(rh, 64), min(rw, 64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        means, feats = [], []
        th, tw = self.resize
        for payload, w, h in zip(batch["payload"], batch.get("width"),
                                 batch.get("height")):
            if payload is None:
                means.append(None)
                feats.append(None)
                continue
            px = self._decode_image_impl(payload, w, h)
            means.append(round(float(px.mean()), 4))
            # "resize": deterministic block-mean downsample to (th, tw)
            # via an integral image — one cumsum + one fancy-index per
            # image instead of th*tw Python slice/mean calls. Block sums
            # of uint8 are exact integers in float64, so the result is
            # bitwise-identical to the naive per-block .mean().
            ys = np.linspace(0, px.shape[0], th + 1, dtype=int)
            xs = np.linspace(0, px.shape[1], tw + 1, dtype=int)
            s = np.zeros((px.shape[0] + 1, px.shape[1] + 1))
            s[1:, 1:] = px.sum(axis=2, dtype=np.float64).cumsum(0).cumsum(1)
            blk = (s[np.ix_(ys[1:], xs[1:])] - s[np.ix_(ys[:-1], xs[1:])]
                   - s[np.ix_(ys[1:], xs[:-1])] + s[np.ix_(ys[:-1], xs[:-1])])
            area = np.diff(ys)[:, None] * np.diff(xs)[None, :] * px.shape[2]
            with np.errstate(invalid="ignore"):
                # empty blocks (image smaller than target) stay NaN,
                # matching np.mean-of-empty in the naive spec
                f = (blk / area).astype(np.float32)
            feats.append(f.ravel())
        batch["pixel_mean"] = means
        batch["image_feat"] = feats
        return batch


class AudioFeatures:
    """audio payload → fixed-width feature vector (stub decode).

    Real path: load a codec + feature extractor once per actor in
    ``__init__`` (the actor-pool shape), decode + e.g. mel-spectrogram in
    ``__call__``. Here ``_decode_audio_impl`` is stubbed: 'strict' raises,
    'fake' derives a deterministic waveform from the payload bytes so the
    schema/batching/actor plumbing is fully exercised.
    """

    def __init__(self, mode: str = "fake", n_features: int = 16):
        if mode not in ("fake", "strict"):
            raise ValueError("mode must be 'fake' or 'strict'")
        # strict WAV decode is pure stdlib (functions/codecs.py); other
        # audio formats fail fast at decode naming the missing library
        self.mode = mode
        self.n_features = n_features

    def _decode_audio_impl(self, payload: bytes, duration_ms) -> np.ndarray:
        if self.mode == "strict":
            fmt = sniff_media_format(payload)
            if fmt == "wav":
                return decode_wav(payload)[0]  # REAL stdlib decode
            raise NotImplementedError(
                f"strict audio decode: {fmt} needs soundfile (not in "
                "this container); WAV decodes natively")
        seed = int(pd.util.hash_array(np.array([payload], dtype=object))[0]) & 0x7FFFFFFF
        n = max(64, int(duration_ms) if pd.notna(duration_ms) else 1000)
        return np.random.default_rng(seed).standard_normal(min(n, 4096))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, rms = [], []
        for payload, d in zip(batch["payload"], batch.get("duration_ms")):
            if payload is None:
                feats.append(None)
                rms.append(None)
                continue
            wave = self._decode_audio_impl(payload, d)
            # fixed-width band energies (stand-in for a mel spectrogram)
            bands = np.array_split(wave ** 2, self.n_features)
            feats.append(np.array([float(b.mean()) for b in bands],
                                  dtype=np.float32))
            rms.append(round(float(np.sqrt((wave ** 2).mean())), 6))
        batch["audio_feat"] = feats
        batch["rms"] = rms
        return batch


class SampleFrames:
    """video payload → frame-sample timestamps. ``strict`` mode REALLY
    demuxes + decodes MJPEG-in-AVI payloads (functions/codecs.py — RIFF
    walk, per-frame baseline-JPEG decode) and samples n_frames evenly
    from the ACTUAL frame list, timestamps from the container's fps;
    inter-coded formats raise NotImplementedError naming the codec.
    ``fake`` mode derives timestamps from metadata only."""

    def __init__(self, mode: str = "fake", n_frames: int = 4):
        if mode not in ("fake", "strict"):
            raise ValueError("mode must be 'fake' or 'strict'")
        self.mode = mode
        self.n_frames = n_frames

    def _frames_impl(self, payload: bytes, duration_ms) -> list[int]:
        if self.mode == "strict":
            if sniff_media_format(payload) != "avi":
                raise NotImplementedError(
                    "strict frame sampling: only MJPEG-in-AVI decodes "
                    "natively; other containers need av/ffmpeg (not in "
                    "this container)")
            frames, fps = decode_avi_mjpeg(payload)
            pick = np.linspace(0, len(frames), self.n_frames,
                               endpoint=False).astype(int)
            step_ms = 1000.0 / fps if fps else 0.0
            return [int(i * step_ms) for i in pick]
        d = int(duration_ms) if pd.notna(duration_ms) else 1000
        return [int(t) for t in np.linspace(0, d, self.n_frames, endpoint=False)]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["frame_ts_ms"] = [
            None if p is None else self._frames_impl(p, d)
            for p, d in zip(batch["payload"], batch.get("duration_ms"))
        ]
        return batch


def make_real_media_table(n: int = 48, seed: int = 9) -> pa.Table:
    """Synthetic media table with REAL payloads: PNG images (gradient +
    noise, alternating scanline filters) interleaved with baseline
    JPEGs (every third image, exercising the numpy Huffman+IDCT
    decoder), 16-bit PCM WAV sine bursts, and 'video' rows that keep an
    opaque payload (no stdlib video codec exists — those rows exercise
    the fail-fast contract)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "url", "media_type", "payload",
                            "width", "height", "duration_ms")}
    for i in range(n):
        t = ("image", "audio", "video")[i % 3]
        rows["media_id"].append(i)
        rows["url"].append(f"https://media.example.com/{i}")
        rows["media_type"].append(t)
        if t == "image":
            h = int(rng.integers(8, 40))
            w = int(rng.integers(8, 40))
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(xx * 3 + i) % 256, (yy * 5 + 2 * i) % 256,
                           (xx + yy + 7 * i) % 256], axis=2)
            px = ((px + rng.integers(0, 32, px.shape)) % 256) \
                .astype(np.uint8)
            if i % 9 == 6:   # every third image row: a real JPEG
                rows["payload"].append(encode_jpeg(px, quality=92))
            else:
                rows["payload"].append(encode_png(
                    px, filter_type=2 if i % 2 else 0))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
        elif t == "audio":
            sr = 8000
            dur = float(rng.uniform(0.05, 0.2))
            tt = np.arange(int(sr * dur)) / sr
            x = 0.5 * np.sin(2 * np.pi * (100.0 * (1 + i % 8)) * tt)
            rows["payload"].append(encode_wav(x, sr))
            rows["width"].append(None)
            rows["height"].append(None)
            rows["duration_ms"].append(int(dur * 1000))
        else:
            # real 3-frame MJPEG-in-AVI clip (strict frame sampling
            # decodes it; the fail-fast path for inter-coded video is
            # exercised with raw bytes in pytest)
            fh, fw = 16, 24
            yy, xx = np.mgrid[0:fh, 0:fw]
            clip = [np.stack([(xx * 3 + i + 10 * f) % 256,
                              (yy * 5) % 256,
                              ((xx + yy) * 2) % 256],
                             axis=2).astype(np.uint8) for f in range(3)]
            fps = int(rng.integers(4, 16))
            rows["payload"].append(encode_avi_mjpeg(clip, fps=fps))
            rows["width"].append(fw)
            rows["height"].append(fh)
            rows["duration_ms"].append(int(3000 / fps))
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "url": pa.array(rows["url"]),
        "media_type": pa.array(rows["media_type"]),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], type=pa.int32()),
    })


def make_fake_media_table(n: int = 64, seed: int = 9) -> pa.Table:
    """Deterministic synthetic media table (tests/demos only)."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(rng.integers(64, 512))).astype(np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array([f"https://media.example.com/{i}" for i in range(n)]),
        "media_type": pa.array(types.tolist()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([int(rng.integers(8, 64)) if t == "image" else None
                           for t in types], type=pa.int32()),
        "height": pa.array([int(rng.integers(8, 64)) if t == "image" else None
                            for t in types], type=pa.int32()),
        "duration_ms": pa.array([int(rng.integers(500, 5000)) if t != "image" else None
                                 for t in types], type=pa.int32()),
    })
