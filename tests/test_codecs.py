"""Stdlib PNG/WAV codecs (functions/codecs.py) + strict multimodal
decode: golden values, full filter-matrix roundtrips, downmix, and the
fail-fast contract for formats that genuinely need a missing library."""

import io
import struct
import wave
import zlib

import numpy as np
import pandas as pd
import pytest

from chomper_ray.functions.codecs import (PNG_MAGIC, decode_jpeg,
                                           decode_png, decode_wav,
                                           encode_jpeg,
                                          encode_png, encode_wav,
                                          sniff_media_format)
from chomper_ray.stages.multimodal import (AudioFeatures, DecodeImage,
                                           make_real_media_table)


def _forward_filter(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference forward PNG filtering (spec formulas, per scanline)."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = []
    for y, ft in enumerate(ftypes):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else cc)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(bytes([ft]) + line.astype(np.uint8).tobytes())
    return b"".join(out)


def _raw_png(px: np.ndarray, ftypes: list[int],
             color_type: int, extra_chunks=()) -> bytes:
    h, w, c = px.shape
    body = zlib.compress(_forward_filter(px, ftypes))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    mid = b"".join(chunk(t, d) for t, d in extra_chunks)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + mid
            + chunk(b"IDAT", body) + chunk(b"IEND", b""))


class TestPng:
    def test_golden_2x2_rgb(self):
        px = np.array([[[0, 128, 255], [1, 2, 3]],
                       [[250, 251, 252], [10, 20, 30]]], np.uint8)
        got = decode_png(encode_png(px))
        assert (got == px).all()
        assert got.shape == (2, 2, 3)

    def test_roundtrip_all_channel_counts_and_filters(self):
        rng = np.random.default_rng(7)
        for c in (1, 2, 3, 4):
            for ft in (0, 2):
                h, w = (int(x) for x in rng.integers(2, 30, 2))
                px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
                assert (decode_png(encode_png(px, filter_type=ft))
                        == px).all(), (c, ft)

    def test_all_five_scanline_filters_decode(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
        ftypes = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
        raw = _raw_png(px, ftypes, color_type=2)
        assert (decode_png(raw) == px).all()

    def test_palette_png_expands_to_rgb(self):
        idx = np.array([[[0], [1]], [[2], [1]]], np.uint8)
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R,G,B entries
        raw = _raw_png(idx, [0, 0], color_type=3,
                       extra_chunks=[(b"PLTE", plte)])
        got = decode_png(raw)
        want = np.array([[[255, 0, 0], [0, 255, 0]],
                         [[0, 0, 255], [0, 255, 0]]], np.uint8)
        assert (got == want).all()

    def test_unsupported_variants_raise(self):
        px = np.zeros((2, 2, 3), np.uint8)
        good = encode_png(px)
        # 16-bit depth
        bad = bytearray(good)
        bad[8 + 4 + 4 + 8] = 16  # IHDR depth byte
        with pytest.raises(ValueError):
            decode_png(bytes(bad))
        with pytest.raises(ValueError):
            decode_png(b"\xff\xd8\xffnot-a-png")

    def test_sniff(self):
        assert sniff_media_format(encode_png(np.zeros((1, 1, 3),
                                                      np.uint8))) == "png"
        assert sniff_media_format(encode_wav(np.zeros(8))) == "wav"
        assert sniff_media_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
        assert sniff_media_format(b"??") == "unknown"


class TestWav:
    def test_roundtrip_sine(self):
        sr = 8000
        t = np.arange(800) / sr
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        got, got_sr = decode_wav(encode_wav(x, sr))
        assert got_sr == sr and len(got) == len(x)
        assert np.abs(got - x).max() < 1.0 / 32768

    def test_stereo_downmix_and_8bit(self):
        sr = 4000
        left = np.full(100, 0.5)
        right = np.full(100, -0.5)
        pcm = np.empty(200, "<i2")
        pcm[0::2] = np.round(left * 32768).astype("<i2")
        pcm[1::2] = np.round(right * 32768).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        got, _ = decode_wav(buf.getvalue())
        assert np.abs(got).max() < 1e-3  # L/R cancel

        buf8 = io.BytesIO()
        with wave.open(buf8, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(1)
            f.setframerate(sr)
            f.writeframes(bytes([128, 255, 0] * 10))
        got8, _ = decode_wav(buf8.getvalue())
        assert abs(got8[0]) < 1e-9 and got8.max() > 0.9 and got8.min() < -0.9


class TestStrictStages:
    def test_strict_png_pixel_stats_golden(self):
        px = np.array([[[10, 20, 30], [40, 50, 60]]], np.uint8)  # mean 35
        df = pd.DataFrame({"payload": [encode_png(px)],
                           "width": [2], "height": [1]})
        out = DecodeImage(mode="strict", resize=(1, 2))(df)
        assert out["pixel_mean"].iloc[0] == 35.0
        feat = out["image_feat"].iloc[0]
        assert feat.tolist() == [20.0, 50.0]  # per-block exact means

    def test_strict_decodes_real_media_table(self):
        df = make_real_media_table(12).to_pandas()
        img = df[df["media_type"] == "image"].copy()
        out = DecodeImage(mode="strict")(img)
        assert out["pixel_mean"].notna().all()
        aud = df[df["media_type"] == "audio"].copy()
        out_a = AudioFeatures(mode="strict")(aud)
        assert out_a["rms"].notna().all()
        assert (out_a["rms"] > 0.2).all()  # 0.5-amplitude sine ≈ 0.35

    def test_strict_wav_rms_golden(self):
        sr = 8000
        x = 0.5 * np.sin(2 * np.pi * 200 * np.arange(sr // 10) / sr)
        df = pd.DataFrame({"payload": [encode_wav(x, sr)],
                           "duration_ms": [100]})
        out = AudioFeatures(mode="strict")(df)
        # rms of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.353553
        assert abs(out["rms"].iloc[0] - 0.5 / np.sqrt(2)) < 1e-3

    def test_strict_fails_fast_on_unsupported_formats(self):
        with pytest.raises(NotImplementedError, match="unsupported format"):
            DecodeImage(mode="strict")(pd.DataFrame(
                {"payload": [b"GIF89a not supported"], "width": [2],
                 "height": [2]}))
        # malformed JPEG (magic only) is an ERROR, not a stub fallback
        with pytest.raises(ValueError):
            DecodeImage(mode="strict")(pd.DataFrame(
                {"payload": [b"\xff\xd8\xff\xe0JFIF"], "width": [2],
                 "height": [2]}))
        with pytest.raises(NotImplementedError, match="soundfile"):
            AudioFeatures(mode="strict")(pd.DataFrame(
                {"payload": [b"not audio"], "duration_ms": [10]}))

    def test_strict_jpeg_pixel_stats(self):
        px = np.full((16, 16, 3), (200, 64, 32), np.uint8)
        df = pd.DataFrame({"payload": [encode_jpeg(px, quality=95)],
                           "width": [16], "height": [16]})
        out = DecodeImage(mode="strict", resize=(2, 2))(df)
        want = np.array([200, 64, 32]).mean()
        assert abs(out["pixel_mean"].iloc[0] - want) < 1.0


class TestJpeg:
    """Baseline JPEG codec (pure numpy Huffman + IDCT): lossy, so
    roundtrips assert bounded error; flat blocks are exact."""

    def _gradient(self, h=40, w=56):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([(yy * 4) % 256, (xx * 3) % 256,
                         ((yy + xx) * 2) % 256], -1).astype(np.uint8)

    def test_flat_color_roundtrips_exactly(self):
        px = np.full((24, 24, 3), (200, 64, 32), np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert np.abs(out.astype(int) - px.astype(int)).max() == 0

    def test_gradient_roundtrip_bounded_error(self):
        g = self._gradient()
        out = decode_jpeg(encode_jpeg(g, quality=95))
        err = np.abs(out.astype(int) - g.astype(int))
        assert err.mean() < 1.0 and err.max() <= 4

    def test_grey_single_component(self):
        yy, xx = np.mgrid[0:40, 0:56]
        gg = ((yy * 5 + xx * 2) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(gg, quality=90))
        assert out.shape == (40, 56, 1)
        assert np.abs(out[..., 0].astype(int) - gg.astype(int)).mean() < 2

    def test_420_subsampling_and_odd_dims(self):
        g = self._gradient(41, 55)  # not multiples of the 16x16 MCU
        out = decode_jpeg(encode_jpeg(g, quality=90, subsample=True))
        assert out.shape == g.shape
        assert np.abs(out.astype(int) - g.astype(int)).mean() < 3

    def test_restart_markers(self):
        g = self._gradient()
        b = encode_jpeg(g, quality=90, restart_interval=2)
        assert b"\xff\xd0" in b or b"\xff\xd1" in b
        out = decode_jpeg(b)
        assert np.abs(out.astype(int) - g.astype(int)).mean() < 2

    def test_quality_monotonic(self):
        g = self._gradient()
        errs = [np.abs(decode_jpeg(encode_jpeg(g, quality=q))
                       .astype(int) - g.astype(int)).mean()
                for q in (30, 60, 95)]
        assert errs[0] > errs[1] > errs[2]
        assert len(encode_jpeg(g, 30)) < len(encode_jpeg(g, 95))

    def test_unsupported_variants_raise(self):
        g = encode_jpeg(self._gradient())
        # flip SOF0 -> SOF2 (progressive)
        prog = g.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(prog)
        # cut inside the entropy-coded scan: error, not a partial image
        cut = g.index(b"\xff\xda") + 80
        assert cut < len(g) - 100
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(g[:cut] + b"\xff\xd9")
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"plainly not a jpeg")

    def test_idct_inverts_fdct(self):
        from chomper_ray.functions.codecs import _DCT_C
        rng = np.random.default_rng(3)
        b = rng.normal(size=(8, 8))
        coef = _DCT_C @ b @ _DCT_C.T
        back = _DCT_C.T @ coef @ _DCT_C
        assert np.allclose(back, b, atol=1e-12)
