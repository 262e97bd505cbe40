"""Pure-stdlib media codecs: PNG decode (``zlib`` + ``struct``) and WAV
decode (``wave``). No third-party codec library — these make the
multimodal stages' ``decode='strict'`` mode REAL for the two formats a
container without PIL/soundfile can still handle, while JPEG/video keep
the fail-fast contract (stages/multimodal.py).

PNG coverage: 8-bit depth, color types 0 (grey), 2 (RGB), 3 (palette →
RGB), 4 (grey+alpha), 6 (RGBA); all five scanline filters; interlacing
(Adam7) and 16-bit depth raise. That covers every PNG a standard
encoder writes at the default settings.

Decoded pixels come back as ``(h, w, channels) uint8``; WAV comes back
as a mono float64 waveform in [-1, 1) plus the sample rate (multi-
channel input is mean-downmixed).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_media_format(payload: bytes) -> str:
    """'png' | 'wav' | 'jpeg' | 'unknown' from magic bytes."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (h, stride) uint8."""
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    zero = np.zeros(stride, np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1] if y else zero
        if ft == 0:  # None
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 1:  # Sub: within-row recurrence per byte lane
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {y}")
        out[y] = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8. Palette images expand to
    RGB; grey/grey+alpha keep 1/2 channels."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    plte = None
    hdr = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        chunk = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = hdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNGs supported, got depth={depth}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNGs not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = plte[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (tests/fixtures): (h, w[, c]) uint8 → bytes.
    ``filter_type`` 0/2 are applied verbatim; the decoder handles all
    five either way."""
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    rows = []
    for y in range(h):
        if filter_type == 0:
            rows.append(bytes([0]) + flat[y].astype(np.uint8).tobytes())
        elif filter_type == 2:
            prev = flat[y - 1] if y else np.zeros(stride, np.int32)
            rows.append(bytes([2])
                        + ((flat[y] - prev) & 0xFF).astype(np.uint8)
                        .tobytes())
        else:
            raise ValueError("encoder writes filter 0 or 2 only")
    body = zlib.compress(b"".join(rows))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
            + chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 waveform in [-1, 1), sample_rate).
    8/16/32-bit integer PCM; multi-channel mean-downmixed."""
    with wave.open(io.BytesIO(payload)) as f:
        nch = f.getnchannels()
        sw = f.getsampwidth()
        sr = f.getframerate()
        frames = f.readframes(f.getnframes())
    if sw == 1:
        x = (np.frombuffer(frames, np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def encode_wav(x: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Minimal 16-bit PCM mono WAV encoder (tests/fixtures)."""
    pcm = np.clip(np.asarray(x, np.float64), -1.0, 1.0 - 1.0 / 32768)
    pcm = np.round(pcm * 32768.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
