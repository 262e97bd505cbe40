"""Pure-Python media codecs — no third-party codec library: PNG
(``zlib`` + ``struct``), baseline JPEG (numpy Huffman + batched IDCT),
WAV (``wave``) and MJPEG-in-AVI (``struct`` RIFF walk over JPEG
frames). These make the multimodal stages' ``decode='strict'`` mode
REAL for images, audio AND Motion-JPEG video in a container without
PIL/soundfile/av; inter-coded video (H.264 etc.) keeps the fail-fast
contract (stages/multimodal.py).

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
    """'png' | 'wav' | 'jpeg' | 'avi' | 'unknown' from magic bytes."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
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


# --- baseline JPEG (ITU-T T.81, SOF0) ----------------------------------------
# Pure Python/numpy: sequential DCT, Huffman coding, 8-bit, 1 or 3
# components, sampling factors 1-2, restart markers. Tables below are
# from the public JPEG spec (Annex K) — the "typical" quantization and
# Huffman tables every standard encoder ships.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_QT_LUM = np.array([  # Annex K.1
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99]).reshape(8, 8)

_QT_CHR = np.array([  # Annex K.2
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: fdct(b) = C @ b @ C.T,
    idct(B) = C.T @ B @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT_C = _dct_basis()


def _canonical_codes(bits, values):
    """(code, length) per symbol from BITS/HUFFVAL (T.81 C.2)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extend-coded value bits) for a DC diff / AC coef."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(_QT_LUM), s(_QT_CHR)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H/8*W/8, 8, 8) view order: raster over 8x8 blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Minimal baseline JPEG encoder (fixtures/tests): grey (h,w) or
    RGB (h,w,3); 4:4:4 by default, ``subsample=True`` writes 4:2:0;
    ``restart_interval`` emits DRI/RSTn markers. Annex K tables."""
    px = np.asarray(px)
    grey = px.ndim == 2
    h, w = px.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    sf = (2, 2) if (subsample and not grey) else (1, 1)

    if grey:
        planes = [px.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if subsample:
            for i in (1, 2):
                p = planes[i]
                ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                planes[i] = (p.reshape(ph // 2, 2, pw // 2, 2)
                             .mean(axis=(1, 3)))

    # pad each plane to multiples of 8 (luma to multiples of 8*sf so the
    # MCU grid is whole)
    mcu_h, mcu_w = 8 * sf[1], 8 * sf[0]
    n_mcu_y = -(-h // mcu_h)
    n_mcu_x = -(-w // mcu_w)
    padded = []
    for i, p in enumerate(planes):
        th = n_mcu_y * (mcu_h if i == 0 or not subsample else 8)
        tw = n_mcu_x * (mcu_w if i == 0 or not subsample else 8)
        padded.append(np.pad(p, ((0, th - p.shape[0]),
                                 (0, tw - p.shape[1])), mode="edge"))
    planes = padded

    # FDCT + quantize every block per component
    comp_blocks = []
    for i, p in enumerate(planes):
        qt = qt_l if i == 0 else qt_c
        b = _blocks_of(p - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT_C, b, _DCT_C)
        comp_blocks.append(np.round(coef / qt).astype(np.int64))

    dc_tabs = [_canonical_codes(*_HUFF_DC_LUM),
               _canonical_codes(*_HUFF_DC_CHR)]
    ac_tabs = [_canonical_codes(*_HUFF_AC_LUM),
               _canonical_codes(*_HUFF_AC_CHR)]
    zz = _ZIGZAG

    wtr = _BitWriter()
    pred = [0] * len(planes)

    def put_block(ci: int, blk: np.ndarray):
        dc_t = dc_tabs[0 if ci == 0 else 1]
        ac_t = ac_tabs[0 if ci == 0 else 1]
        seq = blk.reshape(64)[zz]
        t, bits_v = _magnitude(int(seq[0]) - pred[ci])
        pred[ci] = int(seq[0])
        code, ln = dc_t[t]
        wtr.write(code, ln)
        if t:
            wtr.write(bits_v, t)
        run = 0
        for k in range(1, 64):
            v = int(seq[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[0xF0]     # ZRL
                wtr.write(code, ln)
                run -= 16
            t, bits_v = _magnitude(v)
            code, ln = ac_t[(run << 4) | t]
            wtr.write(code, ln)
            wtr.write(bits_v, t)
            run = 0
        if run:
            code, ln = ac_t[0x00]         # EOB
            wtr.write(code, ln)

    # interleaved MCU scan
    per_row = [p.shape[1] // 8 for p in planes]
    mcu_count = 0
    rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred[:] = [0] * len(planes)
            for ci in range(len(planes)):
                fh, fv = (sf if ci == 0 else (1, 1))
                for by in range(fv):
                    for bx in range(fh):
                        r = my * fv + by
                        c = mx * fh + bx
                        put_block(ci, comp_blocks[ci][r * per_row[ci] + c])
            mcu_count += 1
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H",
                                                   len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[zz]
                                        .astype(np.uint8)))
    if not grey:
        out += seg(0xDB, bytes([1]) + bytes(qt_c.reshape(64)[zz]
                                            .astype(np.uint8)))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = (sf if ci == 0 else (1, 1))
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in ((0, 0, _HUFF_DC_LUM),
                                   (1, 0, _HUFF_AC_LUM),
                                   (0, 1, _HUFF_DC_CHR),
                                   (1, 1, _HUFF_AC_CHR)):
        if grey and tid == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over destuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("JPEG scan truncated")
        self.pos += n
        v = 0
        for bit in b:
            v = (v << 1) | int(bit)
        return v

    def read1(self) -> int:
        v = int(self.bits[self.pos])
        self.pos += 1
        return v


def _decode_tables(bits, values):
    """{(length, code): symbol} for Huffman decoding."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.read1()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG (SOF0: sequential DCT, Huffman, 8-bit, 1 or 3
    components, sampling factors 1-2, restart markers) → (h, w, ncomp)
    uint8. Progressive (SOF2) / arithmetic / 12-bit raise ValueError —
    the fail-fast contract stays honest about unsupported variants."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qt = {}
    huff = {}          # (class, id) -> decode table
    comps = None       # [(cid, fh, fv, tq)]
    h = w = 0
    dri = 0
    scan = None
    scan_comps = None
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[i:i + 2])
        body = payload[i + 2:i + ln]
        i += ln
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq_, tq = body[j] >> 4, body[j] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int32)
                t[_ZIGZAG] = np.frombuffer(body[j + 1:j + 65], np.uint8)
                qt[tq] = t.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                huff[(tc, th)] = _decode_tables(bits, vals)
                j += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for c in range(nc):
                cid, sfb, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, sfb >> 4, sfb & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF{marker - 0xC0} "
                "(only baseline SOF0 is implemented)")
        elif marker == 0xDD:
            (dri,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                           body[2 + 2 * c] & 0xF) for c in range(ns)]
            # entropy-coded data runs to the next non-RST marker
            j = i
            chunks, rsts = [], []
            start = j
            while j < n - 1:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,):
                    m2 = payload[j + 1]
                    if 0xD0 <= m2 <= 0xD7:
                        chunks.append(payload[start:j])
                        rsts.append(m2)
                        j += 2
                        start = j
                        continue
                    break
                j += 1
            chunks.append(payload[start:j])
            scan = chunks
            i = j
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    sf = {cid: (fh, fv) for cid, fh, fv, _ in comps}
    hmax = max(f[0] for f in sf.values())
    vmax = max(f[1] for f in sf.values())
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x = -(-w // mcu_w)
    n_mcu_y = -(-h // mcu_h)

    # per-component quantized-coefficient block grids
    grids = {}
    for cid, fh, fv, tq in comps:
        grids[cid] = np.zeros((n_mcu_y * fv, n_mcu_x * fh, 8, 8),
                              np.int32)

    def destuff(b: bytes) -> bytes:
        return b.replace(b"\xff\x00", b"\xff")

    zz = _ZIGZAG
    pred = {cid: 0 for cid, _, _ in scan_comps}
    mcu_idx = 0
    for seg_i, chunk in enumerate(scan):
        rd = _BitReader(destuff(chunk))
        for cid in pred:
            pred[cid] = 0
        count = dri if dri else None
        while True:
            if mcu_idx >= n_mcu_x * n_mcu_y:
                break
            if count is not None and count == 0:
                break
            my, mx = divmod(mcu_idx, n_mcu_x)
            try:
                for cid, td, ta in scan_comps:
                    fh, fv = sf[cid]
                    for by in range(fv):
                        for bx in range(fh):
                            blk = np.zeros(64, np.int32)
                            t = _huff_decode(rd, huff[(0, td)])
                            diff = _extend(rd.read(t), t)
                            pred[cid] += diff
                            blk[0] = pred[cid]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(rd, huff[(1, ta)])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                blk[zz[k]] = _extend(rd.read(s), s)
                                k += 1
                            grids[cid][my * fv + by, mx * fh + bx] \
                                = blk.reshape(8, 8)
            except (ValueError, IndexError):
                break  # padded tail of the segment
            mcu_idx += 1
            if count is not None:
                count -= 1
    if mcu_idx < n_mcu_x * n_mcu_y:
        # padding bits only ever follow the LAST MCU of a segment, so an
        # early stop means genuinely missing data — fail, don't return a
        # partial image from a strict decode
        raise ValueError("JPEG scan truncated")

    # dequantize + batched IDCT + reassemble per component
    planes = {}
    tq_of = {cid: tq for cid, _, _, tq in comps}
    for cid, g in grids.items():
        gh, gw = g.shape[:2]
        coef = (g.reshape(-1, 8, 8) * qt[tq_of[cid]]).astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", _DCT_C, coef, _DCT_C) + 128.0
        plane = (pix.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(gh * 8, gw * 8))
        fh, fv = sf[cid]
        if fh < hmax or fv < vmax:
            plane = plane.repeat(vmax // fv, axis=0) \
                .repeat(hmax // fh, axis=1)
        planes[cid] = plane[:h, :w]

    order = [c[0] for c in comps]
    if len(order) == 1:
        return np.clip(planes[order[0]].round(), 0,
                       255).astype(np.uint8)[..., None]
    y, cb, cr = (planes[c] for c in order)
    return _ycbcr_to_rgb(y, cb, cr)


# --- MJPEG-in-AVI (RIFF) ------------------------------------------------------
# Motion-JPEG needs no inter-frame codec — an AVI 'movi' list of '00dc'
# chunks, each one a baseline JPEG the decoder above already handles.
# That makes strict VIDEO frame sampling real without av/ffmpeg; true
# inter-coded formats (H.264 etc.) keep the fail-fast contract.

AVI_MAGIC = b"RIFF"


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Minimal AVI/MJPEG writer (fixtures/tests): RGB uint8 frames →
    RIFF('AVI ' hdrl(avih, strl(strh 'vids'/'MJPG', strf)) movi(00dc*)
    idx1)."""
    frames = [np.asarray(f) for f in frames]
    h, w = frames[0].shape[:2]
    jpgs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    usec = int(1_000_000 / fps)
    avih = struct.pack("<14I", usec, 0, 0, 0x10, len(jpgs), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(jpgs), 0,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_items = b"".join(chunk(b"00dc", j) for j in jpgs)
    movi = lst(b"movi", movi_items)
    idx, off = b"", 4
    for j in jpgs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes):
    """AVI/MJPEG bytes → (list of (h, w, ncomp) uint8 frames, fps).
    Walks RIFF chunks with ``struct`` only; each '00dc'/'00db' chunk is
    decoded by ``decode_jpeg``. Non-MJPEG streams raise ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps = None
    frames = []

    def walk(buf: bytes):
        nonlocal fps
        i = 0
        while i + 8 <= len(buf):
            fourcc = buf[i:i + 4]
            (size,) = struct.unpack("<I", buf[i + 4:i + 8])
            data = buf[i + 8:i + 8 + size]
            if fourcc == b"LIST":
                walk(data[4:])
            elif fourcc == b"strh" and data[:4] == b"vids":
                if data[4:8] != b"MJPG":
                    raise ValueError(
                        f"unsupported AVI video codec "
                        f"{data[4:8]!r} (only MJPG is implemented)")
                scale, rate = struct.unpack("<II", data[20:28])
                if scale:
                    fps = rate / scale
            elif fourcc in (b"00dc", b"00db") and size:
                frames.append(decode_jpeg(bytes(data)))
            i += 8 + size + (size % 2)

    walk(payload[12:])
    if not frames:
        raise ValueError("AVI contains no MJPEG frames")
    return frames, float(fps or 0.0)
