"""Real multimodal codecs and feature kernels, pure numpy + stdlib.

The container has no image/audio libraries, but five real, widely-used
formats are decodable with numpy + the stdlib alone: **BMP** (Windows
bitmap, 24-bit uncompressed BI_RGB), **PNG** (8-bit truecolor, zlib
inflate + all five spec filter types), **JPEG** (baseline sequential
DCT + Huffman, 4:4:4 — see functions/jpeg.py, re-exported here),
**raw MJPEG video** (back-to-back JPEG frames, the motion-JPEG wire
format, split by a structural marker walk — never a byte scan), and
**WAV** (RIFF PCM16 — the baseline audio format). This module
implements honest encoders/decoders plus vectorized feature kernels, so
the multimodal stages in ``stages/multimodal.py`` produce REAL features
for these formats.

**MP3 is formally DESCOPED** (not stubbed — there is no ``decode_mp3``
and no MP3 payload in any media table, so nothing silently fails): a
conformant MPEG-1 Audio decoder requires the ISO/IEC 11172-3 Annex 3-B
tabulated coefficients (the 512-entry rounded synthesis window, the
layer-II bit-allocation/quantization tables, layer-III Huffman tables),
which are spec tables, not derivable from a formula — and with no
external libraries and no real MP3 payloads in this container, a
hand-typed approximation could be neither conformance-checked nor
exercised. Compressed-audio coverage is instead provided by the two
G.711 codecs (ulaw/alaw, canonical closed-form companding laws,
twin-tested against stdlib ``audioop``), which exercise the same
pipeline shape: binary payload → vectorized LUT decompression →
feature kernels. A WAV container carrying any other compression tag is
rejected loudly (``NotImplementedError`` below).

Decoders parse the actual on-disk format (magic, header fields, row
padding, chunk walk, CRCs, filter reconstruction) and reject what they
can't handle loudly — they are not toy readers of a private layout.
Round-trip equality is property-tested in tests/test_media.py,
including a per-pixel scalar-twin PNG decoder straight from the spec.

Reference analog: none — the reference coordinator never touches
payload bytes (media ran on GPU workers, reference README.md:5-11);
this is a north-rule training-data-pipeline capability.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401  (codec façade)
from .jpeg import split_frames as split_mjpeg  # noqa: F401

FEATURE_DIM = 16  # shared by image and audio features (CLIP-ish shape)


# --------------------------------------------------------------------- BMP
def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w, _ = pixels.shape
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    header = np.zeros(54, np.uint8)
    header[0:2] = [0x42, 0x4D]                                   # 'BM'
    header[2:6] = np.frombuffer(np.uint32(54 + img_size).tobytes(), np.uint8)
    header[10:14] = np.frombuffer(np.uint32(54).tobytes(), np.uint8)
    header[14:18] = np.frombuffer(np.uint32(40).tobytes(), np.uint8)
    header[18:22] = np.frombuffer(np.int32(w).tobytes(), np.uint8)
    header[22:26] = np.frombuffer(np.int32(h).tobytes(), np.uint8)  # bottom-up
    header[26:28] = np.frombuffer(np.uint16(1).tobytes(), np.uint8)
    header[28:30] = np.frombuffer(np.uint16(24).tobytes(), np.uint8)
    header[34:38] = np.frombuffer(np.uint32(img_size).tobytes(), np.uint8)
    rows = np.zeros((h, row_stride), np.uint8)
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)    # BGR, bottom-up
    return header.tobytes() + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Handles both bottom-up (positive height) and top-down (negative)
    layouts and the spec's 4-byte row padding; rejects other bit depths
    and compressed variants explicitly."""
    buf = np.frombuffer(payload, np.uint8)
    if len(buf) < 54 or buf[0] != 0x42 or buf[1] != 0x4D:
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = int(buf[10:14].view(np.uint32)[0])
    w = int(buf[18:22].view(np.int32)[0])
    h_raw = int(buf[22:26].view(np.int32)[0])
    bpp = int(buf[28:30].view(np.uint16)[0])
    compression = int(buf[30:34].view(np.uint32)[0])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (got bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_raw)
    row_stride = (w * 3 + 3) & ~3
    if offset + row_stride * h > len(buf):
        raise ValueError("truncated BMP payload")
    rows = buf[offset:offset + row_stride * h].reshape(h, row_stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]           # BGR → RGB
    return img[::-1] if h_raw > 0 else img                       # bottom-up


def image_features(pixels: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: 4×4 mean-pooled grayscale thumbnail in
    [0, 1] — integral-image pooling so any (h, w) divides cleanly."""
    gray = pixels.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                np.float32)
    h, w = gray.shape
    # integral image → exact mean over arbitrary (possibly uneven) cells
    ii = np.zeros((h + 1, w + 1), np.float64)
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys = np.linspace(0, h, 5).astype(np.int64)
    xs = np.linspace(0, w, 5).astype(np.int64)
    sums = (ii[ys[1:], :][:, xs[1:]] - ii[ys[:-1], :][:, xs[1:]]
            - ii[ys[1:], :][:, xs[:-1]] + ii[ys[:-1], :][:, xs[:-1]])
    areas = np.outer(ys[1:] - ys[:-1], xs[1:] - xs[:-1])
    return (sums / np.maximum(areas, 1) / 255.0).astype(np.float32).ravel()


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 image — index-take
    only, the standard thumbnail kernel when no resampling lib exists."""
    h, w = pixels.shape[:2]
    yi = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xi = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return pixels[yi][:, xi]


# --------------------------------------------------------------------- PNG
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (spec §6.6), componentwise over int32 arrays."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pcv = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pcv), a, np.where(pb <= pcv, b, c))


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (color type 2, no interlace). Per-row filter selection uses the
    spec's minimum-sum-of-absolute-differences heuristic over all five
    filter types, fully vectorized (one pass per filter over the whole
    image), so round-trip tests exercise every decoder filter path."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8 RGB")
    h, w, _ = pixels.shape
    raw = pixels.reshape(h, w * 3).astype(np.int32)
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 3:] = raw[:-1, :-3]
    cand = np.stack([
        raw,
        (raw - left) % 256,
        (raw - up) % 256,
        (raw - ((left + up) >> 1)) % 256,
        (raw - _paeth_pred(left, up, upleft)) % 256,
    ]).astype(np.uint8)                                    # (5, h, w*3)
    # minimum sum of |signed byte| per row — the reference heuristic
    mag = np.minimum(cand.astype(np.int32), 256 - cand.astype(np.int32))
    best = np.argmin(mag.sum(axis=2), axis=0)              # (h,)
    stream = np.empty((h, w * 3 + 1), np.uint8)
    stream[:, 0] = best.astype(np.uint8)
    stream[:, 1:] = cand[best, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(stream.tobytes(), level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (color type 2), non-interlaced PNG to an
    (h, w, 3) uint8 RGB array: real chunk walk with CRC verification,
    multi-IDAT concatenation, zlib inflate, and all five PNG filter
    types unfiltered. Sub is a modular per-byte-lane cumsum and Up/None
    are whole-row vector ops; Average/Paeth recover pixel-sequentially
    within a row (inherent data dependency in the format), still 3-lane
    vectorized per pixel. Other bit depths / color types / Adam7 are
    rejected loudly (palette/gray/alpha would need a fuller codec)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length:
                                             pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB",
                                                              ihdr)
    if depth != 8 or color != 2:
        raise NotImplementedError(
            f"only 8-bit truecolor PNG supported (got depth={depth}, "
            f"color_type={color}); palette/gray/alpha need a fuller codec")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 1:      # Sub: x[i] = f[i] + x[i-3] ⇒ per-lane cumsum
            rec = (cur.reshape(w, 3).cumsum(axis=0) % 256).reshape(-1)
        elif ft == 2:      # Up
            rec = (cur + prev) % 256
        elif ft == 3:      # Average — left-sequential per pixel
            rec = np.empty(stride, np.int32)
            rw = rec.reshape(w, 3)
            cl = cur.reshape(w, 3)
            pu = prev.reshape(w, 3)
            lft = np.zeros(3, np.int32)
            for x in range(w):
                lft = (cl[x] + ((lft + pu[x]) >> 1)) % 256
                rw[x] = lft
        elif ft == 4:      # Paeth — left-sequential per pixel
            rec = np.empty(stride, np.int32)
            rw = rec.reshape(w, 3)
            cl = cur.reshape(w, 3)
            pu = prev.reshape(w, 3)
            pul = np.zeros((w, 3), np.int32)
            pul[1:] = pu[:-1]
            lft = np.zeros(3, np.int32)
            for x in range(w):
                lft = (cl[x] + _paeth_pred(lft, pu[x], pul[x])) % 256
                rw[x] = lft
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an int16 mono sample array as a RIFF/WAVE PCM16 file."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.tobytes()
    n = len(data)

    def u32(x): return np.uint32(x).tobytes()
    def u16(x): return np.uint16(x).tobytes()

    return (b"RIFF" + u32(36 + n) + b"WAVE"
            + b"fmt " + u32(16) + u16(1) + u16(1) + u32(rate)
            + u32(rate * 2) + u16(2) + u16(16)
            + b"data" + u32(n) + data)


# --- G.711 companded audio (WAVE_FORMAT_ALAW=6 / WAVE_FORMAT_MULAW=7) ---
# Real compressed-audio decode: 8-bit logarithmic PCM expanded to int16
# via the ITU-T G.711 segment formulas. Decode is a 256-entry LUT take
# (vectorized); encode is the algorithmic companding, fully vectorized.
_G711_BIAS = 0x84


def _build_ulaw_lut() -> np.ndarray:
    b = np.arange(256, dtype=np.int32) ^ 0xFF          # wire bytes invert
    sign = (b & 0x80) != 0
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + _G711_BIAS) << exp) - _G711_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def _build_alaw_lut() -> np.ndarray:
    b = np.arange(256, dtype=np.int32) ^ 0x55          # even-bit toggle
    sign = (b & 0x80) != 0                             # A-law: set ⇒ POSITIVE
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


_ULAW_LUT = _build_ulaw_lut()
_ALAW_LUT = _build_alaw_lut()


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 → µ-law bytes (G.711), vectorized."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + _G711_BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)   # mag ≥ 0x84 ⇒ ≥ 7
    mant = (mag >> (exp + 3)) & 0x0F
    return ((sign | (exp << 4) | mant) ^ 0xFF).astype(np.uint8)


_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF,
                          0xFFF], np.int32)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 → A-law bytes (G.711, canonical 13-bit segment search;
    sign bit in the wire byte is 0x80^0x55 for POSITIVE), vectorized."""
    x = samples.astype(np.int32) >> 3                  # 13-bit domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, x)            # ≤ 7 (x ≤ 0xFFF)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((x >> shift) & 0x0F)
    return (aval ^ mask).astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, rate: int = 8000,
                    law: str = "ulaw") -> bytes:
    """Encode int16 mono samples as a companded G.711 RIFF/WAVE file
    (format code 7 = µ-law, 6 = A-law; 8 bits per sample — real 2:1
    compressed audio, unlike the PCM16 baseline)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_g711 expects 1-D int16 samples")
    fmt, data = ((7, ulaw_compress(samples)) if law == "ulaw"
                 else (6, alaw_compress(samples)))
    raw = data.tobytes()
    n = len(raw)

    def u32(x): return np.uint32(x).tobytes()
    def u16(x): return np.uint16(x).tobytes()

    return (b"RIFF" + u32(36 + n + (n & 1)) + b"WAVE"
            + b"fmt " + u32(16) + u16(fmt) + u16(1) + u32(rate)
            + u32(rate) + u16(1) + u16(8)
            + b"data" + u32(n) + raw + (b"\0" if n & 1 else b""))


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE mono payload → (rate, int16 samples): PCM16
    (format 1) plus real G.711 µ-law / A-law expansion (formats 7 / 6,
    8-bit companded → int16 via the ITU segment LUTs).
    Walks the chunk list properly (fmt/data may be in any order, with
    vendor chunks between); rejects other codecs and multi-channel
    loudly."""
    buf = np.frombuffer(payload, np.uint8)
    if len(buf) < 44 or bytes(buf[0:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, rate, fmt, raw = 12, None, None, None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos:pos + 4])
        size = int(buf[pos + 4:pos + 8].view(np.uint32)[0])
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int(body[0:2].view(np.uint16)[0])
            channels = int(body[2:4].view(np.uint16)[0])
            bits = int(body[14:16].view(np.uint16)[0])
            if (fmt, bits) not in ((1, 16), (6, 8), (7, 8)) or channels != 1:
                raise NotImplementedError(
                    f"only PCM16 / G.711 mono supported (fmt={fmt}, "
                    f"channels={channels}, bits={bits})")
            rate = int(body[4:8].view(np.uint32)[0])
        elif cid == b"data":
            raw = body[:size]
        pos += 8 + size + (size & 1)                             # chunks pad to even
    if rate is None or raw is None or fmt is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt == 1:
        samples = raw[:len(raw) - len(raw) % 2].view(np.int16).copy()
    elif fmt == 7:
        samples = _ULAW_LUT[raw]
    else:
        samples = _ALAW_LUT[raw]
    return rate, samples


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """16-dim audio descriptor: log-energy in 16 linear frequency bands
    of the one-sided power spectrum (numpy rFFT)."""
    x = samples.astype(np.float64) / 32768.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    edges = np.linspace(0, len(spec), FEATURE_DIM + 1).astype(np.int64)
    energy = np.add.reduceat(spec, edges[:-1])
    # reduceat on an empty segment returns the element at the index; zero
    # those explicitly (happens only for absurdly short clips)
    energy[edges[:-1] == edges[1:]] = 0.0
    return np.log1p(energy / max(len(x), 1)).astype(np.float32)


def audio_stats(rate: int, samples: np.ndarray) -> tuple[float, float, float]:
    """(duration_s, rms, dominant_freq_hz) — the classic scalar triple."""
    x = samples.astype(np.float64) / 32768.0
    dur = len(x) / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    if len(x) >= 4:
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0                                            # ignore DC
        dom = float(np.argmax(spec) * rate / len(x))
    else:
        dom = 0.0
    return dur, rms, dom


# -------------------------------------------------- conv featurizer (image)
# fixed 3×3 kernel bank: brightness, Sobel-x, Sobel-y, Laplacian — a tiny
# fixed-weight conv layer, the honest deterministic stand-in for a learned
# image encoder (the reference ran CLIP on GPU workers only, README.md:5-11)
_CONV_KERNELS = np.array([
    [[0, 0, 0], [0, 1, 0], [0, 0, 0]],
    [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
    [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
    [[0, 1, 0], [1, -4, 1], [0, 1, 0]],
], np.float32)


def conv_image_features(pixels: np.ndarray) -> np.ndarray:
    """16-dim deterministic conv descriptor: the 4 fixed kernels above
    convolved over the grayscale image (edge-padded; conv as 9 shifted
    vector adds), |response| mean-pooled over a 2×2 spatial grid →
    4 kernels × 4 cells. Unlike :func:`image_features` (a raw thumbnail),
    this is the model-inference shape: fixed weights, conv, nonlinearity,
    spatial pooling."""
    gray = (pixels.astype(np.float32)
            @ np.array([0.299, 0.587, 0.114], np.float32)) / 255.0
    h, w = gray.shape
    g = np.pad(gray, 1, mode="edge")
    ys = np.linspace(0, h, 3).astype(np.int64)
    xs = np.linspace(0, w, 3).astype(np.int64)
    feats = np.empty(16, np.float32)
    i = 0
    for ker in _CONV_KERNELS:
        acc = np.zeros((h, w), np.float32)
        for dy in range(3):
            for dx in range(3):
                if ker[dy, dx]:
                    acc += ker[dy, dx] * g[dy:dy + h, dx:dx + w]
        np.abs(acc, out=acc)
        for a in range(2):
            for b in range(2):
                cell = acc[ys[a]:ys[a + 1], xs[b]:xs[b + 1]]
                feats[i] = cell.mean() if cell.size else 0.0
                i += 1
    return feats


# -------------------------------------------------------------------- sniff
def sniff_format(payload: bytes) -> str:
    """Magic-byte format sniffing (the real thing, not an extension map)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


# -------------------------------------------------------------------- MJPEG
# Raw MJPEG video = back-to-back baseline JPEG frames (the wire format of
# motion-JPEG streams; no container). Nominal frame rate for duration /
# timestamp math — raw MJPEG carries no timing, the container would.
MJPEG_FRAME_MS = 100  # 10 fps nominal


def encode_mjpeg(frames, quality: int = 90) -> bytes:
    """Encode a sequence of (h, w, 3) uint8 RGB frames as a raw MJPEG
    clip: each frame a complete baseline JPEG stream, concatenated."""
    if len(frames) == 0:
        raise ValueError("empty frame sequence")
    return b"".join(encode_jpeg(f, quality) for f in frames)


def sniff_clip(payload: bytes):
    """Return the per-frame byte strings if ``payload`` is a multi-frame
    MJPEG clip, else ``None`` (single JPEG images and every other format
    return None). Uses the structural marker walk, never a byte scan."""
    if sniff_format(payload) != "jpeg":
        return None
    try:
        frames = split_mjpeg(payload)
    except ValueError:
        return None
    return frames if len(frames) > 1 else None


def clip_luma_frames(frames: list[bytes], stride: int = 1) -> np.ndarray:
    """Decode every ``stride``-th frame of an MJPEG clip to a stacked
    (n, h, w) float64 luminance array (Rec. 601 luma, the decoder's own
    color basis). Raises if sampled frames disagree on dimensions —
    MJPEG streams are fixed-geometry by construction."""
    sampled = [decode_jpeg(frames[i]).astype(np.float64)
               for i in range(0, len(frames), max(1, stride))]
    shapes = {s.shape for s in sampled}
    if len(shapes) != 1:
        raise ValueError(f"MJPEG frame geometry varies: {sorted(shapes)}")
    rgb = np.stack(sampled)                          # (n, h, w, 3)
    return rgb @ np.array([0.299, 0.587, 0.114])     # (n, h, w) luma
