"""Baseline JPEG codec, pure numpy + stdlib (ITU-T T.81 / ISO 10918-1).

The last compressed image format the container can honestly support:
baseline sequential DCT, 8-bit, Huffman-coded, 4:4:4 (no chroma
subsampling) color or single-component grayscale. The encoder emits the
full real format — JFIF-compatible marker stream, Annex K.1/K.2
quantization tables scaled by the libjpeg quality formula, Annex K.3
Huffman tables, zigzag + DPCM DC + run-length AC entropy coding with
0xFF byte stuffing. The decoder parses the actual marker stream (DQT /
SOF0 / DHT / DRI / SOS), builds canonical Huffman code tables from the
file's own DHT segments (NOT the hardcoded Annex K tables — any
conformant baseline 4:4:4 stream decodes), entropy-decodes the scan
with restart-marker support, then dequantizes and inverse-DCTs all
blocks in one vectorized einsum.

Hot-path shape: the DCT/IDCT, quantization, zigzag and color transforms
are whole-image numpy; the entropy coder is a per-symbol Python loop —
inherent to Huffman's bit-serial data dependency (same caveat as PNG's
Paeth filter in media.py) and bounded by payload size, not corpus size.

Progressive (SOF2), arithmetic coding, 12-bit precision and subsampled
(4:2:0 / 4:2:2) scans are rejected loudly with NotImplementedError —
the honest capability edge, matching the BMP/PNG/WAV codecs' policy.

Reference analog: none — the reference coordinator never touches payload
bytes (media ran on GPU workers, reference README.md:5-11); this closes
the compressed-image gap in the brief's multimodal ask.
"""

from __future__ import annotations

import re
import struct
from functools import lru_cache

import numpy as np

# ------------------------------------------------------------- constants
# Annex K.1 / K.2 base quantization tables (row-major 8x8)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Annex K.3 Huffman table specs: (bits[16] = code count per length 1..16,
# values in code order)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag() -> np.ndarray:
    """Zigzag scan order: index k -> row-major position (T.81 fig. 5)."""
    pos = [(y, x) for y in range(8) for x in range(8)]
    pos.sort(key=lambda p: (p[0] + p[1],
                            p[1] if (p[0] + p[1]) % 2 == 0 else p[0]))
    return np.array([y * 8 + x for y, x in pos], np.int64)


_ZZ = _zigzag()                 # zigzag index k -> row-major index
_UNZZ = np.argsort(_ZZ)         # row-major index -> zigzag index


def _dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    m = np.sqrt(0.25) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] = np.sqrt(0.125)
    return m


_DCT = _dct_matrix()            # coeffs = _DCT @ block @ _DCT.T


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Scale the Annex K tables by the libjpeg quality formula."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * s + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


@lru_cache(maxsize=64)
def _huffman_lut(bits: tuple, vals: tuple) -> tuple[bytes, bytes]:
    """16-bit-peek decode LUT (the classic libjpeg structure): index the
    next 16 bits of the stream, read (symbol, code length) in one lookup.
    Each code of length L owns a 2^(16-L) slice. len==0 marks an invalid
    code. Stored as ``bytes`` — CPython's fastest constant-time indexed
    read — and cached per table content, so identical DHT segments
    across payloads (the common case in a crawl) build the table once."""
    sym = np.zeros(1 << 16, np.uint8)
    ln = np.zeros(1 << 16, np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            sym[start:start + (1 << (16 - length))] = vals[k]
            ln[start:start + (1 << (16 - length))] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tobytes(), ln.tobytes()


def _huffman_decode_table(bits: list[int],
                          vals: list[int]) -> tuple[bytes, bytes]:
    """Decoder-side table for a DHT segment (the peek LUT)."""
    return _huffman_lut(tuple(bits), tuple(vals))


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category coding: value -> (size, raw bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _extend(raw: int, size: int) -> int:
    """Inverse of _mag_bits (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)       # pad with 1-bits (T.81 F.1.2.3)
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over unstuffed scan bytes: a small integer
    accumulator refilled a byte at a time, with 16-bit peeks against the
    Huffman LUT. Peeks past the real end see virtual zero padding (legal
    — the final byte's 1-padding is peeked, never consumed); CONSUMING
    past the end raises, so truncated streams fail loudly instead of
    decoding padding as data.

    This is the readable reference twin, kept for the bitstream
    round-trip tests; the decode hot path is the same algorithm inlined
    with local-variable state in :func:`_entropy_decode`."""

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = 8 * len(data)
        self.bitpos = 0                        # consumed bits
        self.bytepos = 0
        self.acc = 0                           # low self.n bits are valid
        self.n = 0

    def _fill(self, need: int) -> None:
        data = self.data
        bp = self.bytepos
        while self.n < need:
            if bp < len(data):
                self.acc = (self.acc << 8) | data[bp]
                bp += 1
            else:
                self.acc <<= 8                 # virtual padding: peek only
            self.n += 8
        self.bytepos = bp

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill(k)
        self.bitpos += k
        if self.bitpos > self.nbits:
            raise ValueError("truncated JPEG entropy-coded segment")
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: tuple[np.ndarray, np.ndarray]) -> int:
        sym, ln = table
        if self.n < 16:
            self._fill(16)
        peek = (self.acc >> (self.n - 16)) & 0xFFFF
        length = int(ln[peek])
        if length == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.bitpos += length
        if self.bitpos > self.nbits:
            raise ValueError("truncated JPEG entropy-coded segment")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return int(sym[peek])


# ---------------------------------------------------------------- encoder
def _rgb_to_ycbcr(pixels: np.ndarray) -> np.ndarray:
    x = pixels.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks, 8, 8), edge-padded to 8x8 tiles,
    blocks in raster (row-major) order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _quantized_zigzag(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Whole-plane forward path: level shift, 8x8 DCT, quantize, zigzag.
    Returns (n_blocks, 64) int32 coefficients in zigzag order."""
    blocks = _component_blocks(plane) - 128.0
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = np.round(coeffs / qtbl.reshape(8, 8).astype(np.float64))
    return q.reshape(-1, 64)[:, _ZZ].astype(np.int32)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    size, raw = _mag_bits(dc - pred)
    code, ln = dc_codes[size]
    w.put(code, ln)
    w.put(raw, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]          # ZRL: 16 zeros
            w.put(code, ln)
            run -= 16
        size, raw = _mag_bits(v)
        code, ln = ac_codes[(run << 4) | size]
        w.put(code, ln)
        w.put(raw, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]              # EOB
        w.put(code, ln)
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline sequential JPEG
    (4:4:4, Annex K quantization tables at ``quality``, Annex K.3 Huffman
    tables). The DCT/quantize/zigzag path is whole-image numpy; only the
    Huffman bit emission is per-symbol."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("JPEG dimensions must be in 1..65535")
    qt_l, qt_c = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(pixels)
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    zz = [_quantized_zigzag(p, qt_l if i == 0 else qt_c)
          for i, p in enumerate(planes)]

    dc_l = _huffman_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _huffman_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_l = _huffman_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    ac_c = _huffman_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0, 0, 0]
    for b in range(zz[0].shape[0]):            # interleaved 4:4:4 MCUs
        for ci in range(3):
            preds[ci] = _encode_block(
                writer, zz[ci][b], preds[ci],
                dc_l if ci == 0 else dc_c, ac_l if ci == 0 else ac_c)
    scan = writer.flush()

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([cls << 4 | tid]) + bytes(bits)
                       + bytes(vals))

    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])          # h=v=1: 4:4:4
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (b"\xff\xd8"                                           # SOI
            + _marker(0xDB, b"\x00" + bytes(qt_l[_ZZ].tolist()))  # DQT 0
            + _marker(0xDB, b"\x01" + bytes(qt_c[_ZZ].tolist()))  # DQT 1
            + _marker(0xC0, sof)                                  # SOF0
            + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + _marker(0xDA, sos)                                  # SOS
            + scan
            + b"\xff\xd9")                                        # EOI


# ---------------------------------------------------------------- decoder
def _entropy_decode(data: bytes, tables: list, zz: np.ndarray,
                    mcu0: int, mcu1: int, preds: list[int]) -> None:
    """Entropy-decode MCUs [mcu0, mcu1) of one restart segment into
    ``zz[ci, mcu]`` (zigzag int32 blocks), updating ``preds`` in place.

    One flat loop with the bit accumulator and both LUTs in locals —
    Huffman decode is inherently bit-serial (each symbol's length gates
    the next symbol's position), so this per-symbol loop is the honest
    minimum; everything around it (dequantize, IDCT, color) is
    vectorized over all blocks at once. Peeks past the real end see
    virtual zero padding (the final byte's 1-padding is peeked, never
    consumed); consuming past the end raises, so truncated streams fail
    loudly instead of decoding padding as data."""
    acc = 0           # bit accumulator; low `navail` bits are valid
    navail = 0
    bitpos = 0        # consumed bits (vs nbits: truncation check)
    bytepos = 0
    nd = len(data)
    nbits = 8 * nd
    for mcu in range(mcu0, mcu1):
        for ci, (dc_sym, dc_len, ac_sym, ac_len) in enumerate(tables):
            blk = zz[ci, mcu]
            # ---- DC: huff(size) + receive/extend
            while navail < 16:
                if bytepos < nd:
                    acc = (acc << 8) | data[bytepos]
                    bytepos += 1
                else:
                    acc <<= 8
                navail += 8
            peek = (acc >> (navail - 16)) & 0xFFFF
            length = dc_len[peek]
            if length == 0:
                raise ValueError("invalid JPEG Huffman code")
            navail -= length
            bitpos += length
            acc &= (1 << navail) - 1
            size = dc_sym[peek]
            if size:
                while navail < size:
                    if bytepos < nd:
                        acc = (acc << 8) | data[bytepos]
                        bytepos += 1
                    else:
                        acc <<= 8
                    navail += 8
                navail -= size
                bitpos += size
                raw = (acc >> navail) & ((1 << size) - 1)
                acc &= (1 << navail) - 1
                diff = raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1
            else:
                diff = 0
            pred = preds[ci] + diff
            preds[ci] = pred
            blk[0] = pred
            # ---- 63 AC coefficients: (run, size) symbols
            k = 1
            while k < 64:
                while navail < 16:
                    if bytepos < nd:
                        acc = (acc << 8) | data[bytepos]
                        bytepos += 1
                    else:
                        acc <<= 8
                    navail += 8
                peek = (acc >> (navail - 16)) & 0xFFFF
                length = ac_len[peek]
                if length == 0:
                    raise ValueError("invalid JPEG Huffman code")
                navail -= length
                bitpos += length
                acc &= (1 << navail) - 1
                rs = ac_sym[peek]
                size = rs & 0x0F
                if size == 0:
                    if rs == 0xF0:             # ZRL: 16 zeros
                        k += 16
                        continue
                    break                      # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("JPEG AC run past end of block")
                while navail < size:
                    if bytepos < nd:
                        acc = (acc << 8) | data[bytepos]
                        bytepos += 1
                    else:
                        acc <<= 8
                    navail += 8
                navail -= size
                bitpos += size
                raw = (acc >> navail) & ((1 << size) - 1)
                acc &= (1 << navail) - 1
                blk[k] = (raw if raw >= (1 << (size - 1))
                          else raw - (1 << size) + 1)
                k += 1
            if bitpos > nbits:
                raise ValueError("truncated JPEG entropy-coded segment")


# first 0xFF that is neither a stuffed zero nor a restart marker = scan end
_SCAN_END = re.compile(rb"\xff(?=[^\x00\xd0-\xd7])", re.DOTALL)
_RST = re.compile(rb"\xff[\xd0-\xd7]")


def _split_scan(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded data from ``start``, unstuffing 0xFF00 and
    splitting at restart markers; returns (segments, next marker pos).
    All three passes (find scan end, split at RSTn, unstuff) run as
    C-level regex/replace over the whole scan, not a per-byte loop."""
    m = _SCAN_END.search(payload, start)
    end = m.start() if m else len(payload)
    return [s.replace(b"\xff\x00", b"\xff")
            for s in _RST.split(payload[start:end])], end


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (8-bit, Huffman, 4:4:4 color or
    grayscale) to an (h, w, 3) uint8 RGB array. Real marker walk; Huffman
    tables come from the file's DHT segments; dequantize + IDCT run as
    one einsum over all blocks. Progressive / arithmetic / 12-bit /
    subsampled streams are rejected loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker stream out of sync")
        tag = payload[i + 1]
        if tag == 0xD9:                        # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
        body = payload[i + 4:i + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if tag == 0xDB:                        # DQT (possibly multi-table)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables "
                                              "not supported")
                t = np.frombuffer(body[j + 1:j + 65], np.uint8)
                qtables[tq] = t.astype(np.int32)[_UNZZ]   # -> row-major
                j += 65
        elif tag == 0xC4:                      # DHT (possibly multi-table)
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                htables[(cls, tid)] = _huffman_decode_table(bits, vals)
                j += 17 + nv
        elif tag == 0xC0 or tag == 0xC1:       # SOF0/1: baseline sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (4:2:0 / 4:2:2) not supported — "
                        "only 4:4:4 and grayscale decode here")
                comps.append((cid, tq))
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG not "
                                          "supported")
            frame = (fh, fw, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential Huffman JPEG (SOF0/SOF1) is "
                f"supported (got SOF marker 0xFF{tag:02X})")
        elif tag == 0xDD:                      # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:                      # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            segs, i = _split_scan(payload, i + 2 + seglen)
            return _decode_scan(frame, scan_comps, qtables, htables,
                                segs, restart_interval)
        i += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def frame_end(payload: bytes, start: int = 0) -> int:
    """Offset just past the EOI of the JPEG frame starting at ``start``.

    Structural marker walk — segments are skipped by their length field
    and entropy-coded data via the same stuffed-FF/RST-aware scan the
    decoder uses, so a raw ``0xFFD9`` byte pair inside a DQT/DHT body or
    stuffed entropy data can never be mistaken for the end of frame
    (a naive ``find(b"\\xff\\xd9")`` would be)."""
    if payload[start:start + 2] != b"\xff\xd8":
        raise ValueError("not a JPEG frame (missing SOI)")
    i = start + 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker stream out of sync")
        tag = payload[i + 1]
        if tag == 0xD9:                                  # EOI
            return i + 2
        if tag == 0x01 or 0xD0 <= tag <= 0xD8:           # bodiless markers
            i += 2
            continue
        if i + 4 > n:
            break
        (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
        if tag == 0xDA:                                  # SOS: skip entropy
            m = _SCAN_END.search(payload, i + 2 + seglen)
            i = m.start() if m else n
            continue
        i += 2 + seglen
    raise ValueError("JPEG frame missing EOI")


def split_frames(payload: bytes) -> list[bytes]:
    """Split a raw MJPEG stream — back-to-back baseline JPEG frames, the
    wire format of motion-JPEG video — into its frame byte strings.
    A single JPEG image comes back as a one-element list. Strict: any
    bytes that are not a well-formed frame raise (a 100-TB crawl's
    undecodable clips are the caller's policy, same as decode_jpeg)."""
    frames: list[bytes] = []
    i, n = 0, len(payload)
    while i < n:
        j = frame_end(payload, i)
        frames.append(payload[i:j])
        i = j
    if not frames:
        raise ValueError("empty MJPEG payload")
    return frames


def _decode_scan(frame, scan_comps, qtables, htables, segs,
                 restart_interval) -> np.ndarray:
    fh, fw, comps = frame
    nc = len(comps)
    if len(scan_comps) != nc:
        raise NotImplementedError("multi-scan JPEG not supported")
    bh, bw = (fh + 7) // 8, (fw + 7) // 8
    n_mcu = bh * bw
    zz = np.zeros((nc, n_mcu, 64), np.int32)
    dc_tbls, ac_tbls, cqt = [], [], []
    by_id = dict((cid, tq) for cid, tq in comps)
    for cs, dct, act in scan_comps:
        if (0, dct) not in htables or (1, act) not in htables:
            raise ValueError("JPEG scan references missing Huffman table")
        dc_tbls.append(htables[(0, dct)])
        ac_tbls.append(htables[(1, act)])
        tq = by_id[cs]
        if tq not in qtables:
            raise ValueError("JPEG frame references missing quant table")
        cqt.append(qtables[tq])

    tables = [(dc_tbls[ci][0], dc_tbls[ci][1],
               ac_tbls[ci][0], ac_tbls[ci][1]) for ci in range(nc)]
    mcu = 0
    for seg in segs:
        if mcu >= n_mcu:
            break
        seg_end = (min(n_mcu, mcu + restart_interval)
                   if restart_interval else n_mcu)
        _entropy_decode(seg, tables, zz, mcu, seg_end, [0] * nc)
        mcu = seg_end
    if mcu < n_mcu:
        raise ValueError("JPEG scan ended before all MCUs decoded")

    # vectorized dequantize + inverse zigzag + IDCT over every block
    planes = []
    for ci in range(nc):
        coeffs = (zz[ci][:, _UNZZ].astype(np.float64)
                  * cqt[ci][np.newaxis].astype(np.float64)).reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _DCT, coeffs, _DCT) + 128.0
        plane = (blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        planes.append(plane[:fh, :fw])
    if nc == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
