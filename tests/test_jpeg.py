"""Baseline JPEG codec tests (functions/jpeg.py): layer-by-layer exactness
for the lossless layers (zigzag, DCT basis, magnitude coding, Huffman
bitstream), quantization-bounded round trips for the lossy whole, format
rejection edges, and the stage integration point."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_server_ray.functions.jpeg import (
    _AC_LUMA_BITS, _AC_LUMA_VALS, _BitReader, _BitWriter, _DC_LUMA_BITS,
    _DC_LUMA_VALS, _DCT, _extend, _huffman_codes, _huffman_decode_table,
    _mag_bits, _marker, _quality_tables, _split_scan, _UNZZ, _ZZ,
    decode_jpeg, encode_jpeg)
from crawlingathome_server_ray.functions.media import sniff_format


def _gradient_image(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) % 256
    img = np.stack([base, (base + int(rng.integers(0, 64))) % 256,
                    rng.integers(0, 256, size=(h, w))], axis=2)
    return img.astype(np.uint8)


# ---------------------------------------------------------- lossless layers
def test_zigzag_is_spec_order_and_a_permutation():
    # T.81 figure 5: the first entries, by heart; the scan must end at
    # (7,7) and be a permutation of the block
    assert _ZZ[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZZ[-6:].tolist() == [61, 54, 47, 55, 62, 63]
    assert sorted(_ZZ.tolist()) == list(range(64))
    assert np.array_equal(_ZZ[_UNZZ], np.arange(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)
    # DC basis row is the constant vector
    assert np.allclose(_DCT[0], np.sqrt(1 / 8))


@given(st.integers(-32768, 32767))
def test_magnitude_coding_roundtrip(v):
    size, raw = _mag_bits(v)
    assert _extend(raw, size) == v
    if v:
        assert size == int(abs(v)).bit_length()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 11), min_size=1, max_size=200),
       st.integers(0, 2**32 - 1))
def test_huffman_bitstream_roundtrip(symbols, seed):
    """Encoder's writer + decoder's reader recover the exact symbol and
    raw-bit sequence through stuffing and 1-padding."""
    rng = np.random.default_rng(seed)
    enc = _huffman_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dec = _huffman_decode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    w = _BitWriter()
    raws = []
    for s in symbols:
        code, ln = enc[s]
        w.put(code, ln)
        raw = int(rng.integers(0, 1 << s)) if s else 0
        raws.append(raw)
        w.put(raw, s)
    data = w.flush()
    assert b"\xff" not in data.replace(b"\xff\x00", b"")  # stuffing held
    r = _BitReader(data.replace(b"\xff\x00", b"\xff"))
    for s, raw in zip(symbols, raws):
        assert r.huff(dec) == s
        assert r.read(s) == raw


def test_annex_k_tables_wellformed():
    for bits, vals in ((_DC_LUMA_BITS, _DC_LUMA_VALS),
                       (_AC_LUMA_BITS, _AC_LUMA_VALS)):
        assert sum(bits) == len(vals)
        codes = _huffman_codes(bits, vals)
        # canonical codes are prefix-free: no code is a prefix of another
        items = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(items):
            for c2, l2 in items[i + 1:]:
                assert (c2 >> (l2 - l1)) != c1
    assert len(_AC_LUMA_VALS) == 162
    assert 0xF0 in _AC_LUMA_VALS and 0x00 in _AC_LUMA_VALS


def test_quality_tables_scale():
    q50_l, q50_c = _quality_tables(50)
    assert q50_l[0] == 16 and q50_c[0] == 17          # Annex K at q=50
    q100_l, q100_c = _quality_tables(100)
    assert (q100_l == 1).all() and (q100_c == 1).all()
    q10_l, _ = _quality_tables(10)
    assert (q10_l >= q50_l).all() and q10_l.max() <= 255


def test_split_scan_unstuffs_and_splits_restarts():
    data = b"\xaa\xff\x00\xbb\xff\xd0\xcc\xff\xd7\xdd\xff\xd9"
    segs, pos = _split_scan(data, 0)
    assert segs == [b"\xaa\xff\xbb", b"\xcc", b"\xdd"]
    assert data[pos:pos + 2] == b"\xff\xd9"


# ------------------------------------------------------------- round trips
@settings(max_examples=12, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_roundtrip_q100_tight(w, h, seed):
    """At quality 100 every quant step is 1 — the only loss is DCT/YCbCr
    rounding, bounded by a few counts per channel."""
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)
    p = encode_jpeg(img, 100)
    assert sniff_format(p) == "jpeg"
    out = decode_jpeg(p)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=8, deadline=None)
@given(st.integers(9, 48), st.integers(9, 48), st.integers(0, 2**32 - 1))
def test_roundtrip_q90_structured(w, h, seed):
    img = _gradient_image(h, w, seed)
    out = decode_jpeg(encode_jpeg(img, 90))
    err = np.abs(out.astype(int) - img.astype(int))
    # gradient channels reconstruct tightly; the noise channel is bounded
    # by the quantization step of the high-frequency table entries
    assert err.mean() < 8 and err.max() < 64


def test_quality_tradeoff_monotone():
    img = _gradient_image(40, 40, 3)
    sizes, errs = [], []
    for q in (100, 90, 50, 10):
        p = encode_jpeg(img, q)
        sizes.append(len(p))
        errs.append(np.abs(decode_jpeg(p).astype(int)
                           - img.astype(int)).mean())
    assert sizes == sorted(sizes, reverse=True)   # lower q → smaller file
    assert errs == sorted(errs)                   # lower q → more error


def test_deterministic_bitstream():
    img = _gradient_image(24, 24, 0)
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90)


def test_block_edge_sizes():
    for h, w in ((1, 1), (8, 8), (7, 9), (16, 5), (9, 24)):
        img = np.random.default_rng(h * 64 + w).integers(
            0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 100))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_grayscale_single_component_decodes():
    """A 1-component baseline stream (built from the codec's own marker
    layer) decodes to replicated-gray RGB."""
    from crawlingathome_server_ray.functions import jpeg as J
    img = _gradient_image(17, 13, 5)
    gray = (J._rgb_to_ycbcr(img)[..., 0])
    qt, _ = J._quality_tables(100)
    zz = J._quantized_zigzag(gray, qt)
    dc = J._huffman_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
    ac = J._huffman_codes(J._AC_LUMA_BITS, J._AC_LUMA_VALS)
    wtr = _BitWriter()
    pred = 0
    for b in range(zz.shape[0]):
        pred = J._encode_block(wtr, zz[b], pred, dc, ac)
    sof = struct.pack(">BHHB", 8, 17, 13, 1) + bytes([1, 0x11, 0])
    payload = (b"\xff\xd8"
               + _marker(0xDB, b"\x00" + bytes(qt[_ZZ].tolist()))
               + _marker(0xC0, sof)
               + _marker(0xC4, bytes([0x00]) + bytes(J._DC_LUMA_BITS)
                         + bytes(J._DC_LUMA_VALS))
               + _marker(0xC4, bytes([0x10]) + bytes(J._AC_LUMA_BITS)
                         + bytes(J._AC_LUMA_VALS))
               + _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
               + wtr.flush() + b"\xff\xd9")
    out = decode_jpeg(payload)
    assert out.shape == (17, 13, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.abs(out[..., 0].astype(float) - gray).max() <= 4


# ------------------------------------------------------------- reject edges
def test_rejects_unsupported_loudly():
    img = _gradient_image(16, 16, 1)
    p = bytearray(encode_jpeg(img, 90))

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all" * 4)
    with pytest.raises(ValueError):               # truncated scan
        decode_jpeg(bytes(p[:len(p) // 2]))

    sof_at = bytes(p).find(b"\xff\xc0")
    prog = p.copy()
    prog[sof_at + 1] = 0xC2                       # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))

    sub = p.copy()
    sub[sof_at + 11] = 0x22                       # Y sampling 2x2 (4:2:0)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))

    dqt_at = bytes(p).find(b"\xff\xdb")
    wide = p.copy()
    wide[dqt_at + 4] = 0x10                       # 16-bit quant table
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(wide))


def test_stage_integration_jpeg():
    from crawlingathome_server_ray.stages.multimodal import (DecodeStage,
                                                             _IMAGE_CODECS)
    import pyarrow as pa
    assert _IMAGE_CODECS["jpeg"] == (decode_jpeg, encode_jpeg)
    img = _gradient_image(20, 30, 9)
    t = pa.table({"html": pa.array([encode_jpeg(img, 90)], pa.binary())})
    out = DecodeStage(column="html", fake=False)(t)
    assert out.column("format")[0].as_py() == "jpeg"
    assert out.column("width")[0].as_py() == 30
    assert out.column("height")[0].as_py() == 20
