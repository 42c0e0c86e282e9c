"""Real multimodal codec + stage tests (functions/media.py,
stages/multimodal.py real paths, pipelines/media_queries.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_server_ray.functions.media import (
    FEATURE_DIM, _paeth_pred, _png_chunk, _PNG_SIG, audio_features,
    audio_stats, decode_bmp, decode_jpeg, decode_png, decode_wav,
    encode_bmp, encode_png, encode_wav, image_features, resize_nearest,
    sniff_format)

_IMAGE_DECODERS = {"bmp": decode_bmp, "png": decode_png,
                   "jpeg": decode_jpeg}
from crawlingathome_server_ray.sources.media_synth import generate_media

SF = "/root/testdata/sf0.001"


def _decode_png_scalar(payload: bytes) -> np.ndarray:
    """Per-pixel reference PNG decoder straight from the spec (twin for
    the vectorized decoder; deliberately naive)."""
    import struct
    import zlib
    assert payload[:8] == _PNG_SIG
    pos = 8
    ihdr, idat = None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    w, h, *_ = struct.unpack(">IIBBBBB", ihdr)
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        for i in range(stride):
            x = line[i]
            a = out[y, i - 3] if i >= 3 else 0
            b = out[y - 1, i] if y >= 1 else 0
            c = out[y - 1, i - 3] if (y >= 1 and i >= 3) else 0
            if ft == 1:
                x += a
            elif ft == 2:
                x += b
            elif ft == 3:
                x += (a + b) // 2
            elif ft == 4:
                x += paeth(a, b, c)
            out[y, i] = x % 256
    return out.astype(np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ codecs
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@given(st.integers(1, 5000), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip(n, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    rate, out = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(out, samples)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
       st.integers(0, 3))
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_and_scalar_twin(w, h, seed, kind):
    """encode→decode is the identity AND the vectorized decoder equals a
    per-pixel spec-literal twin, over image classes that steer the
    filter heuristic to different filters (noise→None/Paeth,
    gradient→Sub/Paeth, constant/stripes→Up)."""
    rng = np.random.default_rng(seed)
    if kind == 0:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    elif kind == 1:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 5) % 256, (yy * 3) % 256,
                        (xx + yy) % 256], axis=2).astype(np.uint8)
    elif kind == 2:
        img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
    else:
        img = np.tile(rng.integers(0, 256, size=(1, w, 3)),
                      (h, 1, 1)).astype(np.uint8)
    p = encode_png(img)
    assert sniff_format(p) == "png"
    assert np.array_equal(decode_png(p), img)
    assert np.array_equal(_decode_png_scalar(p), img)


def test_png_every_filter_type_and_multi_idat():
    """Hand-built streams force each of the 5 PNG filter types through
    the decoder; a split-IDAT payload must concatenate (spec-legal)."""
    import struct
    import zlib
    rng = np.random.default_rng(3)
    h, w = 7, 11
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = img.reshape(h, w * 3).astype(np.int32)
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, 3:] = raw[:-1, :-3]
    filtered = [raw, (raw - left) % 256, (raw - up) % 256,
                (raw - ((left + up) >> 1)) % 256,
                (raw - _paeth_pred(left, up, ul)) % 256]
    for ft, f in enumerate(filtered):
        stream = np.empty((h, w * 3 + 1), np.uint8)
        stream[:, 0] = ft
        stream[:, 1:] = f.astype(np.uint8)
        payload = (_PNG_SIG
                   + _png_chunk(b"IHDR",
                                struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                   + _png_chunk(b"IDAT", zlib.compress(stream.tobytes()))
                   + _png_chunk(b"IEND", b""))
        assert np.array_equal(decode_png(payload), img), ft
        assert np.array_equal(_decode_png_scalar(payload), img), ft
    # multi-IDAT: split the compressed stream across two chunks
    p = encode_png(img)
    (ilen,) = struct.unpack(">I", p[33:37])
    idat_body = p[41:41 + ilen]
    split = (p[:33] + _png_chunk(b"IDAT", idat_body[:7])
             + _png_chunk(b"IDAT", idat_body[7:]) + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(split), img)


def test_png_rejects_unsupported_and_corrupt():
    import struct
    import zlib
    img = np.zeros((2, 2, 3), np.uint8)
    p = encode_png(img)
    # corrupt a CRC byte → loud failure, not garbage pixels
    bad = bytearray(p)
    bad[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"not a png" * 8)
    # grayscale (color type 0) and 16-bit are declared unsupported
    for depth, color in [(8, 0), (16, 2), (8, 3), (8, 6)]:
        hdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, 0)
        payload = (_PNG_SIG + _png_chunk(b"IHDR", hdr)
                   + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
                   + _png_chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(payload)


def test_bmp_row_padding_and_orientation():
    # w=3 → row stride 12 (9 data + 3 pad); pixel (0,0) is written LAST
    # (bottom-up) — a decoder that ignores either fails this
    img = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    payload = encode_bmp(img)
    assert len(payload) == 54 + 12 * 3
    assert np.array_equal(decode_bmp(payload), img)


def test_wav_chunk_walk_tolerates_vendor_chunks():
    samples = np.arange(100, dtype=np.int16)
    p = bytearray(encode_wav(samples, 8000))
    # splice a vendor chunk between fmt and data (spec-legal)
    fmt_end = 12 + 8 + 16
    vendor = b"LIST" + np.uint32(4).tobytes() + b"INFO"
    spliced = bytes(p[:fmt_end]) + vendor + bytes(p[fmt_end:])
    rate, out = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, samples)


# ------------------------------------------------------------------- MJPEG
def _motion_clip(n_frames=5, h=20, w=28, dx=2, seed=3, quality=90):
    from crawlingathome_server_ray.functions.media import encode_mjpeg
    rng = np.random.default_rng(seed)
    base = (np.mgrid[0:h, 0:w][1] * 9 % 256)
    noise = rng.integers(0, 256, size=(h, w))
    frames = [np.stack([np.roll(base, dx * k, axis=1),
                        (np.roll(base, dx * k, axis=1) + 32) % 256,
                        noise], axis=2).astype(np.uint8)
              for k in range(n_frames)]
    return encode_mjpeg(frames, quality), frames


@settings(max_examples=12, deadline=None)
@given(n=st.integers(2, 6), q=st.integers(25, 100), seed=st.integers(0, 99))
def test_mjpeg_split_structural(n, q, seed):
    """split_mjpeg recovers exactly the encoded frame boundaries — for
    random noise frames too, whose entropy streams are dense with stuffed
    0xFF bytes that a naive find(b'\\xff\\xd9') scan could trip on."""
    from crawlingathome_server_ray.functions.jpeg import encode_jpeg
    from crawlingathome_server_ray.functions.media import split_mjpeg
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (12, 12, 3)).astype(np.uint8)
              for _ in range(n)]
    encoded = [encode_jpeg(f, q) for f in frames]
    parts = split_mjpeg(b"".join(encoded))
    assert parts == encoded  # byte-exact frame boundaries


def test_mjpeg_split_roundtrip_and_errors():
    from crawlingathome_server_ray.functions.media import (decode_jpeg,
                                                           encode_jpeg,
                                                           sniff_clip,
                                                           split_mjpeg)
    clip, frames = _motion_clip()
    parts = split_mjpeg(clip)
    assert len(parts) == 5
    for f, p in zip(frames, parts):
        assert np.array_equal(decode_jpeg(p), decode_jpeg(encode_jpeg(f)))
    # a single image is not a clip
    single = encode_jpeg(frames[0])
    assert sniff_clip(single) is None
    assert split_mjpeg(single) == [single]
    assert sniff_clip(b"\x89PNG\r\n\x1a\nrest") is None
    # strictness: trailing garbage / truncation raise
    with pytest.raises(ValueError):
        split_mjpeg(clip + b"garbage")
    with pytest.raises(ValueError):
        split_mjpeg(clip[:-1])
    with pytest.raises(ValueError):
        split_mjpeg(b"")


def test_frame_sample_stage_video_motion(ray_session):
    import pyarrow as pa

    from crawlingathome_server_ray.functions.media import (MJPEG_FRAME_MS,
                                                           encode_mjpeg)
    from crawlingathome_server_ray.stages.multimodal import FrameSampleStage

    moving, frames = _motion_clip(n_frames=6, dx=3)
    still = encode_mjpeg([frames[0]] * 6)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([moving, still], pa.binary())})
    out = FrameSampleStage(column="payload", real=True, id_col="media_id",
                           stride=2)(t).to_pandas()
    # stride 2 over 6 frames → samples at 0/200/400 ms per clip
    for mid in (1, 2):
        assert (out[out["media_id"] == mid]["frame_ms"].tolist()
                == [0, 2 * MJPEG_FRAME_MS, 4 * MJPEG_FRAME_MS])
    mov = out[out["media_id"] == 1]["frame_rms"].to_numpy()
    stl = out[out["media_id"] == 2]["frame_rms"].to_numpy()
    assert mov[0] == 0.0 and (mov[1:] > 0.01).all()   # real motion
    assert np.allclose(stl, 0.0)                      # identical frames
    # stride 1 emits every frame
    out1 = FrameSampleStage(column="payload", real=True, id_col="media_id",
                            stride=1)(t)
    assert out1.num_rows == 12


def test_media_clip_motion_query(ray_session):
    from crawlingathome_server_ray.pipelines.media_queries import (
        media_ds, q_media_clip_motion)
    n_vid = media_ds(SF).to_pandas()["kind"].eq("video").sum()
    out = q_media_clip_motion(SF).to_pandas()
    assert set(out.columns) == {"media_id", "n_frames", "duration_ms",
                                "max_motion", "mean_motion"}
    assert len(out) == n_vid > 0
    assert out["n_frames"].between(4, 8).all()
    assert (out["duration_ms"] == out["n_frames"] * 100).all()
    assert (out["max_motion"] > 0.005).all()  # every synth clip really moves
    assert (out["mean_motion"] <= out["max_motion"]).all()


def test_decoders_reject_garbage_loudly():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all" * 10)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 64)
    assert sniff_format(b"\xff\xd8\xff\xe0jfif") == "jpeg"
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"


# ---------------------------------------------------------------- features
def test_image_features_constant_image():
    img = np.full((32, 32, 3), 255, np.uint8)
    f = image_features(img)
    assert f.shape == (FEATURE_DIM,)
    assert np.allclose(f, 1.0, atol=1e-3)  # all-white → all cells ≈ 1


def test_image_features_quadrants():
    # left half black, right half white → left pool columns ≈0, right ≈1
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255
    f = image_features(img).reshape(4, 4)
    assert np.allclose(f[:, :2], 0.0, atol=1e-3)
    assert np.allclose(f[:, 2:], 1.0, atol=1e-3)


def test_audio_features_sine_peak():
    rate, f0 = 8000, 1000.0
    t = np.arange(4000) / rate
    samples = (0.8 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16)
    feats = audio_features(rate, samples)
    # 1 kHz of a 4 kHz Nyquist span → band 4 of 16 holds the peak
    assert int(np.argmax(feats)) == 4
    dur, rms, dom = audio_stats(rate, samples)
    assert abs(dur - 0.5) < 1e-9
    assert abs(rms - 0.8 / np.sqrt(2)) < 0.01
    assert abs(dom - f0) < rate / 4000 + 1e-9  # one FFT bin


def test_conv_image_features_semantics():
    from crawlingathome_server_ray.functions.media import \
        conv_image_features
    # flat image: zero edge/Laplacian responses, brightness cells = level
    flat = np.full((16, 16, 3), 128, np.uint8)
    f = conv_image_features(flat).reshape(4, 4)
    assert np.allclose(f[0], 128 / 255.0, atol=1e-3)   # brightness bank
    assert np.allclose(f[1:], 0.0, atol=1e-3)          # no edges anywhere
    # vertical step edge: Sobel-x fires, Sobel-y stays ~0
    step = np.zeros((16, 16, 3), np.uint8)
    step[:, 8:] = 255
    g = conv_image_features(step).reshape(4, 4)
    assert g[1].mean() > 10 * max(g[2].mean(), 1e-6)
    # deterministic
    assert np.array_equal(conv_image_features(step),
                          conv_image_features(step))


def test_feature_extract_stage_real_path(ray_session):
    from crawlingathome_server_ray.pipelines.media_queries import \
        q_media_encode
    from crawlingathome_server_ray.stages.multimodal import \
        FeatureExtractStage
    t = generate_media(7, 8)
    out = FeatureExtractStage(column="payload", fake=False)(t)
    feats = np.stack([np.asarray(v) for v in
                      out.column("features").to_pylist()])
    assert feats.shape == (8, FEATURE_DIM)
    assert np.isfinite(feats).all()
    assert (np.abs(feats).sum(axis=1) > 0).all()  # every payload decodable
    # image rows carry conv responses of the decoded pixels exactly
    from crawlingathome_server_ray.functions.media import (
        conv_image_features, decode_bmp, decode_png)
    src = t.column("payload")[0].as_py()
    assert np.array_equal(feats[0], conv_image_features(decode_bmp(src)))
    src2 = t.column("payload")[2].as_py()
    assert np.array_equal(feats[2], conv_image_features(decode_png(src2)))
    src4 = t.column("payload")[4].as_py()
    from crawlingathome_server_ray.functions.media import (decode_jpeg,
                                                           split_mjpeg)
    assert np.array_equal(feats[4], conv_image_features(decode_jpeg(src4)))
    # video rows carry the mean of per-frame conv encodings, exactly
    src6 = t.column("payload")[6].as_py()
    want6 = np.mean([conv_image_features(decode_jpeg(fr))
                     for fr in split_mjpeg(src6)], axis=0).astype(np.float32)
    assert np.array_equal(feats[6], want6)
    # unknown payloads → zero vector, row kept
    import pyarrow as pa
    junk = pa.table({"media_id": pa.array([0], pa.int64()),
                     "payload": pa.array([b"mystery-bytes"], pa.binary())})
    z = FeatureExtractStage(column="payload", fake=False)(junk)
    assert np.allclose(np.asarray(z.column("features")[0].as_py()), 0.0)

    # query-level: rows-only contract shape
    enc = q_media_encode(SF).to_pandas()
    assert set(enc.columns) == {"media_id", "kind", "features"}
    assert all(len(v) == FEATURE_DIM for v in enc["features"].head(10))


def test_resize_nearest_identity_and_downscale():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert np.array_equal(small[0, 0], img[2, 2])  # center of the cell


# -------------------------------------------------------------- stages/e2e
def test_media_table_deterministic_and_real():
    t1 = generate_media(42, 24)
    t2 = generate_media(42, 48)
    for i in range(24):  # per-row streams: prefix-stable across sizes
        assert t1.column("payload")[i].as_py() == t2.column("payload")[i].as_py()
    kinds = t1.column("kind").to_pylist()
    # even rows cycle BMP / PNG / JPEG images then one MJPEG video clip
    assert kinds[::2] == ["image", "image", "image", "video"] * 3
    assert kinds[1::2] == ["audio"] * 12
    from crawlingathome_server_ray.functions.media import sniff_clip
    for i, k in enumerate(kinds):
        p = t1.column("payload")[i].as_py()
        if k == "audio":
            assert sniff_format(p) == "wav"
        elif k == "video":  # raw MJPEG: JPEG magic, ≥2 structural frames
            assert sniff_format(p) == "jpeg"
            assert len(sniff_clip(p)) >= 4
        else:
            assert sniff_format(p) == ("bmp", "png", "jpeg")[(i // 2) % 4]
            assert sniff_clip(p) is None


def test_media_queries_end_to_end(ray_session):
    from crawlingathome_server_ray.pipelines.media_queries import (
        q_media_features, q_media_frames, q_media_stats)
    from crawlingathome_server_ray.sources.media_synth import media_rows_for

    n = media_rows_for(SF)
    stats = q_media_stats(SF).to_pandas()
    assert len(stats) == n
    img = stats[stats["kind"] == "image"]
    aud = stats[stats["kind"] == "audio"]
    vid = stats[stats["kind"] == "video"]
    assert img["format"].isin(["bmp", "png", "jpeg"]).all()
    assert set(img["format"]) == {"bmp", "png", "jpeg"}  # all codecs exercised
    assert (aud["format"] == "wav").all()
    assert len(vid) > 0 and (vid["format"] == "mjpeg").all()
    assert img["width"].between(8, 48).all() and img["height"].between(8, 48).all()
    assert vid["width"].between(12, 32).all() and vid["height"].between(12, 32).all()
    # clips carry 4–8 frames at the 100 ms nominal MJPEG frame time
    assert vid["duration_ms"].between(400, 800).all()
    assert aud["duration_ms"].between(100, 500).all()
    assert (aud["rms"] > 0.1).all()
    # synth mixes f1∈[100,1500) at amplitude 0.5 > f2's 0.3 → dominant=f1
    assert aud["dominant_freq_hz"].between(90, 1510).all()
    assert img[["duration_ms", "rms"]].isna().all().all()
    assert vid[["rms", "dominant_freq_hz"]].isna().all().all()
    assert aud[["width", "height"]].isna().all().all()

    feats = q_media_features(SF).to_pandas()
    assert len(feats) == n
    assert all(len(v) == FEATURE_DIM for v in feats["features"].head(20))
    # image features are pixel means in [0,1]; audio log-energies ≥ 0
    m = np.stack(feats["features"].to_numpy())
    assert np.isfinite(m).all() and (m >= 0).all()

    frames = q_media_frames(SF).to_pandas()
    assert set(frames.columns) == {"media_id", "frame_ms", "frame_rms"}
    # audio rows + video rows both emit sampled frames
    assert frames["media_id"].nunique() == n // 2 + len(vid)
    # every clip ≥100 ms emits its frame 0; stride-2 → offsets are even
    # multiples of 200 ms for audio windows AND 100 ms MJPEG frames alike
    assert (frames["frame_ms"] % 200 == 0).all()
    assert frames.groupby("media_id")["frame_ms"].min().eq(0).all()
    # frame RMS within a clip must be consistent with the clip-level RMS
    j = frames.groupby("media_id")["frame_rms"].mean().to_frame().join(
        aud.set_index("media_id")["rms"], how="inner")
    assert len(j) == n // 2
    assert (j["frame_rms"] - j["rms"]).abs().max() < 0.1
    # video frames: first sample has motion 0, later samples move (the
    # synth clips roll a gradient between frames)
    vf = frames[frames["media_id"].isin(vid["media_id"])]
    assert len(vf) > 0
    first = vf[vf["frame_ms"] == 0]
    assert (first["frame_rms"] == 0.0).all()
    later = vf[vf["frame_ms"] > 0]
    assert len(later) > 0 and (later["frame_rms"] > 0.005).all()


def test_thumbnail_stage_and_query(ray_session):
    from crawlingathome_server_ray.pipelines.media_queries import (
        q_media_thumbnails)
    from crawlingathome_server_ray.stages.multimodal import ThumbnailStage

    # stage-level: thumb decodes back to resize_nearest(original) —
    # exactly for the lossless formats, within the quantization error
    # bound for JPEG — re-encoded in the SOURCE format
    from crawlingathome_server_ray.functions.media import split_mjpeg
    t = generate_media(7, 12)
    out = ThumbnailStage(column="payload", out_h=4, out_w=4)(t)
    for i in range(12):
        thumb = out.column("thumb")[i].as_py()
        kind = t.column("kind")[i].as_py()
        src = t.column("payload")[i].as_py()
        if kind == "image":
            fmt = sniff_format(src)
            dec = _IMAGE_DECODERS[fmt]
            assert sniff_format(thumb) == fmt
            want = resize_nearest(dec(src), 4, 4)
            got = dec(thumb)
            if fmt == "jpeg":
                assert got.shape == want.shape
                assert np.abs(got.astype(int) - want.astype(int)).mean() < 16
            else:
                assert np.array_equal(got, want)
        elif kind == "video":
            # the thumbnail of an MJPEG clip is itself an MJPEG clip:
            # one 4×4 JPEG frame per source frame
            src_frames = split_mjpeg(src)
            th_frames = split_mjpeg(thumb)
            assert len(th_frames) == len(src_frames) >= 4
            for sf_, tf in zip(src_frames, th_frames):
                want = resize_nearest(_IMAGE_DECODERS["jpeg"](sf_), 4, 4)
                got = _IMAGE_DECODERS["jpeg"](tf)
                assert got.shape == want.shape
                assert np.abs(got.astype(int) - want.astype(int)).mean() < 16
        else:
            assert thumb is None

    # query-level over the media table
    th = q_media_thumbnails(SF).to_pandas()
    img = th[th["kind"] == "image"]
    aud = th[th["kind"] == "audio"]
    vid = th[th["kind"] == "video"]
    assert img["thumb"].notna().all() and aud["thumb"].isna().all()
    assert vid["thumb"].notna().all()
    assert (img["thumb_h"] == 16).all() and (img["thumb_w"] == 16).all()
    fmts = {sniff_format(b) for b in img["thumb"].head(8)}
    assert fmts == {"bmp", "png", "jpeg"}
    for b in img["thumb"].head(6):
        assert _IMAGE_DECODERS[sniff_format(b)](b).shape == (16, 16, 3)
    for b in vid["thumb"].head(2):
        for fr in split_mjpeg(b):
            assert _IMAGE_DECODERS["jpeg"](fr).shape == (16, 16, 3)


def test_decode_stage_real_path(ray_session):
    from crawlingathome_server_ray.stages.multimodal import DecodeStage
    t = generate_media(7, 8)
    stage = DecodeStage(column="payload", fake=False)
    out = stage(t)
    w = out.column("width").to_pylist()
    fmt = out.column("format").to_pylist()
    assert fmt[::2] == ["bmp", "png", "jpeg", "mjpeg"]
    assert fmt[1::2] == ["wav"] * 4
    assert all(8 <= x <= 48 for x in w[::2])
    with pytest.raises(NotImplementedError):  # MP3: the declared codec edge
        stage._decode_real(b"\xff\xfb\x90\x00mp3-frame-sync-bytes")


# ------------------------------------------------------------- G.711 audio
def test_g711_lut_consistency():
    """The classic G.711 identity: compressing every decoded byte value
    reproduces the byte. A-law holds for all 256; u-law for 255 — wire
    byte 0x7F is 'negative zero', whose decoded 0 re-encodes as the
    positive zero code (the documented two-zero-codes property)."""
    import numpy as np
    from crawlingathome_server_ray.functions.media import (
        _ALAW_LUT, _ULAW_LUT, alaw_compress, ulaw_compress)
    b = np.arange(256, dtype=np.uint8)
    assert (alaw_compress(_ALAW_LUT[b]) == b).all()
    bad = np.nonzero(ulaw_compress(_ULAW_LUT[b]) != b)[0]
    assert list(bad) == [0x7F] and _ULAW_LUT[0x7F] == 0


def test_g711_wav_roundtrip_error_bound():
    """Companded 8-bit audio decodes within the codec's logarithmic
    error envelope (~1/16 relative for u-law's 4-bit mantissa, ~1/8 for
    A-law's first segment), and the full WAV container round-trips."""
    import numpy as np
    from crawlingathome_server_ray.functions.media import (decode_wav,
                                                           encode_wav_g711)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(8000) * 9000).clip(-32768, 32767) \
        .astype(np.int16)
    for law, bound in [("ulaw", 0.07), ("alaw", 0.13)]:
        payload = encode_wav_g711(x, 8000, law)
        rate, y = decode_wav(payload)
        assert rate == 8000 and len(y) == len(x)
        rel = (np.abs(y.astype(np.int32) - x.astype(np.int32))
               / np.maximum(np.abs(x.astype(np.int32)), 64))
        assert float(rel.max()) <= bound, (law, float(rel.max()))
        # half the byte rate of PCM16 plus the fixed 44-byte header
        assert len(payload) <= 44 + len(x) + 2


def test_media_table_mixes_audio_codecs(ray_session):
    """The synthetic media table's audio rows cycle PCM16 / ulaw / alaw
    and every one decodes through the stats stage."""
    import numpy as np
    import pyarrow.dataset as pads
    from crawlingathome_server_ray.functions.media import decode_wav
    from crawlingathome_server_ray.sources.media_synth import ensure_media
    root = ensure_media("/root/testdata/sf0.001")
    t = pads.dataset(f"{root}/media").to_table()
    fmts = set()
    for kind, payload in zip(t.column("kind").to_pylist(),
                             t.column("payload").to_pylist()):
        if kind != "audio":
            continue
        fmt = int(np.frombuffer(payload[20:22], np.uint16)[0])
        fmts.add(fmt)
        rate, samples = decode_wav(payload)       # every codec decodes
        assert rate == 8000 and len(samples) > 0
    assert fmts == {1, 6, 7}


def test_g711_matches_stdlib_audioop():
    """Independent canonical oracle: CPython's audioop implements the
    Sun/ITU G.711 reference. Decode LUTs must be BIT-IDENTICAL for all
    256 byte values in both laws; A-law encode bit-identical across the
    full int16 domain; u-law encode may differ from the reference only
    on negative segment-boundary samples (audioop's `-x` vs this
    module's biased-magnitude rounding) — every disagreement must be an
    adjacent code whose decode is at least as close to the input."""
    audioop = pytest.importorskip("audioop")  # stdlib, deprecated 3.11+
    import numpy as np
    from crawlingathome_server_ray.functions.media import (
        _ALAW_LUT, _ULAW_LUT, alaw_compress, ulaw_compress)
    b = bytes(range(256))
    assert (_ULAW_LUT[np.arange(256)]
            == np.frombuffer(audioop.ulaw2lin(b, 2), np.int16)).all()
    assert (_ALAW_LUT[np.arange(256)]
            == np.frombuffer(audioop.alaw2lin(b, 2), np.int16)).all()
    x = np.arange(-32768, 32768, dtype=np.int16)
    assert (alaw_compress(x) == np.frombuffer(
        audioop.lin2alaw(x.tobytes(), 2), np.uint8)).all()
    ref = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    mine = ulaw_compress(x)
    d = np.nonzero(ref != mine)[0]
    assert len(d) < 0.01 * len(x)
    err_ref = np.abs(_ULAW_LUT[ref[d]].astype(int) - x[d].astype(int))
    err_mine = np.abs(_ULAW_LUT[mine[d]].astype(int) - x[d].astype(int))
    assert (err_mine <= err_ref).all()
