"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

Two tiers:

- **Real kernels** for the baseline formats the sandbox CAN decode with
  numpy + stdlib alone — BMP, PNG (zlib) and baseline JPEG (DCT +
  Huffman) images, raw-MJPEG video clips (back-to-back JPEG frames,
  split by a structural marker walk) and WAV PCM16 audio (see
  functions/media.py and functions/jpeg.py for the honest format
  parsers). ``MediaStatsStage`` / ``MediaFeatureStage`` /
  ``ThumbnailStage`` / ``FrameSampleStage(real=True)`` sniff magic
  bytes and produce real metadata, real 16-dim features,
  format-preserving thumbnails (an MJPEG clip thumbnails to an MJPEG
  clip), and real sampled frames — windowed RMS for audio, per-frame
  MOTION (RMS luminance delta) for video. The per-row loop inside each
  batch is inherent to variable-size payload decode (every media
  engine's shape); each decode is itself vectorized numpy over the
  payload bytes.
- **Loud rejection** of anything else: ``DecodeStage(fake=False)``
  handles BMP/PNG/JPEG/WAV via the real parsers and raises
  ``NotImplementedError`` for unrecognized formats (MP3 is formally
  descoped — see the functions/media.py module docstring for the
  spec-table rationale); ``fake=True`` keeps the deterministic
  hash-fake so plumbing tests run format-independent.

Sizing note: binary payloads dominate block size; callers should use small
``batch_size`` (≤1024 for images) and bound ``concurrency × payload × batch``
to worker heap (see ray_guide memory pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.media import (MJPEG_FRAME_MS, audio_features, audio_stats,
                               clip_luma_frames, conv_image_features,
                               decode_bmp, decode_jpeg, decode_png,
                               decode_wav, encode_bmp, encode_jpeg,
                               encode_png, image_features, resize_nearest,
                               sniff_clip, sniff_format)

_IMAGE_CODECS = {"bmp": (decode_bmp, encode_bmp),
                 "png": (decode_png, encode_png),
                 "jpeg": (decode_jpeg, encode_jpeg)}

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake: pretend-decode to (width, height, format)."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, ("jpeg", "png", "webp")[h[2] % 3]


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic fake embedding from the payload hash (stands in for a
    CLIP-style encoder — which in the reference system ran on GPU workers,
    never on the coordinator; reference README.md:5-11)."""
    h = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(FEATURE_DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


class DecodeStage:
    """Actor-pool stage: binary column → (width, height, format) metadata.

    Use as ``ds.map_batches(DecodeStage, fn_constructor_kwargs={"fake": True},
    batch_size=512, concurrency=N)``.
    """

    def __init__(self, column: str = "html", fake: bool = True):
        self.column = column
        self.fake = fake

    def _decode_real(self, payload: bytes):
        fmt = sniff_format(payload)
        if fmt == "jpeg":
            frames = sniff_clip(payload)
            if frames is not None:                  # raw-MJPEG video clip
                img = decode_jpeg(frames[0])
                return img.shape[1], img.shape[0], "mjpeg"
        if fmt in _IMAGE_CODECS:
            img = _IMAGE_CODECS[fmt][0](payload)
            return img.shape[1], img.shape[0], fmt
        if fmt == "wav":
            rate, samples = decode_wav(payload)
            return len(samples), 1, "wav"          # (n_samples, 1 channel)
        raise NotImplementedError(
            f"decode for format {fmt!r} needs PIL/libvips/ffmpeg — not "
            "present in this container; BMP/PNG/JPEG/WAV decode natively, "
            "or run with fake=True for the format-independent stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        decode = _fake_decode if self.fake else self._decode_real
        metas = [decode(v) for v in col.to_pylist()]
        return (batch
                .append_column("width", pa.array([m[0] for m in metas], pa.int32()))
                .append_column("height", pa.array([m[1] for m in metas], pa.int32()))
                .append_column("format", pa.array([m[2] for m in metas], pa.string())))


class FeatureExtractStage:
    """Actor-pool stage: binary column → fixed-dim float32 feature vector
    (list<float> column), batched like a model-inference stage.

    ``fake=False`` runs a REAL deterministic encoder per payload format:
    a fixed-weight 3×3 conv bank with spatial pooling for BMP/PNG/JPEG
    images
    (``functions/media.conv_image_features`` — the honest sandbox
    stand-in for a learned encoder; the reference ran CLIP on GPU
    workers only) and 16-band log spectral energy for WAV. Undecodable
    payloads get a zero vector (row count stays stable for joins).
    ``fake=True`` keeps the hash-fake for format-independent plumbing
    tests."""

    def __init__(self, column: str = "html", fake: bool = True):
        self.column = column
        self.fake = fake

    def _real_features(self, payload: bytes) -> np.ndarray:
        fmt = sniff_format(payload)
        if fmt == "jpeg":
            frames = sniff_clip(payload)
            if frames is not None:    # video: mean of per-frame encodings
                return np.mean([conv_image_features(decode_jpeg(f))
                                for f in frames], axis=0).astype(np.float32)
        if fmt in _IMAGE_CODECS:
            return conv_image_features(_IMAGE_CODECS[fmt][0](payload))
        if fmt == "wav":
            return audio_features(*decode_wav(payload))
        return np.zeros(FEATURE_DIM, np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = _fake_features if self.fake else self._real_features
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.stack([fn(v) for v in col.to_pylist()])
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), FEATURE_DIM)
        return batch.append_column("features", arr)


class MediaStatsStage:
    """REAL actor-pool stage: sniff + decode each payload and emit typed
    metadata — (format, width, height) for images, (duration_ms, rms,
    dominant_freq_hz) for audio; inapplicable fields are null. Unknown
    formats pass through with format='unknown' and all-null stats (a
    100-TB crawl always contains undecodable bytes; dropping them is the
    caller's policy, not the decoder's)."""

    def __init__(self, column: str = "payload", id_cols: tuple = ("media_id", "kind")):
        self.column = column
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fmt, w, h, dur, rms, dom = [], [], [], [], [], []
        for p in col.to_pylist():
            f = sniff_format(p)
            frames = sniff_clip(p) if f == "jpeg" else None
            if frames is not None:                   # raw-MJPEG video clip
                fmt.append("mjpeg")
                img = decode_jpeg(frames[0])
                w.append(img.shape[1]); h.append(img.shape[0])
                dur.append(len(frames) * MJPEG_FRAME_MS)
                rms.append(None); dom.append(None)
                continue
            fmt.append(f)
            if f in _IMAGE_CODECS:
                img = _IMAGE_CODECS[f][0](p)
                w.append(img.shape[1]); h.append(img.shape[0])
                dur.append(None); rms.append(None); dom.append(None)
            elif f == "wav":
                rate, samples = decode_wav(p)
                d, r, fq = audio_stats(rate, samples)
                w.append(None); h.append(None)
                dur.append(int(d * 1000)); rms.append(r); dom.append(fq)
            else:
                w.append(None); h.append(None)
                dur.append(None); rms.append(None); dom.append(None)
        cols = {c: batch.column(c) for c in self.id_cols}
        cols.update({"format": pa.array(fmt, pa.string()),
                     "width": pa.array(w, pa.int32()),
                     "height": pa.array(h, pa.int32()),
                     "duration_ms": pa.array(dur, pa.int32()),
                     "rms": pa.array(rms, pa.float64()),
                     "dominant_freq_hz": pa.array(dom, pa.float64())})
        return pa.table(cols)


class MediaFeatureStage:
    """REAL actor-pool stage: payload → 16-dim float32 feature vector —
    4×4 mean-pooled grayscale thumbnail for BMP/PNG, 16-band log spectral
    energy for WAV (functions/media.py kernels). Undecodable payloads get
    a zero vector (kept, so the row count is stable for joins)."""

    def __init__(self, column: str = "payload"):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.zeros((len(col), FEATURE_DIM), np.float32)
        for i, p in enumerate(col.to_pylist()):
            f = sniff_format(p)
            frames = sniff_clip(p) if f == "jpeg" else None
            if frames is not None:    # video: mean of per-frame features
                feats[i] = np.mean([image_features(decode_jpeg(fr))
                                    for fr in frames], axis=0)
            elif f in _IMAGE_CODECS:
                feats[i] = image_features(_IMAGE_CODECS[f][0](p))
            elif f == "wav":
                feats[i] = audio_features(*decode_wav(p))
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), FEATURE_DIM)
        return batch.drop_columns([self.column]).append_column("features", arr)


class ThumbnailStage:
    """REAL actor-pool stage: image payload → re-encoded thumbnail —
    decode BMP/PNG, nearest-neighbor resize to (out_h, out_w)
    (``functions/media.resize_nearest``), re-encode in the SOURCE
    format. The classic media *transform* stage (decode → resize →
    encode), complementing the metadata/feature *extract* stages above.
    Non-image payloads get a null thumb (kept: row count stays stable
    for joins, and dropping undecodables is the caller's policy)."""

    def __init__(self, column: str = "payload", out_h: int = 16,
                 out_w: int = 16, id_cols: tuple = ("media_id", "kind")):
        self.column = column
        self.out_h = out_h
        self.out_w = out_w
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        thumbs: list[bytes | None] = []
        for p in col.to_pylist():
            fmt = sniff_format(p)
            frames = sniff_clip(p) if fmt == "jpeg" else None
            if frames is not None:   # video: thumbnail every frame — the
                # result is itself a valid raw-MJPEG clip
                thumbs.append(b"".join(
                    encode_jpeg(resize_nearest(decode_jpeg(fr),
                                               self.out_h, self.out_w))
                    for fr in frames))
                continue
            codec = _IMAGE_CODECS.get(fmt)
            if codec is not None:
                dec, enc = codec
                thumbs.append(enc(
                    resize_nearest(dec(p), self.out_h, self.out_w)))
            else:
                thumbs.append(None)
        cols = {c: batch.column(c) for c in self.id_cols}
        cols.update({"thumb": pa.array(thumbs, pa.binary()),
                     "thumb_h": pa.array(
                         [self.out_h if t is not None else None
                          for t in thumbs], pa.int32()),
                     "thumb_w": pa.array(
                         [self.out_w if t is not None else None
                          for t in thumbs], pa.int32())})
        return pa.table(cols)


class FrameSampleStage:
    """Frame sampling as a flat-map-shaped multimodal stage: one output
    row per sampled frame.

    ``real=True``: REAL sampling for both time-series formats —

    - **WAV audio**: cut the clip into ``window_ms`` windows, emit every
      ``stride``-th one with its offset and RMS (numpy reshape, no
      per-sample loop).
    - **raw-MJPEG video**: split the clip into its JPEG frames
      (structural marker walk), decode every ``stride``-th frame, emit
      its nominal timestamp and MOTION — RMS luminance delta versus the
      previously sampled frame ([0, 1] luma scale; 0.0 for the first
      sample). Same output schema as audio: (id, frame_ms, frame_rms).

    ``real=False``: the deterministic hash-fake retained for
    format-independent plumbing tests."""

    def __init__(self, column: str = "html", n_frames: int = 3,
                 real: bool = False, id_col: str = "url",
                 window_ms: int = 100, stride: int = 2):
        self.column = column
        self.n_frames = n_frames
        self.real = real
        self.id_col = id_col
        self.window_ms = window_ms
        self.stride = stride

    def _real_frames(self, payload: bytes) -> tuple[np.ndarray, np.ndarray]:
        """(frame_ms, frame_rms) arrays for one clip's sampled windows —
        arange/reshape only, no per-window Python loop."""
        rate, samples = decode_wav(payload)
        win = max(1, rate * self.window_ms // 1000)
        n_win = len(samples) // win
        if n_win == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        x = (samples[:n_win * win].astype(np.float64) / 32768.0
             ).reshape(n_win, win)
        rms = np.sqrt((x * x).mean(axis=1))
        j = np.arange(0, n_win, self.stride, dtype=np.int64)
        return j * self.window_ms, rms[j]

    def _real_video_frames(self, frames: list[bytes]
                           ) -> tuple[np.ndarray, np.ndarray]:
        """(frame_ms, motion_rms) for every ``stride``-th frame of an
        MJPEG clip: motion = RMS luminance delta vs the previous sampled
        frame on a [0, 1] scale (first sample: 0.0 by definition)."""
        luma = clip_luma_frames(frames, self.stride) / 255.0  # (n, h, w)
        d = np.diff(luma, axis=0)
        motion = np.concatenate(
            [[0.0], np.sqrt((d * d).mean(axis=(1, 2)))])
        j = np.arange(0, len(frames), self.stride, dtype=np.int64)
        return j * MJPEG_FRAME_MS, motion

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # per-clip loop is inherent (variable-size payload decode); the
        # per-window emission inside each clip is vectorized, and ids are
        # replicated with one Arrow take over the whole batch
        src_row, f_parts, r_parts = [], [], []
        for i, p in enumerate(col.to_pylist()):
            if self.real:
                fmt = sniff_format(p)
                if fmt == "wav":
                    f, r = self._real_frames(p)
                elif fmt == "jpeg":
                    frames = sniff_clip(p)
                    if frames is None:      # still image: nothing to sample
                        continue
                    f, r = self._real_video_frames(frames)
                else:
                    continue
            else:
                h = hashlib.md5(p).digest()
                f = np.array([int.from_bytes(h[i2:i2 + 2], "big") % 10_000
                              for i2 in range(self.n_frames)], np.int64)
                r = np.zeros(self.n_frames, np.float64)
            if len(f):
                src_row.append(np.full(len(f), i, np.int64))
                f_parts.append(f)
                r_parts.append(r)
        idx = (np.concatenate(src_row) if src_row
               else np.zeros(0, np.int64))
        ids = batch.column(self.id_col).take(pa.array(idx, pa.int64()))
        fm = np.concatenate(f_parts) if f_parts else np.zeros(0, np.int64)
        fr = np.concatenate(r_parts) if r_parts else np.zeros(0, np.float64)
        return pa.table({self.id_col: ids,
                         "frame_ms": pa.array(fm.astype(np.int32), pa.int32()),
                         "frame_rms": pa.array(fr, pa.float64())})
