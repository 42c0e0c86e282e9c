"""Deterministic synthetic media table: real BMP, PNG and baseline-JPEG
images and WAV audio clips as opaque ``binary`` payloads with typed
metadata.

Schema: (media_id: int64, kind: string 'image'|'audio'|'video',
payload: binary) — the multimodal-column shape from the brief. Even
rows cycle BMP → zlib-compressed PNG → DCT+Huffman JPEG → raw-MJPEG
video clip (back-to-back JPEG frames with real per-frame motion: a
rolling gradient); odd rows are audio. Payloads are REAL encoded files
(see functions/media.py and functions/jpeg.py), so the decode /
feature-extract / frame-sample stages exercise honest format parsing —
PNG filter reconstruction, JPEG entropy decode and MJPEG frame
splitting included — not a hash-based fake.

Cached under ``/tmp/graft_media/<sf>/`` with the same atomic
build-then-rename protocol as sources/synth.ensure_frontier. Row count
scales with the frontier's page count; payloads are a few KB each so
even the sfscale table stays object-store-friendly with small
batch sizes (see stages/multimodal.py sizing note).
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.media import (encode_bmp, encode_jpeg, encode_mjpeg,
                               encode_png, encode_wav, encode_wav_g711)
from .synth import SF_SHAPE, sf_name

_MARKER = "_DONE_v5"  # v5: audio rows cycle PCM16 / G.711 ulaw / alaw

_IMAGE_ROTATION = ("bmp", "png", "jpeg", "mjpeg")
_AUDIO_ROTATION = ("pcm16", "ulaw", "alaw")


def media_rows_for(sf_dir: str) -> int:
    n_pages, _ = SF_SHAPE[sf_name(sf_dir)]
    return max(500, min(6000, n_pages // 100))


def _make_image(rng: np.random.Generator, fmt: str = "bmp") -> bytes:
    w = int(rng.integers(8, 49))
    h = int(rng.integers(8, 49))
    # deterministic structure (two-axis gradient) + seeded texture noise,
    # distinct per channel so channel means differ measurably (and so the
    # PNG filter heuristic picks different filters per row)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) % 256
    img = np.stack([base,
                    (base + rng.integers(0, 64)) % 256,
                    rng.integers(0, 256, size=(h, w))], axis=2)
    enc = {"png": encode_png, "jpeg": encode_jpeg}.get(fmt, encode_bmp)
    return enc(img.astype(np.uint8))


def _make_clip(rng: np.random.Generator) -> bytes:
    """Raw MJPEG clip with REAL inter-frame motion: a two-axis gradient
    rolled ``dx`` columns per frame over a constant seeded-noise channel,
    so sampled-frame luminance deltas are nonzero and deterministic."""
    w = int(rng.integers(12, 33))
    h = int(rng.integers(12, 33))
    n_frames = int(rng.integers(4, 9))
    dx = int(rng.integers(1, 4))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) % 256
    noise = rng.integers(0, 256, size=(h, w))
    frames = []
    for k in range(n_frames):
        ch = np.roll(base, k * dx, axis=1)
        frames.append(np.stack([ch, (ch + 32) % 256, noise],
                               axis=2).astype(np.uint8))
    return encode_mjpeg(frames)


def _make_audio(rng: np.random.Generator, rate: int = 8000,
                codec: str = "pcm16") -> bytes:
    n = int(rng.integers(rate // 10, rate // 2))          # 0.1–0.5 s
    t = np.arange(n) / rate
    f1 = float(rng.integers(100, 1500))
    f2 = float(rng.integers(1500, 3500))
    x = (0.5 * np.sin(2 * np.pi * f1 * t)
         + 0.3 * np.sin(2 * np.pi * f2 * t)
         + 0.05 * rng.standard_normal(n))
    samples = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    if codec == "pcm16":
        return encode_wav(samples, rate)
    return encode_wav_g711(samples, rate, codec)


def generate_media(seed: int, n_rows: int) -> pa.Table:
    ids = np.arange(n_rows, dtype=np.int64)
    kinds, payloads = [], []
    for i in ids:
        rng = np.random.default_rng((seed << 20) ^ int(i))  # per-row stream:
        # payload i is identical regardless of table size or build order
        if i % 2 == 0:
            fmt = _IMAGE_ROTATION[(i // 2) % len(_IMAGE_ROTATION)]
            if fmt == "mjpeg":
                kinds.append("video")
                payloads.append(_make_clip(rng))
            else:
                kinds.append("image")
                payloads.append(_make_image(rng, fmt))
        else:
            kinds.append("audio")
            codec = _AUDIO_ROTATION[(i // 2) % len(_AUDIO_ROTATION)]
            payloads.append(_make_audio(rng, codec=codec))
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "kind": pa.array(kinds, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})


def ensure_media(sf_dir: str, seed: int = 42,
                 root: str = "/tmp/graft_media") -> str:
    """Idempotently materialize the media table for a scale factor;
    returns the directory containing ``media/*.parquet``."""
    import shutil
    out = os.path.join(root, sf_name(sf_dir))
    done = os.path.join(out, _MARKER)
    if os.path.exists(done):
        return out
    if os.path.isdir(out):
        # stale cache from an older _MARKER version: retire it atomically
        # (rename aside first so a concurrent reader never sees a partial
        # table), then rebuild under the current version
        stale = tempfile.mkdtemp(dir=root, prefix=".stale-")
        try:
            os.rename(out, os.path.join(stale, "old"))
        except OSError:
            pass  # someone else retired it first
        shutil.rmtree(stale, ignore_errors=True)
    n_rows = media_rows_for(sf_dir)
    table = generate_media(seed, n_rows)
    Path(root).mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=".build-")
    mdir = Path(tmp, "media")
    mdir.mkdir()
    n_files = 4
    step = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        sl = table.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, str(mdir / f"part-{i:04d}.parquet"))
    Path(tmp, _MARKER).touch()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
