"""Multimodal queries over the synthetic media table (REAL decode).

The media table (sources/media_synth.py) carries real BMP, PNG (zlib +
filter reconstruction) and WAV bytes in an opaque ``binary`` column;
these queries run the honest numpy format parsers (functions/media.py)
inside actor-pool ``map_batches`` stages — the multimodal shape from
the brief with no fake left in the hot path, compressed format
included. Rows-only in the driver contract (DuckDB cannot decode
BMP/PNG/WAV), with round-trip and golden coverage in
tests/test_media.py.

Scale notes: payloads dominate block size, so both queries read only
(ids, payload) columns, use small ``batch_size``, and drop the payload
column at the stage boundary — downstream of the decode only slim typed
columns move. At 100 TB the same stages run with larger ``concurrency``
and the object store spills payload blocks; nothing here materializes
on the driver.
"""

from __future__ import annotations

import os

import ray.data

from ..sources.media_synth import ensure_media
from ..stages.multimodal import (FeatureExtractStage, FrameSampleStage,
                                 MediaFeatureStage, MediaStatsStage,
                                 ThumbnailStage)

MEDIA_BATCH = 256  # payloads are KBs; keep batch × concurrency in heap


def media_ds(sf_dir: str, columns=None):
    root = ensure_media(sf_dir)
    return ray.data.read_parquet(os.path.join(root, "media"),
                                 columns=columns)


def q_media_stats(sf_dir: str):
    """Decode every payload and emit typed metadata: (media_id, kind,
    format, width, height, duration_ms, rms, dominant_freq_hz)."""
    return media_ds(sf_dir).map_batches(
        MediaStatsStage, batch_size=MEDIA_BATCH, concurrency=2,
        batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Payload → real 16-dim feature vector (thumbnail / spectral bands):
    (media_id, kind, features list<float32>[16])."""
    return media_ds(sf_dir).map_batches(
        MediaFeatureStage, batch_size=MEDIA_BATCH, concurrency=2,
        batch_format="pyarrow")


def q_media_frames(sf_dir: str):
    """Real windowed frame sampling over the audio rows: one row per
    sampled 100 ms window, (media_id, frame_ms, frame_rms) — the
    flat-map multimodal shape (video frame sampling's audio analog)."""
    return media_ds(sf_dir).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"column": "payload", "real": True,
                               "id_col": "media_id"},
        batch_size=MEDIA_BATCH, concurrency=2, batch_format="pyarrow")


def q_media_thumbnails(sf_dir: str):
    """Decode → nearest-neighbor resize → re-encode each image payload
    as a 16×16 source-format thumbnail (null thumb for non-image rows):
    (media_id, kind, thumb binary, thumb_h, thumb_w) — the media
    transform shape (payload in, smaller payload out)."""
    return media_ds(sf_dir).map_batches(
        ThumbnailStage, batch_size=MEDIA_BATCH, concurrency=2,
        batch_format="pyarrow")


def q_media_encode(sf_dir: str):
    """Model-inference-shaped encoding pass: payload → 16-dim vector via
    the REAL deterministic encoder (fixed-weight conv bank + spatial
    pooling for BMP/PNG, spectral bands for WAV) — the
    ``FeatureExtractStage(fake=False)`` path, batched like model
    inference: (media_id, kind, features list<float32>[16])."""
    return media_ds(sf_dir).map_batches(
        FeatureExtractStage,
        fn_constructor_kwargs={"column": "payload", "fake": False},
        batch_size=MEDIA_BATCH, concurrency=2,
        batch_format="pyarrow").select_columns(
        ["media_id", "kind", "features"])


MEDIA_QUERIES = {
    "media_stats": q_media_stats,
    "media_features": q_media_features,
    "media_frames": q_media_frames,
    "media_thumbnails": q_media_thumbnails,
    "media_encode": q_media_encode,
}
