"""Multimodal queries over the synthetic media table (REAL decode).

The media table (sources/media_synth.py) carries real BMP / PNG /
baseline-JPEG images, raw-MJPEG video clips and WAV audio bytes in an
opaque ``binary`` column; these queries run the honest numpy format
parsers (functions/media.py, functions/jpeg.py) inside actor-pool
``map_batches`` stages — the multimodal shape from the brief with no
fake left in the hot path, compressed formats and video frame
splitting included. Rows-only in the driver contract (DuckDB cannot
decode these formats), with round-trip and golden coverage in
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

import pyarrow as pa
import ray.data

from ..functions.media import MJPEG_FRAME_MS
from ..sources.media_synth import ensure_media
from ..stages.multimodal import (FeatureExtractStage, FrameSampleStage,
                                 MediaFeatureStage, MediaStatsStage,
                                 ThumbnailStage)

MEDIA_BATCH = 256  # payloads are KBs; keep batch × concurrency in heap


def media_ds(sf_dir: str, columns=None, kind: str | None = None):
    """Media-table reader. ``kind`` pushes an equality predicate into the
    parquet scan itself (pyarrow fragment filter), so other kinds' payload
    bytes never leave storage — prune at the read, not after it."""
    root = ensure_media(sf_dir)
    kwargs = {}
    if kind is not None:
        import pyarrow.dataset as pads
        kwargs["filter"] = pads.field("kind") == kind  # fragment-level scan
        # filter (read_parquet **arrow_parquet_args → fragment.to_batches)
    return ray.data.read_parquet(os.path.join(root, "media"),
                                 columns=columns, **kwargs)


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
    """Real frame sampling over the time-series rows: one row per
    sampled frame, (media_id, frame_ms, frame_rms). Audio rows emit
    100 ms-window RMS; video rows (raw MJPEG) are split into their JPEG
    frames by the structural marker walk, every stride-th frame decoded,
    and frame_rms carries the real inter-frame MOTION (RMS luminance
    delta vs the previous sample) — the flat-map multimodal shape."""
    return media_ds(sf_dir).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"column": "payload", "real": True,
                               "id_col": "media_id"},
        batch_size=MEDIA_BATCH, concurrency=2, batch_format="pyarrow")


def q_media_clip_motion(sf_dir: str):
    """Decode → aggregate composition over the video rows only: sample
    every frame of each MJPEG clip, then groupby(media_id) over the slim
    (media_id, frame_ms, frame_rms) frame rows — payload bytes never
    cross the stage boundary — emitting per-clip (n_frames, duration_ms,
    max_motion, mean_motion). The format predicate prunes at the read
    (kind column), so image/audio payloads are never decoded here."""
    frames = (media_ds(sf_dir, kind="video")
              .map_batches(
                  FrameSampleStage,
                  fn_constructor_kwargs={"column": "payload", "real": True,
                                         "id_col": "media_id", "stride": 1},
                  batch_size=MEDIA_BATCH, concurrency=2,
                  batch_format="pyarrow"))

    from ray.data.aggregate import Count, Max, Mean

    agg = frames.groupby("media_id").aggregate(
        Count(alias_name="n_frames"),
        Max("frame_ms", alias_name="last_ms"),
        Max("frame_rms", alias_name="max_motion"),
        Mean("frame_rms", alias_name="mean_motion"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pc.cast(batch.column("n_frames"), pa.int32()),
            "duration_ms": pc.cast(
                pc.add(batch.column("last_ms"), MJPEG_FRAME_MS),
                pa.int32()),
            "max_motion": batch.column("max_motion"),
            "mean_motion": batch.column("mean_motion")})

    return agg.map_batches(finish, batch_format="pyarrow")


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
    "media_clip_motion": q_media_clip_motion,
}
