"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The sandbox has no image/audio libraries, so the decode kernels are STUBS
(clearly marked): ``DecodeStage(fake=False)`` raises ``NotImplementedError``
with the library it would use; ``fake=True`` runs a deterministic fake
decode so the Ray-side plumbing — schema, batch sizing, actor pool
signature, output layout — is real and tested. On a real deployment only
``_decode_real`` changes.

Sizing note: binary payloads dominate block size; callers should use small
``batch_size`` (≤1024 for images) and bound ``concurrency × payload × batch``
to worker heap (see ray_guide memory pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
        raise NotImplementedError(
            "real image decode needs PIL/libvips — not present in this "
            "container; run with fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        decode = _fake_decode if self.fake else self._decode_real
        metas = [decode(v.as_py()) for v in col]
        return (batch
                .append_column("width", pa.array([m[0] for m in metas], pa.int32()))
                .append_column("height", pa.array([m[1] for m in metas], pa.int32()))
                .append_column("format", pa.array([m[2] for m in metas], pa.string())))


class FeatureExtractStage:
    """Actor-pool stage: binary column → fixed-dim float32 feature vector
    (list<float> column), batched like a model-inference stage."""

    def __init__(self, column: str = "html", fake: bool = True):
        self.column = column
        if not fake:
            raise NotImplementedError(
                "real feature extraction needs an image/audio model — stubbed "
                "in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.stack([_fake_features(v.as_py()) for v in col])
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), FEATURE_DIM)
        return batch.append_column("features", arr)


class FrameSampleStage:
    """Video-style frame sampling stub: emits ``n_frames`` synthetic frame
    offsets per payload (deterministic), one output row per frame —
    demonstrates a flat-map-shaped multimodal stage."""

    def __init__(self, column: str = "html", n_frames: int = 3):
        self.column = column
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        urls = batch.column("url").to_pylist()
        out_u, out_f = [], []
        for u, v in zip(urls, col):
            h = hashlib.md5(v.as_py()).digest()
            for i in range(self.n_frames):
                out_u.append(u)
                out_f.append(int.from_bytes(h[i:i + 2], "big") % 10_000)
        return pa.table({"url": pa.array(out_u, pa.string()),
                         "frame_ms": pa.array(out_f, pa.int32())})
