"""Distributed hashed-unigram quality classifier (SURVEY X49).

CCNet (Wenzek et al. 2019) and the GPT-3 data pipeline (Brown et al.
2020 §2.2) filter web text with a linear classifier over hashed
bag-of-words features trained to recognize a high-quality slice. This
module reproduces that operator Ray-Data-first:

- **featurize** — one streaming ``map_batches`` pass: whitespace tokens
  → 60-bit md5 bucket (the repo-standard integer hash recipe proven
  against DuckDB by the weighted-sample oracle) → per-doc sparse
  (bucket, tf) pairs carried as Arrow list columns, ONE row per doc, so
  any later batch can score its docs without cross-batch state.
- **train** — synchronized full-batch gradient descent on a
  deterministic doc_id-hash training sample whose features are
  materialized ONCE (tokenization never re-runs across epochs). Each
  batch emits its gradient partial as an int64 fixed-point vector: every
  per-(doc, bucket) term is rounded to 2^-26 quanta BEFORE summing, so
  gradient aggregation is associative — the trained weights are
  bit-identical at any batch size, partitioning, or combine fan-in
  (asserted by the single-process twin test). Partials pass one
  tree-combine level; driver state per step is one (n_buckets+1)-long
  int64 vector regardless of corpus size.
- **score** — final weights broadcast once (``ray.put``, ~8 KB for 1024
  buckets); one streaming pass over the full corpus; per-doc logits are
  per-segment independent sums over the sorted (doc, bucket) pairs, so
  scores are batch-invariant too.

Scale notes: at 100 TB the training-sample fraction is the knob — CCNet
trained its filter on ~10^7 docs. Only the sample's slim feature rows
(~8 bytes/token) are materialized; the full corpus is only ever
streamed. With scale 2^26 the int64 gradient sums are exact up to
~1.4 * 10^11 training tokens (worst-case |term| = 1); a driver-side
guard raises loudly long before overflow.

Reference analog: none — the reference (a crawl coordinator,
main.py:25) has no model training; this is the brief's training-data
extension. Labels default to ``lang == target_lang`` (a langid-style
self-supervised target); production would swap in curated positives —
the distributed machinery is identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .canonicalize import md5_hash64
from .text import segment_sums

N_BUCKETS = 1024
TRAIN_FRAC = 0.5
ITERS = 30
LR = 20.0
_SCALE = float(1 << 26)
# int64 headroom guard: |partial| must stay far below 2^63.
_GUARD = float(1 << 60)
BATCH = 8192


def _doc_token_buckets(b: pa.Table, n_buckets: int):
    """(bucket_id, doc_row_index) for a batch — whitespace tokens with
    empties dropped (≡ the oracle-proven ``_tokens_doc_idx`` recipe in
    pipelines/curation_queries.py), hashed with the 60-bit md5 key."""
    texts = b.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    flat = lists.flatten()
    counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    keep = np.asarray(pc.not_equal(flat, ""))
    toks = np.asarray(flat, dtype=object)[keep]
    doc_of = doc_of[keep]
    if len(toks) == 0:
        return (np.empty(0, np.int64), doc_of)
    bk = ((md5_hash64(toks) >> np.uint64(4))
          % np.uint64(n_buckets)).astype(np.int64)
    return bk, doc_of


def featurize_batch(b: pa.Table, n_buckets: int,
                    target_lang: str) -> pa.Table:
    """One feature row per doc: sorted sparse (bucket, tf) pairs as list
    columns, token count, and the binary label."""
    bk, doc_of = _doc_token_buckets(b, n_buckets)
    n_docs = b.num_rows
    # unique (doc, bucket) pairs with counts; key sorts by (doc, bucket)
    key = doc_of * n_buckets + bk
    uk, tf = np.unique(key, return_counts=True)
    pd_ = uk // n_buckets
    pb = (uk % n_buckets).astype(np.int32)
    per_doc = np.bincount(pd_, minlength=n_docs)
    offs = np.zeros(n_docs + 1, np.int32)
    np.cumsum(per_doc, out=offs[1:])
    n_toks = np.zeros(n_docs, np.int64)
    np.add.at(n_toks, doc_of, 1)
    y = np.asarray(pc.equal(b.column("lang"), target_lang)).astype(np.int8)
    return pa.table({
        "doc_id": b.column("doc_id"),
        "bk": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(pb, pa.int32())),
        "tf": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(tf.astype(np.int32),
                                                pa.int32())),
        "n_toks": pa.array(n_toks, pa.int64()),
        "y": pa.array(y, pa.int8()),
    })


def _flat_feats(b: pa.Table):
    """Flatten a feature batch's list columns back to per-pair arrays
    plus per-doc segment offsets."""
    bk_l = b.column("bk")
    if isinstance(bk_l, pa.ChunkedArray):
        bk_l = bk_l.combine_chunks()
    tf_l = b.column("tf")
    if isinstance(tf_l, pa.ChunkedArray):
        tf_l = tf_l.combine_chunks()
    bk = np.asarray(bk_l.flatten(), dtype=np.int64)
    tf = np.asarray(tf_l.flatten(), dtype=np.float64)
    lens = np.asarray(pc.list_value_length(bk_l), dtype=np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return bk, tf, offs


def _logits(b: pa.Table, w: np.ndarray) -> np.ndarray:
    """Per-doc logit x·w + bias from a feature batch; per-segment
    independent reduceat sums over the sorted pairs → batch-invariant."""
    bk, tf, offs = _flat_feats(b)
    n = np.maximum(np.asarray(b.column("n_toks"), np.float64), 1.0)
    doc_of = np.repeat(np.arange(len(n)), np.diff(offs))
    vals = w[bk] * tf / n[doc_of]
    return segment_sums(vals, offs) + w[-1]


def gradient_partial(b: pa.Table, w: np.ndarray,
                     n_buckets: int) -> np.ndarray:
    """int64 fixed-point gradient partial for one feature batch.

    Each per-(doc, bucket) term err_d * tf/n and each per-doc bias term
    err_d is rounded to 2^-26 quanta INDIVIDUALLY, so summing partials
    is exact integer arithmetic — associative at any grouping."""
    z = _logits(b, w)
    p = 1.0 / (1.0 + np.exp(-z))
    err = p - np.asarray(b.column("y"), np.float64)
    bk, tf, offs = _flat_feats(b)
    n = np.maximum(np.asarray(b.column("n_toks"), np.float64), 1.0)
    doc_of = np.repeat(np.arange(len(n)), np.diff(offs))
    terms = np.rint(err[doc_of] * tf / n[doc_of] * _SCALE).astype(np.int64)
    g = np.zeros(n_buckets + 1, np.int64)
    np.add.at(g, bk, terms)
    g[-1] = np.rint(err * _SCALE).astype(np.int64).sum()
    return g


def train_sample_mask(doc_ids: np.ndarray, frac: float) -> np.ndarray:
    """Deterministic doc_id-hash training-sample membership (the
    ``doc_weighted_sample`` md5 uniform-key construction)."""
    h = md5_hash64(np.char.mod("%d", doc_ids.astype(np.int64)))
    u = (h >> np.uint64(4)).astype(np.float64) / np.float64(2 ** 60)
    return u < frac


def train_quality_classifier(feats: ray.data.Dataset,
                             n_buckets: int = N_BUCKETS,
                             iters: int = ITERS,
                             lr: float = LR,
                             batch_size: int = BATCH) -> np.ndarray:
    """Full-batch GD over a materialized feature Dataset → weights
    (n_buckets + 1, last slot = bias). Bit-exact at any partitioning."""
    n_train = feats.count()
    if n_train == 0:
        return np.zeros(n_buckets + 1, np.float64)
    w = np.zeros(n_buckets + 1, np.float64)
    for _ in range(iters):
        wref = ray.put(w)

        def partial(b: pa.Table) -> pa.Table:
            g = gradient_partial(b, ray.get(wref), n_buckets)
            return pa.table({"g": pa.array([g.tolist()],
                                           pa.list_(pa.int64()))})

        def combine(bt: pa.Table) -> pa.Table:
            g = np.asarray(bt.column("g").to_pylist(),
                           np.int64).sum(axis=0)
            return pa.table({"g": pa.array([g.tolist()],
                                           pa.list_(pa.int64()))})

        parts = (feats.map_batches(partial, batch_format="pyarrow",
                                   batch_size=batch_size)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=64)
                 .take_all())
        g = np.zeros(n_buckets + 1, np.int64)
        for p in parts:
            g += np.asarray(p["g"], np.int64)
        gf = g.astype(np.float64)
        if np.abs(gf).max() > _GUARD:
            raise OverflowError(
                "gradient fixed-point accumulator near int64 range — "
                "reduce the training-sample fraction or _SCALE")
        w = w - lr * (gf / _SCALE) / float(n_train)
    return w


def score_batch(b: pa.Table, w: np.ndarray, n_buckets: int,
                target_lang: str) -> pa.Table:
    """(doc_id, n_toks, logit, pred) for a raw documents batch."""
    f = featurize_batch(b, n_buckets, target_lang)
    z = _logits(f, w)
    return pa.table({
        "doc_id": f.column("doc_id"),
        "n_toks": f.column("n_toks"),
        "logit": pa.array(z, pa.float64()),
        "pred": pa.array((z > 0.0).astype(np.int8), pa.int8()),
    })
