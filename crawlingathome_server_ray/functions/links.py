"""Outlink extraction + host-graph kernels — vectorized Arrow, no
per-row Python in the hot path.

``outlinks_batch`` parses every ``href="..."`` anchor out of raw HTML
bytes with Arrow C-level kernels only: one ``split_pattern`` on the
``href="`` delimiter (the list offsets tell us which piece belongs to
which source row and which pieces are pre-anchor prefixes), one
``split_pattern(max_splits=1)`` on the closing quote, and a vectorized
relative-URL resolve (site-relative ``/path`` links get the source
page's ``scheme://host`` prefix — the same rule the DuckDB oracle
states in SQL, so extraction is exactly comparable).

Reference analog: link parsing ran in the reference's WAT workers
(reference README.md:5-11), not the coordinator; this is the Ray-native
rebuild of that stage over the (url, html) page shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HOST_PREFIX_RE = r"^(https?://[^/]+).*$"


def host_of(urls: pa.Array) -> pa.Array:
    """scheme-less host of each URL (vectorized RE2 replace)."""
    return pc.replace_substring_regex(
        urls, pattern=r"^https?://([^/]+).*$", replacement=r"\1")


def _split_anchors(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    """Shared anchor splitter: (src_url per anchor, candidate piece after
    each ``href="`` delimiter — ``TARGET">anchor</a> ...``)."""
    urls = batch.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    html = batch.column("html")
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    text = html.cast(pa.string())
    parts = pc.split_pattern(text, 'href="')          # list<string>
    flat = pc.list_flatten(parts)
    src_idx = np.asarray(pc.list_parent_indices(parts))
    off = np.asarray(parts.offsets)
    # the first piece of every non-empty list is the text BEFORE the
    # first anchor — never a link; everything after a delimiter is one
    mask = np.ones(len(flat), bool)
    mask[off[:-1][np.diff(off) > 0]] = False
    cand = flat.filter(pa.array(mask))
    src = pa.array(src_idx[mask], pa.int64())
    return urls.take(src), cand


def _resolve(src_url: pa.Array, link: pa.Array) -> pa.Array:
    """Site-relative links get the source page's scheme://host prefix."""
    prefix = pc.replace_substring_regex(
        src_url, pattern=_HOST_PREFIX_RE, replacement=r"\1")
    return pc.if_else(pc.starts_with(link, "http"), link,
                      pc.binary_join_element_wise(prefix, link, ""))


def outlinks_batch(batch: pa.Table) -> pa.Table:
    """(url, html) rows → one (src_url, dst_url) row per anchor, in
    document order, duplicates preserved (they are real edges)."""
    src_url, cand = _split_anchors(batch)
    link = pc.list_element(pc.split_pattern(cand, '"', max_splits=1), 0)
    return pa.table({"src_url": src_url,
                     "dst_url": _resolve(src_url, link)})


def anchors_batch(batch: pa.Table) -> pa.Table:
    """(url, html) rows → (src_url, dst_url, anchor) per anchor: the
    link target plus the human-visible ``>anchor</a>`` text, both from
    the same one-pass Arrow split (no second HTML scan)."""
    src_url, cand = _split_anchors(batch)
    halves = pc.split_pattern(cand, '"', max_splits=1)
    link = pc.list_element(halves, 0)
    rest = pc.list_element(halves, 1)                 # `>anchor</a> ...`
    anchor = pc.replace_substring_regex(
        rest, pattern=r"(?s)^>([^<]*)<.*$", replacement=r"\1")
    return pa.table({"src_url": src_url,
                     "dst_url": _resolve(src_url, link),
                     "anchor": anchor})
