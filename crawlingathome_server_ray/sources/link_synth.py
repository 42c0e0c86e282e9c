"""Deterministic synthetic link-pages table: real HTML anchors for the
crawl link-graph family (outlink extraction → host graph → PageRank).

Schema: (url: string, html: binary) — the page's own address plus raw
HTML whose ``<a href="...">`` anchors are the ONLY link source (queries
must really parse them; there is no precomputed edge column). Link
targets mix absolute URLs to Zipf-skewed hosts (realistic in-degree
skew, same shape as the frontier synth's host draw) with site-relative
paths (``/l/p123.html``) that the extractor must resolve against the
source page's scheme+host; ~10 % of pages carry no anchors at all
(dangling hosts for PageRank) and ~10 % repeat one anchor verbatim
(duplicate-edge handling).

Reference analog: the reference coordinator dispatches WAT shards whose
workers parse outlinks (reference README.md:5-11); the coordinator
itself never parses HTML. This family is the north-rule crawl-analytics
capability built on the same page shape.

Cached under ``/tmp/graft_links/<sf>/linkpages/`` with the same atomic
build-then-rename protocol as sources/media_synth.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .synth import SF_SHAPE, sf_name

_MARKER = "_DONE_v2"   # v2: file count scales with table size so read
# parallelism isn't capped at 4 tasks (measured: extraction at sf0.1 was
# 4-way on a 32-CPU box)

_WORDS = ("crawl index fetch parse shard queue merge spill batch stream "
          "robot sitemap anchor canonical frontier").split()


def link_rows_for(sf_dir: str) -> tuple[int, int]:
    """(n_pages, n_hosts) for the link table at this scale factor."""
    n_pages, n_hosts = SF_SHAPE[sf_name(sf_dir)]
    return max(600, n_pages // 5), n_hosts


def _host_probs(n_hosts: int) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks ** -1.2
    return p / p.sum()


def generate_linkpages(seed: int, n_pages: int, n_hosts: int,
                       start: int = 0, stop: int | None = None) -> pa.Table:
    # page i lives on a Zipf-skewed host; per-page RNG streams keep every
    # payload independent of build order (the host draw is inverse-CDF on
    # the per-page stream, not a global batch draw) — which also makes any
    # [start, stop) slice bit-identical whether generated serially or in a
    # parallel worker (ensure_links fans slices out as Ray tasks). NOTE:
    # unlike the media table, payloads are NOT prefix-stable across table
    # sizes — link targets deliberately span the whole table (`n_pages`
    # enters the target draw), so each scale factor is its own
    # deterministic graph.
    probs = _host_probs(n_hosts)
    cdf = np.cumsum(probs)
    urls, htmls = [], []
    for i in range(start, n_pages if stop is None else min(stop, n_pages)):
        rng = np.random.default_rng((seed << 21) ^ (i * 2 + 1))
        h = int(np.searchsorted(cdf, rng.random()))
        scheme = "https" if rng.random() < 0.85 else "http"
        base = f"{scheme}://h{h:05d}.crawl-test.org"
        url = f"{base}/l/p{i}.html"
        if rng.random() < 0.10:
            d = 0                                   # no anchors: dangling
        else:
            d = int(rng.integers(3, 11))
        anchors = []
        for _ in range(d):
            if rng.random() < 0.4:                  # site-relative link
                tgt = f"/l/p{int(rng.integers(0, n_pages))}.html"
            else:                                   # absolute cross-host
                th = int(rng.choice(n_hosts, p=probs))
                ts = "https" if rng.random() < 0.85 else "http"
                tgt = (f"{ts}://h{th:05d}.crawl-test.org"
                       f"/l/p{int(rng.integers(0, n_pages))}.html")
            anchors.append(tgt)
        if d and rng.random() < 0.10:               # verbatim duplicate edge
            anchors.append(anchors[int(rng.integers(0, d))])
        words = rng.choice(_WORDS, size=6)
        body = " ".join(words)
        a_html = " ".join(
            f'<a href="{t}">{_WORDS[j % len(_WORDS)]}</a>'
            for j, t in enumerate(anchors))
        html = f"<html><body><p>{body}</p> {a_html}</body></html>"
        urls.append(url)
        htmls.append(html.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def ensure_links(sf_dir: str, seed: int = 42,
                 root: str = "/tmp/graft_links") -> str:
    """Idempotently materialize the link-pages table for a scale factor;
    returns the directory containing ``linkpages/*.parquet``."""
    import shutil
    out = os.path.join(root, sf_name(sf_dir))
    done = os.path.join(out, _MARKER)
    if os.path.exists(done):
        return out
    if os.path.isdir(out):
        stale = tempfile.mkdtemp(dir=root, prefix=".stale-")
        try:
            os.rename(out, os.path.join(stale, "old"))
        except OSError:
            pass
        shutil.rmtree(stale, ignore_errors=True)
    n_pages, n_hosts = link_rows_for(sf_dir)
    Path(root).mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=".build-")
    ldir = Path(tmp, "linkpages")
    ldir.mkdir()
    n_files = max(4, min(64, (n_pages + 8191) // 8192))
    step = (n_pages + n_files - 1) // n_files

    def _write_slice(i: int) -> None:
        sl = generate_linkpages(seed, n_pages, n_hosts,
                                start=i * step, stop=(i + 1) * step)
        if sl.num_rows:
            pq.write_table(sl, str(ldir / f"part-{i:04d}.parquet"))

    # the per-page generator is Python-loop-bound (~0.6 ms/page: fresh
    # Generator + an O(n_hosts) rng.choice per absolute anchor), so large
    # scale factors fan the independent file slices out as Ray tasks —
    # per-page RNG streams make each slice bit-identical to the serial
    # build (tests/test_links.py::test_linkpages_slice_identical_to_full)
    import ray
    if ray.is_initialized() and n_pages >= 65536:
        gen = ray.remote(num_cpus=1)(_write_slice)
        ray.get([gen.remote(i) for i in range(n_files)])
    else:
        for i in range(n_files):
            _write_slice(i)
    Path(tmp, _MARKER).touch()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
