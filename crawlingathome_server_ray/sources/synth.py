"""Deterministic synthetic Common-Crawl-style frontier generator.

Replaces the reference's JSON frontier bootstrap (reference update_db.py:18-111
reading shard_info/original/open/closed/open_gpu.json) with a pure function of
``(seed, scale)`` — no external data, per the rebuild rules. Produces the
``pages`` table of BASELINE.json ``input_hint`` shape:

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

Design properties (FIXTURES.md §1):
- hosts drawn from a Zipf(1.2) distribution → realistic skew for the
  politeness ``groupby(host)`` stage;
- ~0.5% exact URL duplicates and ~0.5% canonicalization-equivalent variants
  (uppercase host / explicit default port / ``#fragment``) to exercise the
  URL-seen filter;
- ``warc_ts`` strictly increasing ⇒ globally unique ⇒ first-wins dedup has a
  deterministic survivor;
- ``html`` is a reversible ASCII wrapper of ``text`` so the extractor can
  reproduce ``text`` byte-identically (per-row invariant);
- ~15% of paths under ``/private/`` so the robots prefix rule bites.

Everything is numpy-vectorized; the only per-row Python work is the final
string slicing / bytes concat. Output is cached as Parquet under
``/tmp/graft_frontier/<sf>/`` with an atomic ``_DONE`` marker so repeated
calls (tests, bench, driver) reuse it.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import HTML_PREFIX, HTML_SUFFIX, PAGES_SCHEMA, SEED_LIST_SCHEMA

# rows / hosts per scale factor (≙ FIXTURES.md sf_smoke/sf_test/sf_bench)
SF_SHAPE = {
    "sf0.001": (6_000, 60),
    "sf0.01": (60_000, 500),
    "sf0.1": (600_000, 5_000),
    # scaling-efficiency inputs: large enough that per-run fixed costs
    # (session spin-up, wave barriers, manifest IO) amortize away and the
    # N-vs-4N comparison measures the streaming pipeline itself
    "sfbench": (2_400_000, 20_000),
    "sfscale": (9_600_000, 80_000),
    # late round 4: the gpu-stage launch fold made the pipeline ~3x
    # faster at sfscale (T8 107 -> 60 s), so the FIXED sfscale input no
    # longer amortizes the session/wave floor and the strong-scaling
    # ratio compresses (Amdahl fixed-work artifact). sfxl restores the
    # work-per-core of the original measurement design.
    "sfxl": (19_200_000, 160_000),
}

_BASE_EPOCH_US = 1_614_556_800_000_000  # 2021-03-01T00:00:00Z

_VOCAB = None


def _vocab() -> list[str]:
    """Fixed ASCII vocabulary (seed-independent)."""
    global _VOCAB
    if _VOCAB is None:
        common = ("the of and to in data crawl page index fetch link text web "
                  "host shard batch stream queue filter hash table row block "
                  "der die das und les des una por con para nel alla").split()
        _VOCAB = common + [f"w{k:03d}" for k in range(480)]
    return _VOCAB


def generate_pages(seed: int, n_rows: int, n_hosts: int) -> pa.Table:
    """Pure deterministic pages table; see module docstring for properties."""
    rng = np.random.default_rng(seed)

    n_dup = max(1, n_rows // 200)      # 0.5% exact duplicates
    n_var = max(1, n_rows // 200)      # 0.5% canonicalization variants
    n_base = n_rows - n_dup - n_var

    # --- hosts: Zipf(1.2) skew ---------------------------------------------
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks ** -1.2
    p /= p.sum()
    host_ids = rng.choice(n_hosts, size=n_base, p=p)
    host_names = np.array([f"h{i:05d}.crawl-test.org" for i in range(n_hosts)])

    # --- scheme / path / query ---------------------------------------------
    https = rng.random(n_base) < 0.85
    is_private = rng.random(n_base) < 0.15
    has_query = rng.random(n_base) < 0.20
    doc_ids = np.arange(n_base)

    host_list = host_names.tolist()
    base_urls = [
        (f"https://{host_list[h]}" if sec else f"http://{host_list[h]}")
        + (f"/private/doc{j}.html" if priv else f"/docs/{j // 1000}/doc{j}.html")
        + (f"?id={j}" if q else "")
        for j, (h, sec, priv, q) in enumerate(
            zip(host_ids.tolist(), https.tolist(), is_private.tolist(),
                has_query.tolist()))
    ]

    # --- text: word salad, sliced out of one big joined string -------------
    vocab = np.array(_vocab())
    word_lens = np.char.str_len(vocab).astype(np.int64)
    n_words = rng.integers(2, 64, size=n_base)
    long_mask = rng.random(n_base) < 0.01
    n_words[long_mask] = rng.integers(200, 330, size=int(long_mask.sum()))
    flat = rng.integers(0, len(vocab), size=int(n_words.sum()))
    flat_lens = word_lens[flat] + 1                      # +1 for the space
    char_end = np.cumsum(flat_lens)
    row_word_end = np.cumsum(n_words)
    vocab_list = vocab.tolist()                          # join over python strs
    big = " ".join(map(vocab_list.__getitem__, flat.tolist())) + " "
    row_char_end = char_end[row_word_end - 1]
    row_char_start = np.concatenate(([0], row_char_end[:-1]))
    texts = [big[s:e - 1] for s, e in zip(row_char_start, row_char_end)]

    langs = rng.choice(["en", "de", "fr", "es", "nolang"], size=n_base,
                       p=[0.5, 0.15, 0.12, 0.13, 0.1])

    # --- duplicates + canonical variants -----------------------------------
    dup_src = rng.integers(0, n_base, size=n_dup)
    var_src = rng.integers(0, n_base, size=n_var)
    var_kind = rng.integers(0, 3, size=n_var)

    urls = base_urls[:]
    all_texts = list(texts)
    all_langs = langs.tolist()
    for s in dup_src:
        urls.append(base_urls[s]); all_texts.append(texts[s]); all_langs.append(langs[s])
    for s, k in zip(var_src, var_kind):
        u = base_urls[s]
        scheme, rest = u.split("://", 1)
        hostpart, pathpart = rest.split("/", 1)
        if k == 0:                       # uppercase host
            v = f"{scheme}://{hostpart.upper()}/{pathpart}"
        elif k == 1:                     # explicit default port
            port = "443" if scheme == "https" else "80"
            v = f"{scheme}://{hostpart}:{port}/{pathpart}"
        else:                            # fragment
            v = f"{u}#frag"
        urls.append(v); all_texts.append(texts[s]); all_langs.append(langs[s])

    # --- permute rows, assign strictly-increasing warc_ts ------------------
    perm = rng.permutation(n_rows)
    urls = [urls[i] for i in perm]
    all_texts = [all_texts[i] for i in perm]
    all_langs = [all_langs[i] for i in perm]
    ts = _BASE_EPOCH_US + np.cumsum(
        rng.integers(50_000, 5_000_000, size=n_rows, dtype=np.int64))

    html = [HTML_PREFIX + t.encode("ascii") + HTML_SUFFIX for t in all_texts]

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(html, pa.binary()),
        "text": pa.array(all_texts, pa.string()),
        "lang": pa.array(all_langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def generate_seed_list(seed: int, pages: pa.Table) -> pa.Table:
    """Crawl-seed subset (≙ reference bootstrap open.json, update_db.py:36)
    plus a few URLs NOT in pages (no-op fetches)."""
    rng = np.random.default_rng(seed + 1)
    urls = pages.column("url").to_pylist()
    k = max(10, len(urls) // 100)
    idx = rng.choice(len(urls), size=k, replace=False)
    sel = [urls[i] for i in idx] + [
        f"https://nowhere{j}.crawl-test.org/missing{j}.html" for j in range(5)]
    prio = rng.integers(0, 4, size=len(sel)).astype(np.int32)
    return pa.table({"url": pa.array(sel, pa.string()),
                     "priority": pa.array(prio, pa.int32())},
                    schema=SEED_LIST_SCHEMA)


_SNAP_DAY_US = 30 * 86_400_000_000  # snapshot B recrawl lag: 30 days


def snapshot2_batch(b: pa.Table) -> pa.Table:
    """Derive crawl snapshot B from one batch of snapshot A (the pages
    table) as a pure VECTORIZED function of each row's url — no RNG and
    no cross-row state, so (a) the DuckDB oracle for the snapshot-delta
    operator never needs to reproduce this code, only to read both
    parquet trees, and (b) the derivation streams through ``map_batches``
    at any scale (the first version materialized the whole pages table on
    the driver and built rows in a Python loop: measured 162 s at sfbench
    2.4M rows; this Arrow-kernel path is the fix):

    - md5(url) first hex digit '0'  → page gone in B (removed);
    - first hex digit '1'           → content changed (text + " v2",
      html re-wrapped so the extract invariant still holds);
    - first hex digit '2'           → B additionally gained a NEW sibling
      url (``?v=2`` query variant) — the 'added' leg;
    - everything else unchanged (same text; warc_ts still advances —
      a recrawl observes old content at a new time, and the delta is
      defined on CONTENT hashes, not timestamps).
    """
    import pyarrow.compute as pc

    from ..functions.canonicalize import md5_hash64

    url = b.column("url").combine_chunks() \
        if isinstance(b.column("url"), pa.ChunkedArray) else b.column("url")
    text = b.column("text").combine_chunks() \
        if isinstance(b.column("text"), pa.ChunkedArray) else b.column("text")
    lang = b.column("lang")
    digit = (md5_hash64(url) >> np.uint64(60)).astype(np.int64)
    ts = b.column("warc_ts").cast(pa.int64()).to_numpy() + _SNAP_DAY_US

    def _html(text_arr: pa.Array) -> pa.Array:
        # string → binary cast is a zero-copy utf-8 view (non-ASCII safe)
        return pc.binary_join_element_wise(
            pa.scalar(HTML_PREFIX, pa.binary()),
            text_arr.cast(pa.binary()),
            pa.scalar(HTML_SUFFIX, pa.binary()),
            pa.scalar(b"", pa.binary()))

    def _mk(urls, ts_np, texts, langs) -> pa.Table:
        return pa.table({
            "url": urls,
            "warc_ts": pa.array(ts_np, pa.timestamp("us")),
            "html": _html(texts),
            "text": texts,
            "lang": langs,
        }, schema=PAGES_SCHEMA)

    text_v2 = pc.if_else(pa.array(digit == 1),
                         pc.binary_join_element_wise(text, "v2", " "), text)
    keep = np.flatnonzero(digit != 0)
    kept = _mk(url.take(keep), ts[keep], text_v2.take(keep), lang.take(keep))

    add = np.flatnonzero(digit == 2)
    urls_a = url.take(add)
    sep = pc.if_else(pc.match_substring(urls_a, "?"),
                     pa.scalar("&v=2"), pa.scalar("?v=2"))
    added = _mk(pc.binary_join_element_wise(urls_a, sep, ""), ts[add] + 1,
                pc.binary_join_element_wise(text.take(add), "new", " "),
                lang.take(add))
    return pa.concat_tables([kept, added])


def ensure_snapshot2(sf_dir: str, seed: int = 42,
                     root: str = "/tmp/graft_frontier") -> str:
    """Idempotently materialize crawl snapshot B next to the frontier
    (``<root>/<sf>/pages2/``); returns the pages2 directory.

    Streaming: the derivation is ``snapshot2_batch`` over the pages
    parquet — via Ray Data ``map_batches`` → ``write_parquet`` when a Ray
    session exists (every pipeline/bench/test path), else a per-fragment
    pyarrow loop (same vectorized kernel, one fragment in memory at a
    time). Never materializes the corpus on the driver. Built under a
    temp dir and renamed atomically; only COMPLETE trees are ever renamed
    into place, so an existing ``pages2/`` without the done marker (a
    crash between rename and touch) is finished work — re-mark it instead
    of regenerating forever against ENOTEMPTY."""
    import shutil
    out_root = ensure_frontier(sf_dir, seed, root)
    p2 = os.path.join(out_root, "pages2")
    done = os.path.join(out_root, "_DONE_SNAP2")
    if os.path.exists(done):
        return p2
    if os.path.isdir(p2):
        Path(done).touch()
        return p2
    import ray
    import ray.data
    pages_dir = os.path.join(out_root, "pages")
    cols = ["url", "warc_ts", "text", "lang"]  # html re-derived from text
    tmp = tempfile.mkdtemp(dir=out_root, prefix=".snap2-")
    if ray.is_initialized():
        (ray.data.read_parquet(pages_dir, columns=cols)
         .map_batches(snapshot2_batch, batch_format="pyarrow",
                      batch_size=65536)
         .write_parquet(tmp))
    else:
        import pyarrow.dataset as pads
        import pyarrow.parquet as _pq
        for i, frag in enumerate(pads.dataset(pages_dir).get_fragments()):
            t = snapshot2_batch(frag.to_table(columns=cols))
            _pq.write_table(t, os.path.join(tmp, f"part-{i:04d}.parquet"),
                            row_group_size=max(8192, t.num_rows // 4 or 1))
    try:
        os.rename(tmp, p2)
        Path(done).touch()
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.isdir(p2):  # lost the race to a concurrent builder
            Path(done).touch()
    return p2


def sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_SHAPE else "sf0.01"


def frontier_dir(sf_dir: str, root: str = "/tmp/graft_frontier") -> str:
    return os.path.join(root, sf_name(sf_dir))


_LAYOUT_MARKER = "_DONE_v2"  # v2: pages/ is a DIRECTORY of part files


def ensure_frontier(sf_dir: str, seed: int = 42,
                    root: str = "/tmp/graft_frontier") -> str:
    """Idempotently materialize the synthetic frontier for a scale factor.

    ``pages/`` is written as multiple part files (a single parquet file
    reads as ONE Ray task — measured to serialize the whole bootstrap
    read). Built under a temp dir and renamed atomically, so concurrent
    callers (Ray pipeline vs DuckDB oracle) always see either nothing or a
    complete frontier.
    """
    import shutil
    out = frontier_dir(sf_dir, root)
    done = os.path.join(out, _LAYOUT_MARKER)
    if os.path.exists(done):
        return out
    if os.path.exists(out):  # stale v1 layout
        shutil.rmtree(out, ignore_errors=True)
    n_rows, n_hosts = SF_SHAPE[sf_name(sf_dir)]
    pages = generate_pages(seed, n_rows, n_hosts)
    seeds = generate_seed_list(seed, pages)
    Path(root).mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=".build-")
    pdir = Path(tmp, "pages")
    pdir.mkdir()
    n_files = max(8, min(64, n_rows // 50_000)) if n_rows >= 16_000 else 4
    step = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        sl = pages.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, str(pdir / f"part-{i:04d}.parquet"),
                           row_group_size=max(8192, step // 4))
    pq.write_table(seeds, os.path.join(tmp, "seed_list.parquet"))
    Path(os.path.join(tmp, _LAYOUT_MARKER)).touch()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
