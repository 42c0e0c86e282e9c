"""SURT keys + URL feature extraction (SURVEY §2.12 X66/X68).

Common Crawl's CDX index orders captures by SURT (Sort-friendly URI
Reordering Transform, the public pywb/cdxj convention): host labels
reversed and comma-joined, then ``)`` and the lowercased path+query —
``com,example,www)/path?q=1``. Sorting by SURT co-locates a registered
domain's captures, which is what makes prefix/domain range scans over a
petabyte index cheap. Reference analog: none — the reference serves
shard numbers, not a URL index; the convention is CommonCrawl-public.

Everything here is vectorized Arrow: the label reversal is offsets math
over ``split_pattern``'s ListArray (take with per-list mirrored indices),
never a Python loop over hosts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEME_AUTH = "^[a-z]+://[^/?#]*"


def _as_array(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def reverse_join_labels(arr, sep_in: str = ".", sep_out: str = ",") -> pa.Array:
    """Per-row ``sep_out.join(reversed(s.split(sep_in)))``, fully
    vectorized: split to a ListArray, build the within-list mirrored
    take indices from the offsets, take, re-wrap, binary_join."""
    arr = _as_array(arr)
    if len(arr) == 0:
        return pa.array([], pa.string())
    lst = _as_array(pc.split_pattern(arr, sep_in))
    off = np.asarray(lst.offsets, dtype=np.int64)
    lens = np.diff(off)
    # mirrored absolute index: for position p inside list i,
    # rev(p) = start_i + (end_i - 1 - p)
    parent_start = np.repeat(off[:-1], lens)
    parent_end = np.repeat(off[1:], lens)
    abs_pos = np.arange(off[0], off[-1], dtype=np.int64)
    rev_vals = lst.values.take(pa.array(parent_start + parent_end - 1 - abs_pos))
    mirrored = pa.ListArray.from_arrays(
        pa.array((off - off[0]).astype(np.int32)), rev_vals)
    return pc.binary_join(mirrored, sep_out)


def path_query_array(url_canon) -> pa.Array:
    """Path+query of a canonical URL (scheme+authority stripped; the
    canonical form has no fragment and a non-empty path)."""
    return pc.replace_substring_regex(_as_array(url_canon),
                                      pattern=_SCHEME_AUTH, replacement="")


def surt_array(url_canon, host) -> pa.Array:
    """SURT key: ``rev,host,labels)`` + lowercased path+query."""
    host_rev = reverse_join_labels(host)
    path = pc.utf8_lower(path_query_array(url_canon))
    return pc.binary_join_element_wise(host_rev, path, ")")


def surt_str(url_canon: str, host: str) -> str:
    """Scalar twin of :func:`surt_array` (tests)."""
    import re
    path = re.sub(_SCHEME_AUTH, "", url_canon)
    return ",".join(reversed(host.split("."))) + ")" + path.lower()


def url_features_table(url_canon) -> pa.Table:
    """Frontier-prioritization URL features (X68), one Arrow pass:
    ``path_depth`` = '/' count of the path (query excluded), ``n_params``
    = query-parameter count, ``ext`` = lowercased trailing extension
    token ('' when none). All expressible in ANSI SQL for the oracle."""
    url_canon = _as_array(url_canon)
    path_full = path_query_array(url_canon)
    path_only = pc.struct_field(
        pc.extract_regex(path_full, r"^(?P<p>[^?]*)"), "p")
    query = pc.fill_null(pc.struct_field(
        pc.extract_regex(path_full, r"\?(?P<q>.*)$"), "q"), "")
    depth = pc.cast(pc.count_substring(path_only, "/"), pa.int64())
    amps = pc.cast(pc.count_substring(query, "&"), pa.int64())
    n_params = pc.if_else(pc.equal(query, ""),
                          pa.scalar(0, pa.int64()),
                          pc.add(amps, pa.scalar(1, pa.int64())))
    ext = pc.utf8_lower(pc.fill_null(pc.struct_field(
        pc.extract_regex(path_only, r"\.(?P<e>[A-Za-z0-9]+)$"), "e"), ""))
    return pa.table({"url_canon": url_canon, "path_depth": depth,
                     "n_params": n_params, "ext": ext})
