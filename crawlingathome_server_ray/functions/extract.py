"""Fetch/extract stage functions (SURVEY.md §2.2 M10).

In the reference, fetching + text extraction happen on volunteer workers and
the server only tracks completion (reference main.py:627-697). In the
rebuild, the "fetch" reads the ``html`` binary column from the input pages
table and the extractor must reproduce the input ``text`` column
**byte-identically** (BASELINE.json input_hint per-row invariant).

The synthetic html is ``<html><body><p>TEXT</p></body></html>`` (ASCII), so
extraction is an exact inverse: strip one prefix and one suffix. Vectorized
with pyarrow string kernels; DuckDB oracle equivalent:
``substr(decode(html), 16, octet_length(html) - 33)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import HTML_PREFIX, HTML_SUFFIX

_PREFIX = HTML_PREFIX.decode()
_SUFFIX = HTML_SUFFIX.decode()


def extract_text_array(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """binary html → extracted text: one negative-stop slice (fixed-length
    wrapper), single pass over the payload bytes."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string())
    return pc.utf8_slice_codeunits(s, len(_PREFIX), -len(_SUFFIX))


def fetch_extract_batch(batch: pa.Table, verify: bool = True) -> pa.Table:
    """map_batches body: add ``text_extracted``; when ``verify``, fail loudly
    on any row where extraction is not byte-identical to ``text``."""
    extracted = extract_text_array(batch.column("html"))
    if verify and batch.num_rows:  # pc.all of an empty array is null, not True
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        eq = pc.all(pc.equal(extracted, txt))
        if eq.as_py() is not True:
            bad = pc.not_equal(extracted, txt)
            urls = batch.filter(bad).column("url").to_pylist()[:3]
            raise AssertionError(f"extract(html) != text for urls {urls}")
    return batch.append_column("text_extracted", extracted)
