"""URL canonicalization + hashing (rebuild-new operator M8/M9 of SURVEY.md §2.2).

The reference keys its frontier on shard ``number`` (reference models.py:14,
update_db.py:12-16); the rebuild's north_rule upgrades the frontier key to a
canonicalized-URL hash. Canonicalization is deliberately chosen to be exactly
expressible in ANSI SQL (regex + lower + conditional default-port strip) so
the DuckDB oracle can verify it value-for-value:

    1. drop the ``#fragment``;
    2. lowercase scheme and authority;
    3. strip the scheme's default port (``:80`` http / ``:443`` https);
    4. empty path → ``/``.

(Percent-encoding normalization is intentionally out of scope — documented
trade-off for oracle parity.)

Hashing is md5-based for the same reason: ``url_hash`` = first 8 bytes of
``md5(url_canon)`` (big-endian uint64), ``partition_id`` = the first
``partition_hex_chars`` hex chars of the digest (16 or 256 partitions) —
both reproducible in DuckDB via ``md5()``. At 10^10-URL production scale
this becomes xxhash64 with more partitions; the md5 version is the
correctness-auditable reference implementation.

All column work is vectorized: pyarrow.compute regex/string kernels for the
canonical form; md5 over the (much smaller) set of *unique* canonical URLs
per batch, scattered back via numpy take.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = r"^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)(?P<rest>[^#]*)"


def canonicalize_array(urls: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """Vectorized: urls → (url_canon, host)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(ex, "auth"))
    auth = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(auth, ":80$", ""),
                      pc.if_else(pc.equal(scheme, "https"),
                                 pc.replace_substring_regex(auth, ":443$", ""),
                                 auth))
    rest = pc.struct_field(ex, "rest")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    canon = pc.binary_join_element_wise(scheme, pa.scalar("://"), auth, rest,
                                        pa.scalar(""))
    host = pc.replace_substring_regex(auth, ":[0-9]*$", "")
    return canon, host


def md5_hash64(strings: np.ndarray) -> np.ndarray:
    """uint64 from the first 8 bytes (big-endian) of md5(s)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
    return out


def md5_partition(strings: np.ndarray, hex_chars: int) -> np.ndarray:
    """int32 partition id = int(md5(s)[:hex_chars], 16); SQL equivalent:
    ``strpos('0123456789abcdef', substr(md5(s), i, 1))`` positional math."""
    out = np.empty(len(strings), dtype=np.int32)
    for i, s in enumerate(strings):
        out[i] = int(hashlib.md5(s.encode()).hexdigest()[:hex_chars], 16)
    return out


def canonicalize_batch(batch: pa.Table, hex_chars: int = 1) -> pa.Table:
    """map_batches body: append url_canon/host/url_hash/partition_id.

    ``url_hash`` = md5(url_canon) (the dedup key); ``partition_id`` =
    md5(host) prefix (the dispatch/politeness unit — every host maps to
    exactly one partition, so per-host politeness is partition-local).
    md5 is computed once per unique value per batch and scattered back.
    """
    canon, host = canonicalize_array(batch.column("url"))
    canon_np = np.asarray(canon)
    uniq, inv = np.unique(canon_np, return_inverse=True)
    hashes = md5_hash64(uniq)[inv]
    host_np = np.asarray(host)
    huniq, hinv = np.unique(host_np, return_inverse=True)
    parts = md5_partition(huniq, hex_chars)[hinv]
    return (batch
            .append_column("url_canon", canon)
            .append_column("host", host)
            .append_column("url_hash", pa.array(hashes, pa.uint64()))
            .append_column("partition_id", pa.array(parts, pa.int32())))


def canonicalize_url(url: str) -> str:
    """Scalar reference implementation (used by refsim + tests)."""
    nofrag = url.split("#", 1)[0]
    scheme, rest = nofrag.split("://", 1)
    scheme = scheme.lower()
    slash = rest.find("/")
    q = rest.find("?")
    cut = min(x for x in (slash, q, len(rest)) if x >= 0)
    auth, path = rest[:cut].lower(), rest[cut:]
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    return f"{scheme}://{auth}{path or '/'}"


def host_of(url_canon: str) -> str:
    auth = url_canon.split("://", 1)[1]
    for sep in "/?":
        i = auth.find(sep)
        if i >= 0:
            auth = auth[:i]
    return auth.rsplit(":", 1)[0] if ":" in auth and auth.rsplit(":", 1)[1].isdigit() else auth
