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

(Percent-encoding normalization is OFF by default — the oracle-parity
canonical form. Real crawl frontiers need it (``%7E`` vs ``~`` dupes
survive dedup otherwise), so it is available behind
``pct_normalize=True`` / ``PipelineConfig.pct_normalize_urls``: RFC 3986
§6.2.2 — decode %XX escapes of unreserved characters, uppercase the hex
of the rest. Rows without '%' take the vectorized fast path untouched;
the rare '%' rows are normalized per-row.)

Hashing is md5-based for the same reason: ``url_hash`` = first 8 bytes of
``md5(url_canon)`` (big-endian uint64), ``partition_id`` = the first
``partition_hex_chars`` hex chars of the digest (16 or 256 partitions) —
both reproducible in DuckDB via ``md5()``.

All column work is vectorized: pyarrow.compute regex/string kernels for the
canonical form; md5 via DuckDB's in-process ``md5_number_upper`` C kernel
(~0.13 µs/row vs ~0.9 µs/row for a per-row ``hashlib`` loop — measured
best-of-5 on 200k URLs; a numpy-vectorized md5 was also tried and lost to
the hashlib loop at 1.24 µs/row on memory traffic). The hashlib loop is
kept as the no-duckdb fallback and as the property-test twin.
"""

from __future__ import annotations

import hashlib
import threading

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DUCK = threading.local()


def _duck():
    """Per-thread in-process DuckDB connection (vectorized md5 kernel host).

    One lazy connection per (worker process, thread): Ray map tasks run one
    at a time per worker process, so in practice this is one ~nothing-sized
    connection per worker, reused across batches.
    """
    con = getattr(_DUCK, "con", None)
    if con is None:
        import duckdb
        con = duckdb.connect()
        _DUCK.con = con
    return con


def _as_string_array(strings) -> pa.Array:
    if isinstance(strings, pa.ChunkedArray):
        return strings.combine_chunks()
    if isinstance(strings, pa.Array):
        return strings
    return pa.array(list(strings) if not isinstance(strings, np.ndarray)
                    else strings, pa.string())

_URL_RE = r"^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)(?P<rest>[^#]*)"

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_HEX = frozenset("0123456789abcdefABCDEF")


def pct_normalize_str(s: str) -> str:
    """RFC 3986 §6.2.2 percent-encoding normalization (scalar twin):
    %XX of an unreserved character → the literal character; any other
    well-formed escape → uppercase hex; malformed '%' left untouched."""
    i = 0
    out = []
    while True:
        j = s.find("%", i)
        if j < 0:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i:j])
        hx = s[j + 1:j + 3]
        if len(hx) == 2 and hx[0] in _HEX and hx[1] in _HEX:
            ch = chr(int(hx, 16))
            out.append(ch if ch in _UNRESERVED else "%" + hx.upper())
            i = j + 3
        else:
            out.append("%")
            i = j + 1


def _pct_normalize_array(arr: pa.Array) -> pa.Array:
    """Vectorized wrapper: rows without '%' (the overwhelming majority of a
    real frontier) pass through zero-copy; only '%' rows are rebuilt."""
    has = pc.match_substring(arr, "%")
    if pc.any(has).as_py() is not True:
        return arr
    vals = np.asarray(arr, dtype=object)
    mask = np.asarray(has)
    vals[mask] = [pct_normalize_str(s) for s in vals[mask]]
    return pa.array(vals, pa.string())


def canonicalize_array(urls: pa.ChunkedArray | pa.Array,
                       pct_normalize: bool = False) -> tuple[pa.Array, pa.Array]:
    """Vectorized: urls → (url_canon, host). ``pct_normalize`` decodes
    BEFORE parsing/case-folding (so ``%41`` in the authority lowercases
    like a literal 'A' would); decoding never introduces a parsing
    delimiter because :/?#%/ are all reserved and stay encoded."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if pct_normalize:
        urls = _pct_normalize_array(urls)
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


def md5_hash64_slow(strings) -> np.ndarray:
    """Per-row hashlib twin of :func:`md5_hash64` (fallback + property-test
    oracle for the vectorized kernel)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
    return out


def md5_hash64(strings) -> np.ndarray:
    """uint64 from the first 8 bytes (big-endian) of md5(s), vectorized.

    DuckDB's ``md5_number_upper`` returns those 8 bytes as a little-endian
    uint64; a numpy byteswap converts to the big-endian value
    ``int.from_bytes(md5(s).digest()[:8], "big")`` — bit-identical to the
    hashlib loop (asserted in tests/test_functions.py).
    """
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        t = pa.table({"s": arr})
        con = _duck()
        con.register("_md5_t", t)
        try:
            out = con.execute(
                "SELECT md5_number_upper(s) AS h FROM _md5_t").arrow()
        finally:
            con.unregister("_md5_t")
        return np.asarray(out.column("h"), dtype=np.uint64).byteswap()
    except ImportError:
        return md5_hash64_slow(arr.to_pylist())


def md5_partition(strings, hex_chars: int) -> np.ndarray:
    """int32 partition id = int(md5(s)[:hex_chars], 16) — the top
    ``4*hex_chars`` bits of the big-endian digest, so it rides the same
    vectorized kernel as :func:`md5_hash64`. SQL equivalent:
    ``strpos('0123456789abcdef', substr(md5(s), i, 1))`` positional math."""
    return (md5_hash64(strings) >> np.uint64(64 - 4 * hex_chars)).astype(np.int32)


def md5_hex(strings) -> pa.Array:
    """Vectorized full md5 hexdigest column (DuckDB kernel; hashlib
    fallback). Used where a 128-bit content key is needed (doc dedup)."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return pa.array([], pa.string())
    try:
        t = pa.table({"s": arr})
        con = _duck()
        con.register("_md5_t", t)
        try:
            out = con.execute("SELECT md5(s) AS h FROM _md5_t").arrow()
        finally:
            con.unregister("_md5_t")
        col = out.column("h")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    except ImportError:
        return pa.array([hashlib.md5(s.encode()).hexdigest()
                         for s in arr.to_pylist()], pa.string())


def canonicalize_batch(batch: pa.Table, hex_chars: int = 1,
                       pct_normalize: bool = False) -> pa.Table:
    """map_batches body: append url_canon/host/url_hash/partition_id.

    ``url_hash`` = md5(url_canon) (the dedup key); ``partition_id`` =
    md5(host) prefix (the dispatch/politeness unit — every host maps to
    exactly one partition, so per-host politeness is partition-local).
    Both ride the vectorized DuckDB md5 kernel; hashing all rows directly
    beats a unique+scatter dance (np.unique on object strings costs more
    than the hash itself).
    """
    canon, host = canonicalize_array(batch.column("url"), pct_normalize)
    hashes = md5_hash64(canon)
    parts = md5_partition(host, hex_chars)
    return (batch
            .append_column("url_canon", canon)
            .append_column("host", host)
            .append_column("url_hash", pa.array(hashes, pa.uint64()))
            .append_column("partition_id", pa.array(parts, pa.int32())))


def canonicalize_url(url: str, pct_normalize: bool = False) -> str:
    """Scalar reference implementation (used by refsim + tests)."""
    if pct_normalize:
        url = pct_normalize_str(url)  # decode-then-parse, as the kernel does
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
