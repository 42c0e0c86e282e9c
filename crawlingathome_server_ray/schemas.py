"""Explicit Arrow schemas (≙ the reference's fixed Tortoise ORM schema,
reference models.py:10-100; dynamic inference disabled by validating reads).

The ``pages`` schema is the authoritative input shape from BASELINE.json
``input_hint``: (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string).
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# derived columns added by the canonicalize stage
CANON_COLUMNS = {
    "url_canon": pa.string(),
    "host": pa.string(),
    "url_hash": pa.uint64(),
    "partition_id": pa.int32(),
}

SEED_LIST_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("priority", pa.int32()),
])

ROBOTS_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("disallow_all", pa.bool_()),
    ("disallow_prefix", pa.string()),  # "" = none
])

LEADERBOARD_EVENTS_SCHEMA = pa.schema([
    ("nickname", pa.string()),
    ("jobs_completed", pa.int64()),
    ("pairs_scraped", pa.int64()),
    ("worker_type", pa.string()),
    ("completed_ts", pa.timestamp("us")),
])

# html wrapper used by the synthetic generator; the extractor inverts it
# byte-identically (per-row invariant from BASELINE.json input_hint).
HTML_PREFIX = b"<html><body><p>"
HTML_SUFFIX = b"</p></body></html>"


def validate_pages(schema: pa.Schema) -> None:
    """Fail fast on schema drift (≙ reference generate_schemas at
    main.py:855 creating a fixed shape)."""
    for f in PAGES_SCHEMA:
        got = schema.field(f.name).type if f.name in schema.names else None
        if got != f.type:
            raise ValueError(
                f"pages schema mismatch for {f.name!r}: want {f.type}, got {got}")
