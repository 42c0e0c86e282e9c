"""DuckDB oracle SQL for every SQL-expressible operator.

The frontier queries run over the deterministic synthetic pages parquet
(materialized by sources/synth.py under /tmp/graft_frontier/<sf>/); the SQL
here recomputes canonicalization / md5-hash-partitioning / robots rules /
politeness ranking entirely in ANSI SQL so DuckDB independently reproduces
the Ray results value-for-value. Analytics oracles (in __ray_entry__) run on
the driver's pre-registered TPC-H-ish views instead.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG

PAGES_SF001 = "/tmp/graft_frontier/sf0.01/pages"

# shared CTE chain: canon → dedup → gated → ranked
_CTE = """
WITH raw AS (
  SELECT url, warc_ts, html, text,
    lower(regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^#]*)', 1)) AS scheme,
    lower(regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^#]*)', 2)) AS auth0,
    regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^#]*)', 3) AS rest
  FROM read_parquet('{pages}/*.parquet')
), canon AS (
  SELECT url, warc_ts, html, text,
    scheme || '://' || auth || (CASE WHEN rest = '' THEN '/' ELSE rest END) AS url_canon,
    regexp_replace(auth, ':[0-9]*$', '') AS host
  FROM (
    SELECT *, CASE WHEN scheme = 'http'  THEN regexp_replace(auth0, ':80$', '')
                   WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
                   ELSE auth0 END AS auth
    FROM raw)
), dedup AS (
  SELECT * FROM canon
  QUALIFY row_number() OVER (PARTITION BY url_canon ORDER BY warc_ts) = 1
), gated AS (
  SELECT *,
    NOT (substr(md5(host), 1, 2) <= '05'
         OR (substr(md5(host), 3, 1) IN ('a', 'b')
             AND regexp_replace(url_canon, '^[^:]+://[^/?#]*', '') LIKE '/private/%'))
    AS allowed
  FROM dedup
), ranked AS (
  SELECT host, url_canon,
    row_number() OVER (PARTITION BY host ORDER BY warc_ts, url_canon) AS politeness_rank
  FROM gated WHERE allowed
)
"""


def frontier_oracle_sql(pages_path: str = PAGES_SF001,
                        budget: int = DEFAULT_CONFIG.politeness_budget,
                        seed: int = DEFAULT_CONFIG.seed,
                        recrawl_k: int = 100,
                        pattern_k: int = 3,
                        cdx_k: int = 3) -> dict[str, str]:
    cte = _CTE.format(pages=pages_path)
    return {
        "url_canonicalize": cte + """
SELECT url, url_canon, host FROM canon""",

        "url_dedup_exact": cte + """
SELECT url_canon, url, warc_ts FROM dedup""",

        "robots_gate": cte + """
SELECT url_canon, host, allowed FROM gated""",

        "politeness_rank": cte + f"""
SELECT host, url_canon, politeness_rank,
       (politeness_rank - 1) // {budget} AS fetch_round
FROM ranked""",

        "dispatch_order": cte + f"""
SELECT CAST(partition_id AS INTEGER) AS partition_id,
       row_number() OVER (ORDER BY md5('{seed}|' || partition_id)) AS dispatch_rank
FROM (SELECT DISTINCT strpos('0123456789abcdef', substr(md5(host), 1, 1)) - 1
        AS partition_id
      FROM gated WHERE allowed)""",

        "extract_text": f"""
SELECT url, warc_ts,
       substr(decode(html), 16, octet_length(html) - 33) AS text_extracted
FROM read_parquet('{pages_path}/*.parquet')""",

        "host_heavy_hitters": cte + """
SELECT host, count(*) AS n_urls FROM canon
GROUP BY host
HAVING count(*) > (SELECT count(*) FROM canon) * 0.01""",

        "frontier_counters": cte + f"""
SELECT (SELECT count(*) FROM canon)  AS n_pages,
       (SELECT count(*) FROM dedup)  AS n_unique,
       (SELECT count(*) FROM canon) - (SELECT count(*) FROM dedup) AS n_dups_removed,
       (SELECT count(*) FROM gated WHERE NOT allowed) AS n_blocked,
       (SELECT count(*) FROM gated WHERE allowed)     AS n_allowed,
       (SELECT count(DISTINCT host) FROM gated WHERE allowed) AS n_hosts,
       (SELECT count(*) FROM ranked WHERE politeness_rank <= {budget}) AS n_round0""",

        "recrawl_priority": cte + f""", hc AS (
  SELECT host, CAST(count(*) AS BIGINT) AS host_pages,
         max(warc_ts) AS mx
  FROM dedup GROUP BY host
), mts AS (SELECT max(mx) AS m FROM hc)
SELECT url_canon, d.host,
       CAST(epoch_us(m) - epoch_us(d.warc_ts) AS BIGINT) AS age_us,
       host_pages
FROM dedup d JOIN hc ON d.host = hc.host, mts
ORDER BY (epoch_us(m) - epoch_us(d.warc_ts)) * ln(1 + host_pages) DESC,
         url_canon
LIMIT {recrawl_k}""",

        "url_pattern_mine": cte + f""", segs AS (
  SELECT host,
         regexp_extract(url_canon, '^[a-z]+://[^/]+/([^/?#]*)', 1) AS seg,
         CAST(count(*) AS BIGINT) AS n
  FROM canon GROUP BY 1, 2)
SELECT host, seg, n,
       row_number() OVER (PARTITION BY host
                          ORDER BY n DESC, seg) AS seg_rank
FROM segs QUALIFY seg_rank <= {pattern_k}""",

        "crawl_schedule_occupancy": cte + f"""
SELECT (politeness_rank - 1) // {budget} AS fetch_round,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM ranked GROUP BY 1""",

        # SURT / CDX family (X66-X68): surted CTE computes the public
        # CommonCrawl/pywb CDXJ sort key entirely in ANSI SQL
        "url_surt_key": cte + r""", surted AS (
  SELECT host, url_canon,
    array_to_string(list_reverse(string_split(host, '.')), ',') || ')' ||
      lower(regexp_replace(url_canon, '^[a-z]+://[^/?#]*', '')) AS surt
  FROM dedup)
SELECT host, url_canon, surt,
       row_number() OVER (PARTITION BY host
                          ORDER BY surt, url_canon) AS cdx_pos
FROM surted""",

        "cdx_prefix_lookup": cte + rf""", surted AS (
  SELECT host, url_canon, CAST(epoch_us(warc_ts) AS BIGINT) AS ts_us,
    array_to_string(list_reverse(string_split(host, '.')), ',') || ')' ||
      lower(regexp_replace(url_canon, '^[a-z]+://[^/?#]*', '')) AS surt
  FROM dedup)
SELECT host, surt, url_canon, ts_us FROM surted
WHERE host IN (SELECT DISTINCT host FROM dedup ORDER BY host LIMIT {cdx_k})""",

        "host_lookalikes": cte + r""", hosts AS (
  SELECT DISTINCT host FROM canon),
vars AS (
  SELECT host, i, substr(host, 1, i - 1) || substr(host, i + 1) AS v
  FROM hosts, LATERAL unnest(range(1, length(host) + 1)) AS t(i)),
sub AS (
  SELECT DISTINCT a.host AS host_a, b.host AS host_b,
         'substitution' AS kind
  FROM vars a JOIN vars b ON a.v = b.v AND a.i = b.i AND a.host < b.host),
del AS (
  SELECT DISTINCT least(a.host, b.host) AS host_a,
         greatest(a.host, b.host) AS host_b, 'indel' AS kind
  FROM vars a JOIN hosts b ON a.v = b.host AND a.host <> b.host)
SELECT * FROM sub UNION SELECT * FROM del""",

        "url_features": cte + r""", pq AS (
  SELECT url_canon,
         regexp_replace(url_canon, '^[a-z]+://[^/?#]*', '') AS path_full
  FROM dedup), f AS (
  SELECT url_canon,
         regexp_extract(path_full, '^([^?]*)', 1) AS path_only,
         CASE WHEN strpos(path_full, '?') > 0
              THEN substr(path_full, strpos(path_full, '?') + 1)
              ELSE '' END AS q
  FROM pq)
SELECT url_canon,
  CAST(length(path_only) - length(replace(path_only, '/', '')) AS BIGINT)
    AS path_depth,
  CAST(CASE WHEN q = '' THEN 0
       ELSE length(q) - length(replace(q, '&', '')) + 1 END AS BIGINT)
    AS n_params,
  lower(regexp_extract(path_only, '\.([A-Za-z0-9]+)$', 1)) AS ext
FROM f""",
    }
