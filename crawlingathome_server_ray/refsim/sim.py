"""Reference-semantics oracle: a pure-Python, single-threaded simulator of
the crawl pipeline's *semantics* (SURVEY.md §5.2).

This is the golden model the Ray pipeline must reproduce at any CPU count:
dispatch ordering (seeded permutation ≙ reference models.py:112 ``ORDER BY
RANDOM()`` made deterministic), the URL-seen set, robots blocking,
politeness ranks, the two-stage CPU→GPU state machine including the
"postgres" short-circuit (reference main.py:413-415), per-partition
counters, and the leaderboard accumulation (reference main.py:428-435,
661-694).

Deliberately independent implementations: ``urllib.parse`` for URL
canonicalization (the pipeline uses pyarrow regex kernels), plain dict/set
state (the pipeline uses bloom actor shards + manifests). Shared with the
pipeline are only the *specifications*: md5-based rules, seeds, budgets.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from urllib.parse import urlsplit

import pyarrow as pa

from ..config import PipelineConfig


def canon(url: str) -> str:
    u = urlsplit(url)
    scheme, netloc = u.scheme.lower(), u.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    # '/' only when path AND query are both empty — matches the vectorized
    # regex impl and the SQL oracle, where rest = everything after authority
    path = u.path if (u.path or u.query) else "/"
    q = f"?{u.query}" if u.query else ""
    return f"{scheme}://{netloc}{path}{q}"


def host_of(url_canon: str) -> str:
    n = urlsplit(url_canon).netloc
    return n.rsplit(":", 1)[0] if ":" in n else n


def partition_of(host: str, hex_chars: int) -> int:
    return int(hashlib.md5(host.encode()).hexdigest()[:hex_chars], 16)


def robots_allows(host: str, url_canon: str) -> bool:
    h = hashlib.md5(host.encode()).hexdigest()
    if h[:2] <= "05":
        return False
    path = url_canon.split("://", 1)[1]
    path = path[path.find("/"):] if "/" in path else "/"
    if h[2] in ("a", "b") and path.startswith("/private/"):
        return False
    return True


def dispatch_order(pids: list[int], seed: int) -> list[int]:
    return sorted(pids, key=lambda p: hashlib.md5(f"{seed}|{p}".encode()).hexdigest())


def is_postgres(seed: int, pid: int,
                shortcircuit_hex: tuple = ("0", "1")) -> bool:
    return (hashlib.md5(f"store|{seed}|{pid}".encode()).hexdigest()[0]
            in shortcircuit_hex)


def nickname(seed: int, idx: int, words: list[str]) -> str:
    h = hashlib.md5(f"name|{seed}|{idx}".encode()).digest()
    a = int.from_bytes(h[0:4], "big") % len(words)
    b = int.from_bytes(h[4:8], "big") % len(words)
    c = int.from_bytes(h[8:12], "big") % 1000
    return f"{words[a]}-{words[b]}-{c}"


@dataclass
class SimResult:
    dispatch: list[int] = field(default_factory=list)
    seen_urls: set = field(default_factory=set)            # all canon urls observed
    fetched: dict[int, set] = field(default_factory=dict)  # pid -> fetched canon urls
    blocked: dict[int, set] = field(default_factory=dict)  # pid -> robots-blocked
    counters: dict[int, dict] = field(default_factory=dict)
    rank: dict[str, tuple[int, int]] = field(default_factory=dict)  # canon -> (rank, round)
    states: dict[int, str] = field(default_factory=dict)
    leaderboard: dict[str, dict] = field(default_factory=dict)
    pairs_total: int = 0


def simulate(pages: pa.Table, cfg: PipelineConfig,
             nickname_pool: int = 5, words: list[str] | None = None,
             seed_urls: list[str] | None = None) -> SimResult:
    from ..stages.dispatch import _DEFAULT_WORDS
    words = words or _DEFAULT_WORDS
    # refsim deliberately re-implements canonicalization with stdlib only
    # (independence discipline); it does NOT implement the optional RFC 3986
    # percent-normalization, so refuse rather than silently diverge
    assert not getattr(cfg, "pct_normalize_urls", False), \
        "refsim does not model pct_normalize_urls=True"
    urls = pages.column("url").to_pylist()
    texts = pages.column("text").to_pylist()

    # canonical view; survivor text is identical for all rows of a canon URL
    by_partition: dict[int, dict[str, tuple[str, str]]] = {}
    res = SimResult()
    for u, t in zip(urls, texts):
        c = canon(u)
        h = host_of(c)
        pid = partition_of(h, cfg.partition_hex_chars)
        part = by_partition.setdefault(pid, {})
        if c not in part:
            part[c] = (h, t)

    seed_canon = {canon(u) for u in (seed_urls or [])}
    res.dispatch = dispatch_order(sorted(by_partition), cfg.seed)
    n_rows_in_part: dict[int, int] = {}
    for u in urls:
        pid = partition_of(host_of(canon(u)), cfg.partition_hex_chars)
        n_rows_in_part[pid] = n_rows_in_part.get(pid, 0) + 1

    for pid in res.dispatch:
        part = by_partition[pid]
        res.seen_urls.update(part)
        fetched, blocked = set(), set()
        by_host: dict[str, list[str]] = {}
        for c, (h, t) in part.items():
            if robots_allows(h, c):
                fetched.add(c)
                by_host.setdefault(h, []).append(c)
            else:
                blocked.add(c)
        for h, cs in by_host.items():
            # flagship order: seed-listed URLs first, then url_canon
            ordered = sorted(cs, key=lambda c: (0 if c in seed_canon else 1, c))
            for i, c in enumerate(ordered, start=1):
                res.rank[c] = (i, (i - 1) // cfg.politeness_budget)
        pairs = sum(len(part[c][1].split()) for c in fetched)
        res.fetched[pid] = fetched
        res.blocked[pid] = blocked
        res.counters[pid] = {
            "urls_seen": n_rows_in_part[pid],
            "urls_deduped": n_rows_in_part[pid] - len(part),
            "robots_blocked": len(blocked),
            "urls_fetched": len(fetched),
        }
        res.states[pid] = "closed"
        if is_postgres(cfg.seed, pid, cfg.postgres_shortcircuit_hex):
            nick = nickname(cfg.seed + 1, pid % nickname_pool, words)
            lb = res.leaderboard.setdefault(nick, {"jobs": 0, "pairs": 0})
            lb["jobs"] += 1
        else:
            res.counters[pid]["pairs_scraped"] = pairs
            res.pairs_total += pairs
            nick = nickname(cfg.seed, pid % nickname_pool, words)
            lb = res.leaderboard.setdefault(nick, {"jobs": 0, "pairs": 0})
            lb["jobs"] += 1
            lb["pairs"] += pairs
    return res
