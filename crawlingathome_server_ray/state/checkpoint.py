"""Per-partition checkpoint manifests — the rebuild's frontier state store.

Replaces the reference's mutable ``Job`` rows in Postgres (reference
models.py:10-47) with append-only, atomically-renamed JSON manifests: one
file per partition under ``<root>/manifest/part-<id>.json``. The state
machine mirrors the reference's lifecycle comment (reference models.py:6-7)
exactly:

    open  ──claim──▶ leased ──stage-1 done──▶ gpu ──claim──▶ leased ──▶ closed
                        │
                        └── "postgres" in gpu_url ⇒ closed directly
                            (reference main.py:413-415, 650-652)

plus the reaper semantics (reference main.py:748-759): a ``leased`` manifest
whose ``lease_ts`` is older than ``lease_timeout_s`` is treated as ``open``
on resume. Closing an already-closed partition is a no-op (idempotent
replay, ≙ the ``closed=False`` guards at reference main.py:639-640).

Each manifest carries lineage (input path, seed, stage versions) and the
partition's counters — the resumability + metrics contract of the
north_rule. Bloom seen-filter snapshots are committed *with* the manifest
(same commit call) so a resume never observes counters/seen-set divergence.
"""

from __future__ import annotations

import json
import os
import pickle
import tempfile
import time
from pathlib import Path

STAGE_VERSIONS = {"canonicalize": 1, "seen_filter": 1, "robots": 1,
                  "politeness": 1, "fetch_extract": 1}

OPEN, LEASED, GPU, CLOSED = "open", "leased", "gpu", "closed"
_VALID = {OPEN: {LEASED}, LEASED: {GPU, CLOSED, OPEN}, GPU: {LEASED}, CLOSED: set()}


class Manifest:
    def __init__(self, root: str, lease_timeout_s: int = 7200):
        self.root = Path(root)
        self.dir = self.root / "manifest"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.lease_timeout_s = lease_timeout_s

    # -- IO ------------------------------------------------------------
    def _path(self, pid: int) -> Path:
        return self.dir / f"part-{pid:05d}.json"

    def _write_atomic(self, path: Path, obj: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=str(path.parent), prefix=".tmp-")
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True)
        os.rename(tmp, path)

    def read(self, pid: int) -> dict | None:
        p = self._path(pid)
        if not p.exists():
            return None
        with open(p) as f:
            return json.load(f)

    # -- state machine -------------------------------------------------
    def state(self, pid: int, now: float | None = None) -> str:
        m = self.read(pid)
        if m is None:
            return OPEN
        s = m["state"]
        if s == LEASED:  # reaper: expired lease re-opens (reference main.py:748-759)
            if (now or time.time()) - m.get("lease_ts", 0) > self.lease_timeout_s:
                return OPEN
        return s

    def transition(self, pid: int, new_state: str, *, completor: str | None = None,
                   gpu_url: str | None = None, counters: dict | None = None,
                   lineage: dict | None = None, output_path: str | None = None,
                   pairs_scraped: int | None = None) -> dict:
        cur = self.read(pid) or {"partition_id": pid, "state": OPEN, "history": []}
        if new_state == CLOSED and cur["state"] == CLOSED:
            return cur  # idempotent replay (reference main.py:639-640)
        if new_state not in _VALID.get(cur["state"], set()) and cur["state"] != new_state:
            # allow leased→leased refresh and re-lease of expired leases
            if not (cur["state"] == LEASED and new_state == LEASED):
                raise ValueError(
                    f"invalid transition {cur['state']}→{new_state} for partition {pid}")
        cur["history"].append({"from": cur["state"], "to": new_state,
                               "ts": time.time(), "completor": completor})
        cur["state"] = new_state
        if new_state == LEASED:
            cur["lease_ts"] = time.time()
            cur["completor"] = completor
        if gpu_url is not None:
            cur["gpu_url"] = gpu_url
        if counters is not None:
            cur["counters"] = counters
        if lineage is not None:
            cur["lineage"] = lineage
        if output_path is not None:
            cur["output_path"] = output_path
        if pairs_scraped is not None:
            cur["pairs_scraped"] = pairs_scraped
        if new_state == CLOSED:
            cur["completor"] = completor or cur.get("completor")
            cur.pop("lease_ts", None)
        self._write_atomic(self._path(pid), cur)
        return cur

    # -- queries (≙ reference count endpoints, main.py:96-112, 601-611) --
    def all(self) -> dict[int, dict]:
        out = {}
        for p in sorted(self.dir.glob("part-*.json")):
            with open(p) as f:
                m = json.load(f)
            out[m["partition_id"]] = m
        return out

    def closed_partitions(self) -> set[int]:
        return {pid for pid, m in self.all().items() if m["state"] == CLOSED}

    def open_partitions(self, universe: list[int]) -> list[int]:
        return [p for p in universe if self.state(p) in (OPEN, GPU)]

    def totals(self) -> dict:
        t: dict[str, int] = {}
        for m in self.all().values():
            for k, v in (m.get("counters") or {}).items():
                t[k] = t.get(k, 0) + v
        return t

    def validate_worker(self, token: str, now: float | None = None) -> bool:
        """Does a live (unexpired) lease exist for this worker token?
        (≙ reference /api/validateWorker, main.py:515-522 — the
        Client-row-exists check; here a worker 'exists' exactly while it
        holds a lease, the only liveness the manifest store tracks.)"""
        now = now or time.time()
        for m in self.all().values():
            if (m["state"] == LEASED and m.get("completor") == token
                    and now - m.get("lease_ts", 0) <= self.lease_timeout_s):
                return True
        return False

    def worker_stats(self) -> dict[str, dict]:
        """Per-completor jobs / pairs / first_ts / last_ts / efficiency.

        efficiency_jobs_per_h = jobs / (last − first) × 3600 — the
        reference's per-worker rate (templates/worker.html:37, computed
        from Client.first_seen/last_seen); None while the span is < 1 s
        (a worker that just closed its first job has no meaningful rate).
        first/last come from the manifest history entries naming the
        completor (lease + close transitions)."""
        out: dict[str, dict] = {}
        for m in self.all().values():
            if m["state"] != CLOSED:
                continue
            comp = m.get("completor") or "?"
            e = out.setdefault(comp, {"jobs": 0, "pairs": 0,
                                      "first_ts": None, "last_ts": None})
            e["jobs"] += 1
            e["pairs"] += m.get("pairs_scraped") or 0
            for h in m.get("history", []):
                if h.get("completor") != comp and not (
                        h["to"] == CLOSED and m.get("completor") == comp):
                    continue
                ts = h["ts"]
                e["first_ts"] = ts if e["first_ts"] is None else min(e["first_ts"], ts)
                e["last_ts"] = ts if e["last_ts"] is None else max(e["last_ts"], ts)
        for e in out.values():
            span = ((e["last_ts"] or 0) - (e["first_ts"] or 0))
            e["efficiency_jobs_per_h"] = (
                round(e["jobs"] / span * 3600.0, 2) if span >= 1.0 else None)
        return out

    def invalidate_gpu(self, pid: int) -> dict:
        """GPU worker rejects a bad stage-1 artifact: job back to the CPU
        pool (≙ reference /api/gpuInvalidDownload, main.py:700-723:
        ``gpu_url=None, gpu=False, pending=False, cpu_completor=None``)."""
        cur = self.read(pid)
        if cur is None or cur["state"] == CLOSED:
            raise ValueError(f"partition {pid} not in a gpu-invalidatable state")
        cur["history"].append({"from": cur["state"], "to": OPEN,
                               "ts": time.time(), "reason": "gpu_invalid"})
        cur["state"] = OPEN
        for k in ("gpu_url", "lease_ts", "completor"):
            cur.pop(k, None)
        self._write_atomic(self._path(pid), cur)
        return cur

    def release(self, pid: int) -> dict | None:
        """Worker disconnect: release a pending lease (≙ reference
        /api/bye, main.py:726-742)."""
        cur = self.read(pid)
        if cur is None or cur["state"] != LEASED:
            return cur
        cur["history"].append({"from": LEASED, "to": OPEN, "ts": time.time(),
                               "reason": "bye"})
        cur["state"] = OPEN
        cur.pop("lease_ts", None)
        cur.pop("completor", None)
        self._write_atomic(self._path(pid), cur)
        return cur

    # -- banner (≙ reference admin set-banner, main.py:360-370) ----------
    def set_banner(self, text: str) -> None:
        self._write_atomic(self.root / "banner.json", {"banner": text})

    def get_banner(self) -> str:
        p = self.root / "banner.json"
        if not p.exists():
            return ""
        with open(p) as f:
            return json.load(f)["banner"]

    # -- seen-filter snapshots (committed with the manifest) -------------
    def save_seen_snapshot(self, snapshots: list[dict]) -> None:
        tmp = self.root / ".seen.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(snapshots, f)
        os.rename(tmp, self.root / "seen_snapshot.pkl")

    def load_seen_snapshot(self) -> list[dict] | None:
        p = self.root / "seen_snapshot.pkl"
        if not p.exists():
            return None
        with open(p, "rb") as f:
            return pickle.load(f)
