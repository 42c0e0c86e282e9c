"""CLI surface: status / reopen / ban / leaderboard against a manifest dir
(admin-hook parity with reference main.py:298-370)."""

import json

from crawlingathome_server_ray.cli import main
from crawlingathome_server_ray.state.checkpoint import CLOSED, LEASED, Manifest


def _mk(tmp_path):
    out_root = tmp_path / "ckpt" / "sfX"
    m = Manifest(str(out_root))
    m.transition(1, LEASED, completor="alice-1")
    m.transition(1, CLOSED, completor="alice-1",
                 counters={"urls_fetched": 10}, pairs_scraped=100)
    m.transition(2, LEASED, completor="bob-2")
    return str(tmp_path / "ckpt"), out_root


def _run(capsys, args):
    main(args)
    return json.loads(capsys.readouterr().out.strip())


def test_status(tmp_path, capsys):
    ckpt, _ = _mk(tmp_path)
    out = _run(capsys, ["status", "--sf", "/x/sfX", "--ckpt", ckpt])
    assert out["states"] == {"closed": 1, "leased": 1}
    assert out["totals"] == {"urls_fetched": 10}


def test_leaderboard(tmp_path, capsys):
    ckpt, _ = _mk(tmp_path)
    out = _run(capsys, ["leaderboard", "--sf", "/x/sfX", "--ckpt", ckpt])
    # a worker whose first→last span is <1s has no meaningful rate yet
    assert out == {"alice-1": {"jobs": 1, "pairs": 100,
                               "efficiency_jobs_per_h": None}}


def test_validate_worker(tmp_path, capsys):
    ckpt, _ = _mk(tmp_path)
    out = _run(capsys, ["validate-worker", "--sf", "/x/sfX", "--ckpt", ckpt,
                        "--token", "bob-2"])
    assert out == {"token": "bob-2", "valid": True}   # live lease
    out = _run(capsys, ["validate-worker", "--sf", "/x/sfX", "--ckpt", ckpt,
                        "--token", "alice-1"])
    assert out == {"token": "alice-1", "valid": False}  # closed, no lease
    out = _run(capsys, ["validate-worker", "--sf", "/x/sfX", "--ckpt", ckpt,
                        "--token", "nobody"])
    assert out == {"token": "nobody", "valid": False}


def test_worker_stats_efficiency(tmp_path):
    """jobs/(last−first)×3600 over the completor's manifest history
    (≙ reference templates/worker.html:37)."""
    import time
    from crawlingathome_server_ray.state.checkpoint import Manifest
    m = Manifest(str(tmp_path / "wroot"))
    for pid in (1, 2, 3):
        m.transition(pid, LEASED, completor="carol-3")
        m.transition(pid, CLOSED, completor="carol-3", pairs_scraped=5)
    # widen the span artificially: backdate the first lease by 2 hours
    rec = m.read(1)
    rec["history"][0]["ts"] -= 7200
    m._write_atomic(m._path(1), rec)
    stats = m.worker_stats()["carol-3"]
    assert stats["jobs"] == 3 and stats["pairs"] == 15
    assert stats["efficiency_jobs_per_h"] is not None
    assert abs(stats["efficiency_jobs_per_h"] - 3 / 7200 * 3600) < 0.1
    # validate_worker: expired lease is not live
    m2 = Manifest(str(tmp_path / "wroot2"), lease_timeout_s=1)
    m2.transition(9, LEASED, completor="dave-4")
    assert m2.validate_worker("dave-4")
    assert not m2.validate_worker("dave-4", now=time.time() + 5)


def test_ban_and_reopen(tmp_path, capsys):
    ckpt, out_root = _mk(tmp_path)
    _run(capsys, ["ban", "--sf", "/x/sfX", "--ckpt", ckpt, "--partition", "3"])
    m = Manifest(str(out_root))
    assert m.state(3) == CLOSED
    assert m.read(3)["lineage"] == {"banned": True}
    _run(capsys, ["reopen", "--sf", "/x/sfX", "--ckpt", ckpt, "--partition", "3"])
    assert Manifest(str(out_root)).state(3) == "open"
