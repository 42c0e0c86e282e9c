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
    assert out == {"alice-1": {"jobs": 1, "pairs": 100}}


def test_ban_and_reopen(tmp_path, capsys):
    ckpt, out_root = _mk(tmp_path)
    _run(capsys, ["ban", "--sf", "/x/sfX", "--ckpt", ckpt, "--partition", "3"])
    m = Manifest(str(out_root))
    assert m.state(3) == CLOSED
    assert m.read(3)["lineage"] == {"banned": True}
    _run(capsys, ["reopen", "--sf", "/x/sfX", "--ckpt", ckpt, "--partition", "3"])
    assert Manifest(str(out_root)).state(3) == "open"
