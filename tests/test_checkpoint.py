"""Manifest state machine (≙ reference models.py:6-7 job lifecycle)."""

import pytest

from crawlingathome_server_ray.state.checkpoint import (CLOSED, GPU, LEASED,
                                                        OPEN, Manifest)


def test_lifecycle_hybrid_path(tmp_path):
    m = Manifest(str(tmp_path))
    assert m.state(3) == OPEN
    m.transition(3, LEASED, completor="w1")
    assert m.state(3) == LEASED
    m.transition(3, CLOSED, completor="w1", counters={"urls_fetched": 10})
    assert m.state(3) == CLOSED
    assert m.closed_partitions() == {3}


def test_lifecycle_two_stage(tmp_path):
    m = Manifest(str(tmp_path))
    m.transition(1, LEASED, completor="cpu")
    m.transition(1, GPU, gpu_url="files:///x")
    assert m.state(1) == GPU
    m.transition(1, LEASED, completor="gpu")
    m.transition(1, CLOSED, completor="gpu", pairs_scraped=42)
    assert m.read(1)["pairs_scraped"] == 42


def test_close_is_idempotent(tmp_path):
    m = Manifest(str(tmp_path))
    m.transition(2, LEASED)
    m.transition(2, CLOSED, counters={"a": 1})
    before = m.read(2)
    m.transition(2, CLOSED, counters={"a": 999})  # replay is a no-op
    assert m.read(2)["counters"] == before["counters"]


def test_invalid_transition_rejected(tmp_path):
    m = Manifest(str(tmp_path))
    with pytest.raises(ValueError):
        m.transition(4, GPU)  # open → gpu skips the lease


def test_lease_expiry_reopens(tmp_path):
    m = Manifest(str(tmp_path), lease_timeout_s=10)
    m.transition(5, LEASED, completor="w")
    rec = m.read(5)
    assert m.state(5) == LEASED
    # 11 seconds later the reaper logic treats it as open (main.py:748-759)
    assert m.state(5, now=rec["lease_ts"] + 11) == OPEN


def test_gpu_invalid_download_resets_to_cpu_pool(tmp_path):
    m = Manifest(str(tmp_path))
    m.transition(7, LEASED, completor="cpu")
    m.transition(7, GPU, gpu_url="files:///x")
    rec = m.invalidate_gpu(7)
    assert rec["state"] == OPEN
    assert "gpu_url" not in rec and "completor" not in rec
    m.transition(7, LEASED, completor="cpu2")  # re-claimable
    with pytest.raises(ValueError):
        m.invalidate_gpu(99)  # unknown partition


def test_release_on_bye(tmp_path):
    m = Manifest(str(tmp_path))
    m.transition(8, LEASED, completor="w")
    rec = m.release(8)
    assert rec["state"] == OPEN and "completor" not in rec
    assert m.release(99) is None  # unknown → no-op


def test_banner_roundtrip(tmp_path):
    m = Manifest(str(tmp_path))
    assert m.get_banner() == ""
    m.set_banner("maintenance at noon")
    assert m.get_banner() == "maintenance at noon"


def test_totals_accumulate(tmp_path):
    m = Manifest(str(tmp_path))
    for pid in (1, 2):
        m.transition(pid, LEASED)
        m.transition(pid, CLOSED, counters={"urls_fetched": 5, "robots_blocked": 1})
    assert m.totals() == {"urls_fetched": 10, "robots_blocked": 2}


def test_counter_shards_routing(ray_session):
    """Increments route by pid % n and totals/snapshots merge across
    shards exactly."""
    from crawlingathome_server_ray.state.counters import CounterShards
    cs = CounterShards(3)
    cs.incr_many({0: {"a": 1}, 1: {"a": 2, "b": 5}, 4: {"a": 10}})
    cs.incr_many({1: {"a": 3}})
    assert cs.snapshot(1) == {"a": 5, "b": 5}
    assert cs.snapshot(4) == {"a": 10}
    assert cs.snapshot(99) == {}
    assert cs.totals() == {"a": 16, "b": 5}
    cs.kill()
