"""Load-guard behavior of bench.py (r13 VERDICT #3).

The r13 bench artifact was stamped from a load15≈7.3 host — the old
guard waited only on load1, which drains in ~1 minute while the
slow-mode effect tracks load15 — and manufactured a paper regression
on byte-identical code. The guard now refuses to present a
recently-heavy reading as a trusted headline. These tests drive it
with SYNTHETIC load injections (SPARK_GRAFT_FAKE_LOADAVG), no Spark
session needed.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

from bench import _loadavg, wait_for_quiet_host  # noqa: E402


@pytest.fixture()
def fake_load(monkeypatch):
    def set_load(l1: float, l5: float, l15: float) -> None:
        monkeypatch.setenv(
            "SPARK_GRAFT_FAKE_LOADAVG", f"{l1},{l5},{l15}")

    return set_load


def test_fake_loadavg_injection(fake_load):
    fake_load(0.5, 2.0, 9.0)
    assert _loadavg() == (0.5, 2.0, 9.0)


def test_quiet_host_is_trusted(fake_load):
    fake_load(0.2, 0.5, 1.0)
    guard = wait_for_quiet_host(wait_sec=0)
    assert guard["status"] == "quiet"
    assert guard["headline_trusted"] is True
    assert guard["recently_heavy"] is False


def test_recently_heavy_host_refuses_headline(fake_load):
    # the r13 failure shape exactly: load1 drained, load15 still high
    fake_load(0.3, 4.0, 7.3)
    guard = wait_for_quiet_host(wait_sec=0)
    assert guard["status"] == "noisy"
    assert guard["recently_heavy"] is True
    assert guard["headline_trusted"] is False
    assert guard["load15_at_start"] == 7.3


def test_high_load1_alone_is_noisy_but_not_recently_heavy(fake_load):
    fake_load(5.0, 2.0, 1.5)
    guard = wait_for_quiet_host(wait_sec=0)
    assert guard["status"] == "noisy"
    assert guard["recently_heavy"] is False
    assert guard["headline_trusted"] is False


def test_guard_waits_until_load15_drains(fake_load, monkeypatch):
    """The bounded retry actually polls: a host that quiets inside the
    window ends trusted, with waited_sec recording the delay."""
    readings = iter([(0.2, 3.0, 6.0), (0.2, 2.0, 4.0), (0.2, 1.0, 2.0)])

    def fake_sleep(_s):
        l1, l5, l15 = next(readings)
        os.environ["SPARK_GRAFT_FAKE_LOADAVG"] = f"{l1},{l5},{l15}"

    fake_load(0.2, 3.0, 8.0)
    monkeypatch.setattr("time.sleep", fake_sleep)
    guard = wait_for_quiet_host(wait_sec=600, poll_sec=5)
    assert guard["status"] == "quiet"
    assert guard["headline_trusted"] is True
    assert guard["waited_sec"] == 15.0  # three polls to drain


def test_guard_respects_wait_env_default(fake_load, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT_SEC", "0")
    fake_load(0.2, 2.0, 9.0)
    guard = wait_for_quiet_host()  # wait_sec=None -> env
    assert guard["headline_trusted"] is False


# ---- r14: memory-pressure guard (loadavg-blind host storms) ----------------

from bench import memory_touch_gbps, wait_for_memory_calm  # noqa: E402


def test_fake_touch_gbps_injection(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FAKE_TOUCH_GBPS", "0.3")
    assert memory_touch_gbps() == 0.3


def test_memory_calm_passes_when_fast(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FAKE_TOUCH_GBPS", "8.0")
    guard = wait_for_memory_calm(wait_sec=0)
    assert guard["memory_pressured"] is False
    assert guard["touch_gbps"] == 8.0


def test_memory_calm_flags_pressure(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FAKE_TOUCH_GBPS", "0.2")
    guard = wait_for_memory_calm(wait_sec=0)
    assert guard["memory_pressured"] is True


def test_memory_calm_waits_for_recovery(monkeypatch):
    readings = iter(["0.3", "0.4", "5.0"])

    def fake_sleep(_s):
        os.environ["SPARK_GRAFT_FAKE_TOUCH_GBPS"] = next(readings)

    monkeypatch.setenv("SPARK_GRAFT_FAKE_TOUCH_GBPS", "0.2")
    monkeypatch.setattr("time.sleep", fake_sleep)
    guard = wait_for_memory_calm(wait_sec=600, poll_sec=5)
    assert guard["memory_pressured"] is False
    assert guard["waited_sec"] == 15.0
    assert guard["touch_gbps"] == 5.0


def test_real_probe_returns_positive():
    os.environ.pop("SPARK_GRAFT_FAKE_TOUCH_GBPS", None)
    assert memory_touch_gbps(size_mb=16) > 0
