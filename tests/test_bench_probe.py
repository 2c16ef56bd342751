"""Probe-gated contention handling in bench.py.

The benchmark's clean-window gate is a measured CPU probe (guest
loadavg is blind to co-tenant steal — see BASELINE.md calibration).
These tests pin the gate's decision logic with a stubbed probe: no
Spark session, no real sleeping.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture()
def probe_env(monkeypatch):
    """Fresh probe state, no real sleeps, a scripted probe sequence."""
    monkeypatch.setattr(bench, "_probe_state",
                        {"floor": None, "warm": True})
    monkeypatch.setattr(bench, "CLEAN_PROBE_SEC", 1.20)
    monkeypatch.setattr(bench, "PROBE_SLACK", 1.15)
    monkeypatch.setattr(bench, "WAIT_SCALE", 1.0)
    slept: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)

    def install(readings):
        seq = iter(readings)

        def fake_probe(_spark):
            sec = next(seq)
            st = bench._probe_state
            if st["floor"] is None or sec < st["floor"]:
                st["floor"] = sec
            return sec

        monkeypatch.setattr(bench, "_cpu_probe", fake_probe)

    return install, slept


def test_clean_first_probe_returns_immediately(probe_env):
    install, slept = probe_env
    install([1.25])  # within 1.20 * 1.15 = 1.38
    waited, p, clean = bench._wait_clean_window(None, max_wait=240.0)
    assert (waited, clean) == (0.0, True)
    assert p == 1.25
    assert slept == []


def test_hot_window_waits_then_clears(probe_env):
    install, slept = probe_env
    install([2.5, 2.1, 1.30])
    waited, p, clean = bench._wait_clean_window(
        None, max_wait=240.0, poll=10.0)
    assert clean is True and p == 1.30
    assert waited == 20.0 and slept == [10.0, 10.0]


def test_budget_exhausts_hot(probe_env):
    install, slept = probe_env
    install([2.5] * 50)
    waited, p, clean = bench._wait_clean_window(
        None, max_wait=30.0, poll=10.0)
    assert clean is False and p == 2.5
    assert waited == 30.0  # bounded: never hangs on a loaded host


def test_wait_scale_zero_disables_waiting(probe_env, monkeypatch):
    install, slept = probe_env
    monkeypatch.setattr(bench, "WAIT_SCALE", 0.0)
    install([9.9])  # very hot
    waited, p, clean = bench._wait_clean_window(None, max_wait=240.0)
    # scaling runs set SPARK_GRAFT_WAIT_BUDGET=0: one probe, no sleep
    assert (waited, clean) == (0.0, False)
    assert slept == []


def test_session_floor_tightens_gate(probe_env):
    """A session minimum BELOW the configured constant re-anchors the
    gate: 1.30 is clean against the 1.20 default but hot once the
    session has seen 1.05 (1.05 * 1.15 = 1.2075 < 1.30)."""
    install, slept = probe_env
    install([1.05, 1.30, 1.30, 1.20])
    waited, p, clean = bench._wait_clean_window(
        None, max_wait=240.0, poll=10.0)
    assert (waited, p, clean) == (0.0, 1.05, True)
    waited, p, clean = bench._wait_clean_window(
        None, max_wait=20.0, poll=10.0)
    assert clean is True and p == 1.20 and waited == 20.0


def test_floor_constant_is_level_scaled_in_scaling_harness():
    """tools/bench_scaling.py must hand narrower levels a scaled clean
    floor — the probe job is fixed work, so local[8] runs it ~4x
    longer and an unscaled floor would never read clean."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import bench_scaling
    src = open(bench_scaling.__file__).read()
    assert "SPARK_GRAFT_PROBE_CLEAN" in src
