"""Unit tests for bench.py's host-side logic (no TPU, no measurement):
the link-degradation gating and the median helper. The bench is the
driver's scoring surface, so its control flow is guarded here even
though throughput itself can only be measured on hardware."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_budget():
    before = bench._link_wait_budget
    yield
    bench._link_wait_budget = before


def test_wait_for_link_healthy_short_circuits(monkeypatch):
    probes = []
    monkeypatch.setattr(
        bench, "probe_link_bandwidth", lambda mb=8: probes.append(mb) or 50.0
    )
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    assert bench.wait_for_link() == 50.0
    assert len(probes) == 1 and not sleeps


def test_wait_for_link_waits_until_recovery(monkeypatch):
    bench._link_wait_budget = 600.0
    readings = iter([1.5, 2.0, 30.0])
    monkeypatch.setattr(
        bench, "probe_link_bandwidth", lambda mb=8: next(readings)
    )
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    assert bench.wait_for_link() == 30.0
    assert sleeps == [45.0, 45.0]
    assert bench._link_wait_budget == 600.0 - 90.0


def test_wait_for_link_budget_exhaustion_returns_degraded(monkeypatch):
    bench._link_wait_budget = 40.0
    monkeypatch.setattr(bench, "probe_link_bandwidth", lambda mb=8: 1.0)
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    # consumes the whole budget (one bounded pause), then proceeds with
    # the degraded reading rather than stalling the sweep forever
    assert bench.wait_for_link() == 1.0
    assert sleeps == [40.0]
    assert bench._link_wait_budget <= 0


def test_wait_for_link_probe_failure_is_none(monkeypatch):
    def boom(mb=8):
        raise RuntimeError("no device")

    monkeypatch.setattr(bench, "probe_link_bandwidth", boom)
    assert bench.wait_for_link() is None


def test_median_mp_s():
    # 0.5 MP in a median of 0.25 s -> 2 MP/s
    assert bench._median_mp_s([0.3, 0.25, 0.2], 0.5) == pytest.approx(2.0)


def test_geomean_matches_headline_formula():
    speedups = [10.0, 20.0, 40.0]
    geomean = float(np.exp(np.mean(np.log(speedups))))
    assert geomean == pytest.approx(20.0, rel=1e-12)
