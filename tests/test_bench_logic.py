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


def _run_main(monkeypatch, capsys, configs, **patches):
    monkeypatch.setenv("LMIC_BENCH_CONFIGS", configs)
    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "wait_for_link", lambda probe_mb=8: 50.0)
    for name, fn in patches.items():
        monkeypatch.setattr(bench, name, fn)
    rc = bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    import json

    return rc, [json.loads(ln) for ln in lines]


def test_main_train_only_exits_zero(monkeypatch, capsys):
    # LMIC_BENCH_CONFIGS=train: no codec configs selected -> no null
    # geomean line, exit 0, train line is the LAST JSON line
    rc, lines = _run_main(
        monkeypatch, capsys, "train",
        bench_train_step=lambda B=8, size=256, amp=False: {
            "metric": f"train_step_time_b{B}" + ("_amp" if amp else ""),
            "value": 1.0, "unit": "ms"},
    )
    assert rc == 0
    assert lines[-1]["metric"] == "train_step_time_b64_amp"


def test_main_train_only_failure_exits_one(monkeypatch, capsys):
    def boom():
        raise RuntimeError("no device")

    rc, _ = _run_main(monkeypatch, capsys, "train", bench_train_step=boom)
    assert rc == 1


def test_main_deadline_degrades_to_single_pass(monkeypatch, capsys):
    # slack below the cold estimate but above a single fast pass ->
    # the config still runs, with passes=1
    monkeypatch.setattr(bench, "_remaining", lambda: 150.0)
    seen = {}

    def fake(arch, passes=2):
        seen[arch] = passes
        return 5.0, {}

    rc, lines = _run_main(
        monkeypatch, capsys, "bmshj2018-hyperprior", bench_pipelined=fake
    )
    assert seen == {"bmshj2018-hyperprior": 1}
    assert lines[-1]["n_configs"] == 1
    assert "deadline_skipped" not in lines[-1]


def test_main_deadline_skips_config_and_reports(monkeypatch, capsys):
    # 100s left, two configs: the first (hyperprior, fast=110) cannot fit
    # once the second's single-pass reserve (90) is held back -> skipped
    # and named in the geomean line; the second runs single-pass
    monkeypatch.setattr(bench, "_remaining", lambda: 100.0)
    seen = {}

    def fake(arch, passes=2):
        seen[arch] = passes
        return 5.0, {}

    rc, lines = _run_main(
        monkeypatch, capsys,
        "bmshj2018-hyperprior,bmshj2018-factorized", bench_pipelined=fake,
    )
    assert seen == {"bmshj2018-factorized": 1}
    assert lines[-1]["deadline_skipped"] == ["bmshj2018-hyperprior"]
    assert lines[-1]["n_configs"] == 1


def test_main_below_bar_revisit_single_pass(monkeypatch, capsys):
    # a below-10x first measurement gets one compile-cached single-pass
    # revisit; the better number stands and is flagged revisit=true
    monkeypatch.setattr(bench, "_remaining", lambda: 10_000.0)
    calls = []

    def fake(arch, passes=2):
        calls.append(passes)
        return (1.0, {}) if len(calls) == 1 else (3.0, {})

    rc, lines = _run_main(
        monkeypatch, capsys, "bmshj2018-factorized", bench_pipelined=fake
    )
    assert calls == [2, 1]
    revisits = [ln for ln in lines if ln.get("revisit")]
    assert len(revisits) == 1
    assert revisits[0]["value"] == 3.0
    assert lines[-1]["value"] == pytest.approx(
        round(3.0 / bench.BASELINES["bmshj2018-factorized"][0], 2)
    )


def test_main_train_scaling_line_skipped_near_deadline(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_remaining", lambda: 60.0)
    calls = []

    def fake_train(B=8, size=256, amp=False):
        calls.append((B, amp))
        return {"metric": f"train_step_hyperprior_{size}px_b{B}",
                "value": 1.0, "unit": "images/s"}

    rc, lines = _run_main(monkeypatch, capsys, "train",
                          bench_train_step=fake_train)
    assert rc == 0
    assert calls == [(8, False)]


def test_main_train_scaling_line_runs_with_time(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_remaining", lambda: 10_000.0)
    calls = []

    def fake_train(B=8, size=256, amp=False):
        calls.append((B, amp))
        return {"metric": f"train_step_hyperprior_{size}px_b{B}"
                + ("_amp" if amp else ""),
                "value": 1.0, "unit": "images/s"}

    rc, lines = _run_main(monkeypatch, capsys, "train",
                          bench_train_step=fake_train)
    assert rc == 0
    assert calls == [(8, False), (64, False), (64, True)]


def test_main_codec_selected_but_failed_exits_one(monkeypatch, capsys):
    def boom(name):
        raise RuntimeError("no device")

    rc, lines = _run_main(
        monkeypatch, capsys, "bmshj2018-factorized", bench_pipelined=boom
    )
    assert rc == 1
    assert lines[-1]["metric"] == "encdec_speedup_geomean_vs_cpu_reference"
    assert lines[-1]["value"] is None


def test_probe_link_bandwidth_hang_reads_degraded(monkeypatch):
    """A wedged tunnel hangs transfers instead of erroring; the probe runs
    in a subprocess with a hard timeout and a hang must read as 0.0 MB/s
    (fully degraded) instead of blocking the sweep."""
    import subprocess

    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1.0)

    monkeypatch.setattr(subprocess, "run", hang)
    assert bench.probe_link_bandwidth(mb=1, timeout_s=1.0) == 0.0
