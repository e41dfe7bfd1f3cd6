"""Pins for tools/steal_probe.py — the host-side measurement behind
the round-13 parallel-throughput-cap attribution. Pure /proc/stat
arithmetic, no Spark."""

from __future__ import annotations

from tools.steal_probe import burst, cpu_sample, read_quota_and_psi


def test_cpu_sample_reads_eight_counters():
    s = cpu_sample()
    assert s is not None and len(s) == 8
    assert all(isinstance(v, int) and v >= 0 for v in s)


def test_burst_window_percentages_are_sane():
    row = burst(1, 0.6, ncpu=32)
    assert "error" not in row
    assert 0.0 <= row["steal_pct"] <= 100.0
    assert 0.0 <= row["idle_pct"] <= 100.0
    assert row["work_ratio"] > 0.0  # one busy proc delivers SOME work


def test_quota_probe_returns_raw_file_strings():
    out = read_quota_and_psi()
    # raw first-line strings ("-1", "max", or "200000 100000" on a
    # quota-limited box) — no value pin, the suite must stay portable
    for v in out.values():
        assert isinstance(v, str) and v.strip() != ""


def test_spin_calibration_is_fixed_work():
    from tools.steal_probe import spin_calibration

    out = spin_calibration(reps=1)
    assert out["iters"] == 20_000_000
    assert len(out["runs"]) == 1 and out["min"] == out["runs"][0]
    assert out["min"] > 0.05  # 20M python increments can't be instant
