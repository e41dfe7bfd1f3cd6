"""Pins for tools/steal_probe.py — the host-side measurement behind
the round-13 parallel-throughput-cap attribution. Pure /proc/stat
arithmetic, no Spark."""

from __future__ import annotations

from tools.steal_probe import burst, cpu_sample, read_quota_and_psi


def test_cpu_sample_reads_eight_counters():
    s = cpu_sample()
    assert s is not None and len(s) == 8
    assert all(isinstance(v, int) and v >= 0 for v in s)


def test_cpu_sample_short_line_returns_none(tmp_path):
    # A kernel whose cpu line lacks the steal column must yield None
    # (the documented off-contract value), not a 7-element list that
    # later IndexErrors at delta[7] in bench host attribution.
    short = tmp_path / "stat"
    short.write_text("cpu  1 2 3 4 5 6 7\n")
    assert cpu_sample(str(short)) is None
    full = tmp_path / "stat8"
    full.write_text("cpu  1 2 3 4 5 6 7 8 9 10\n")
    assert cpu_sample(str(full)) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_burst_window_percentages_are_sane():
    row = burst(1, 0.6, ncpu=32)
    assert "error" not in row
    assert 0.0 <= row["steal_pct"] <= 100.0
    assert 0.0 <= row["idle_pct"] <= 100.0
    assert row["work_ratio"] > 0.0  # one busy proc delivers SOME work


def test_burst_releases_children_when_sampling_raises(monkeypatch):
    # If anything raises between spawn and stop.set() the children must
    # still be released (finally) — otherwise 32 non-daemon burners hang
    # the interpreter's multiprocessing atexit join at 100% CPU.
    import threading
    import time as _time

    import tools.steal_probe as sp

    real_sleep = _time.sleep
    here = threading.current_thread()

    def exploding_sleep(s):
        # steal_probe and time are process-global, so this patch is
        # visible to every thread — under a full suite a live Spark
        # session's threads also call time.sleep.  Gate on thread AND
        # duration so only burst()'s sampled-window sleep (0.5 s, after
        # the 0.3 s settle) explodes, never a bystander's.
        if threading.current_thread() is here and s == 0.5:
            raise RuntimeError("interrupted mid-window")
        real_sleep(s)

    monkeypatch.setattr(sp.time, "sleep", exploding_sleep)
    t0 = _time.monotonic()
    try:
        sp.burst(2, 0.5, ncpu=32)
    except RuntimeError:
        pass
    else:  # pragma: no cover - the monkeypatch must fire
        raise AssertionError("exploding sleep did not fire")
    # join returned promptly => children saw stop.set(), not the 30 s
    # orphan deadline
    assert _time.monotonic() - t0 < 10.0


def test_cli_rejects_nonpositive_sec_and_reps():
    import subprocess
    import sys

    for args in (["--sec", "0"], ["--sec", "-1"], ["--reps", "0"]):
        rc = subprocess.run(
            [sys.executable, "tools/steal_probe.py", *args],
            capture_output=True,
            timeout=60,
        ).returncode
        assert rc == 2, f"{args} should exit 2 with usage, got {rc}"


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
