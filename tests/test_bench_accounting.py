"""Unit pins for bench.py's per-query run accounting
(``summarize_runs``) — pure-dict tests, no Spark session.

The contract compare_bench relies on: warm_min is computed from
BUILD-FREE warm runs whenever any exist, and carries a "warm_builds"
tag exactly when it could not be (every warm run paid a shared-frame
build, so the number is inflated).
"""

from __future__ import annotations

from bench import summarize_runs


def test_plain_runs_no_builds():
    d = summarize_runs([3.0, 1.2, 1.4], [[], [], []])
    assert d["cold"] == 3.0
    assert d["warm_min"] == 1.2
    assert d["warm_spread"] == 0.2
    assert d["spread"] == 1.8
    assert "shared_builds" not in d and "warm_builds" not in d


def test_cold_payer_tagged_and_excluded():
    d = summarize_runs([9.0, 2.1, 2.0], [[("sig", 7.0)], [], []])
    assert d["shared_builds"] == {"sig": 7.0}
    assert d["cold_ex_shared"] == 2.0
    assert d["warm_min"] == 2.0
    assert "warm_builds" not in d


def test_warm_build_excluded_when_a_clean_warm_run_exists():
    # cache eviction hit run 1; run 2 is clean — warm_min must come
    # from the clean run only, untagged
    d = summarize_runs([9.0, 8.9, 2.0], [[("sig", 7.0)], [("sig", 7.1)], []])
    assert d["warm_min"] == 2.0
    assert "warm_builds" not in d
    # …and the spread is over the same (clean) pool, not inflated by
    # the build-paying run
    assert d["warm_spread"] is None  # single clean run


def test_all_warm_runs_paid_builds_tags_warm_builds():
    d = summarize_runs(
        [9.0, 8.9, 9.2], [[("sig", 7.0)], [("sig", 7.1)], [("sig", 7.0)]]
    )
    assert d["warm_min"] == 8.9  # best available, but…
    assert d["warm_builds"] == {"sig": 7.0}  # …flagged as inflated
    assert d["warm_spread"] == 0.3


def test_single_run_has_no_warm():
    d = summarize_runs([4.2], [[]])
    assert d["warm_min"] is None and d["warm_spread"] is None


def test_trusted_warm_prefers_clean_warm():
    from bench import trusted_warm

    assert trusted_warm({"cold": 3.0, "warm_min": 1.2}) == 1.2


def test_trusted_warm_falls_back_on_warm_builds_tag():
    # every warm run paid a rebuild: the inflated warm_min must not
    # reach warm_total / family subtotals — build-excluded cold does
    from bench import trusted_warm

    d = {
        "cold": 9.0,
        "warm_min": 8.9,
        "warm_builds": {"sig": 7.0},
        "shared_builds": {"sig": 7.1},
        "cold_ex_shared": 1.9,
    }
    assert trusted_warm(d) == 1.9
    # untagged cold when the cold run paid no build either
    assert trusted_warm({"cold": 4.0, "warm_min": 3.9, "warm_builds": {"s": 3.0}}) == 4.0


def test_trusted_warm_single_run_uses_cold():
    from bench import trusted_warm

    assert trusted_warm({"cold": 4.2, "warm_min": None}) == 4.2


def test_parse_shard_rejects_unknown_arguments():
    # Argument-strict like the sibling CLIs: a typo (--query) must exit
    # with usage, not silently run the full 30-minute suite.
    import pytest

    from bench import _parse_shard

    assert _parse_shard(["--queries", "a,b"]) == (None, ["a", "b"])
    assert _parse_shard(["--family=dedup"]) == (["dedup"], None)
    for bad in (["--query", "a"], ["extra"], ["--familyX=dedup"]):
        with pytest.raises(SystemExit) as exc:
            _parse_shard(bad)
        assert exc.value.code == 2


def test_host_attribution_reads_linux_counters():
    """bench._host_attribution must return steal/idle percentages over
    a real window on this Linux box, tolerate a None before-sample
    (off-Linux path), and report the cgroup quota string."""
    import bench

    before = bench._host_cpu_sample()
    assert before is not None and len(before) == 8
    # burn a little wall time so the jiffie window is non-empty
    import time as _t

    _t.sleep(0.15)
    out = bench._host_attribution(before)
    assert 0.0 <= out["steal_pct"] <= 100.0
    assert 0.0 <= out["idle_pct"] <= 100.0
    assert "loadavg1" in out
    # quota, when readable, is the raw file string (e.g. "-1", "max",
    # or "200000 100000" on a quota-limited box) — don't pin a value,
    # the suite must stay portable to capped environments
    assert "cpu_quota" not in out or out["cpu_quota"].strip() != ""
    # off-Linux / first-sample-failed path degrades to loadavg-only
    degraded = bench._host_attribution(None)
    assert "steal_pct" not in degraded


def test_queries_all_map_publishes_cold_and_trusted_warm():
    """r16: the stdout line's full-registry map — cold is the raw
    first run; the warm slot follows trusted_warm (build-free warm_min
    when one exists, else the build-excluded cold), and errored
    queries (absent from timings) never appear."""
    from bench import queries_all_map

    detail = {
        "b": summarize_runs([3.0, 1.2, 1.4], [[], [], []]),
        "a": summarize_runs([9.0, 2.1, 2.0], [[("sig", 7.0)], [], []]),
        "crashed": {"n": 1, "err": "Boom"},
    }
    timings = {"b": 3.0, "a": 9.0}
    qa = queries_all_map(timings, detail)
    assert list(qa) == ["a", "b"]  # sorted, errored row excluded
    assert qa["b"] == [3.0, 1.2]
    assert qa["a"] == [9.0, 2.0]  # warm pool is build-free


def test_queries_all_map_warm_falls_back_when_every_warm_paid_a_build():
    from bench import queries_all_map

    detail = {"q": summarize_runs([9.0, 8.0], [[("sig", 7.0)], [("sig", 6.0)]])}
    qa = queries_all_map({"q": 9.0}, detail)
    # warm_min absorbed a rebuild -> trusted_warm falls back to
    # cold_ex_shared, so the published warm can't show a phantom.
    assert qa["q"] == [9.0, 2.0]


def test_range_part_target_bytes_validates_env(monkeypatch):
    """r16 (ADVICE): a non-numeric / zero / negative override of
    SPARK_GRAFT_RANGE_PART_BYTES must fall back to the 64 MB default
    instead of crashing every offset-merge query."""
    from aiesec_guc_spark.operators.quantiles import _range_part_target_bytes

    default = 64 << 20
    monkeypatch.delenv("SPARK_GRAFT_RANGE_PART_BYTES", raising=False)
    assert _range_part_target_bytes() == default
    monkeypatch.setenv("SPARK_GRAFT_RANGE_PART_BYTES", "not-a-number")
    assert _range_part_target_bytes() == default
    monkeypatch.setenv("SPARK_GRAFT_RANGE_PART_BYTES", "0")
    assert _range_part_target_bytes() == default
    monkeypatch.setenv("SPARK_GRAFT_RANGE_PART_BYTES", "-5")
    assert _range_part_target_bytes() == default
    monkeypatch.setenv("SPARK_GRAFT_RANGE_PART_BYTES", str(128 << 20))
    assert _range_part_target_bytes() == 128 << 20
