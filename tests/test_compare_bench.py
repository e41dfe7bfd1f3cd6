"""Unit pins for tools/compare_bench.py's pair selection — the
cross-round perf gate must not depend on WHICH query paid a shared
frame's build (registry order moves the payer between rounds).

Pure-dict tests, no Spark session.
"""

from __future__ import annotations

from tools.compare_bench import canary_line, pick_pair


def test_warm_on_both_sides_wins_regardless_of_payer():
    # payer moved: old round this query paid the build, new round not
    o = {"cold": 9.0, "warm_min": 2.0, "shared_builds": {"sig": 7.0}, "cold_ex_shared": 2.0}
    n = {"cold": 2.1, "warm_min": 2.1}
    ow, nw, skip = pick_pair(o, n)
    assert skip is None and (ow, nw) == (2.0, 2.1)


def test_cold_fallback_excludes_builds_on_both_sides():
    # single-run bench on both sides, both tagged as payer: the
    # build-excluded colds compare, so a bigger build doesn't read as
    # a regression
    o = {"cold": 9.0, "shared_builds": {"sig": 7.0}, "cold_ex_shared": 2.0}
    n = {"cold": 12.0, "shared_builds": {"sig": 9.8}, "cold_ex_shared": 2.2}
    ow, nw, skip = pick_pair(o, n)
    assert skip is None and (ow, nw) == (2.0, 2.2)


def test_payer_move_on_cold_fallback_is_skipped_not_a_phantom_delta():
    # the ADVICE r10 case: baseline predates tagging (or the payer
    # moved) — exactly one side carries shared_builds and neither has
    # warm runs.  Raw colds (9.0 vs 2.1) would read as a 4.3x phantom
    # speedup for the former payer; the gate must skip instead.
    former_payer_old = {"cold": 9.0, "shared_builds": {"sig": 7.0}, "cold_ex_shared": 2.0}
    former_payer_new = {"cold": 2.1}
    ow, nw, skip = pick_pair(former_payer_old, former_payer_new)
    assert skip is not None

    # ...and symmetrically for the query that BECOMES the payer (raw
    # colds 2.0 vs 9.4 would read as a 4.7x phantom regression)
    new_payer_old = {"cold": 2.0}
    new_payer_new = {"cold": 9.4, "shared_builds": {"sig": 7.2}, "cold_ex_shared": 2.2}
    ow, nw, skip = pick_pair(new_payer_old, new_payer_new)
    assert skip is not None


def test_untagged_cold_fallback_compares_raw_cold():
    ow, nw, skip = pick_pair({"cold": 1.0}, {"cold": 1.2})
    assert skip is None and (ow, nw) == (1.0, 1.2)


def test_one_sided_warm_compares_against_build_free_cold_not_skipped():
    # ADVICE r11: one side has warm_min (build-free by construction),
    # only the OTHER carries a payer tag — the old ordering skipped
    # this pair entirely and a real regression fell out of the gate.
    # Now the warm_min compares against the tagged side's
    # cold_ex_shared…
    o = {"cold": 2.0, "warm_min": 1.8}
    n = {"cold": 9.4, "shared_builds": {"sig": 7.2}, "cold_ex_shared": 2.2}
    ow, nw, skip = pick_pair(o, n)
    assert skip is None and (ow, nw) == (1.8, 2.2)
    # …and against the raw cold when the other side is untagged
    ow, nw, skip = pick_pair({"cold": 2.0, "warm_min": 1.8}, {"cold": 2.3})
    assert skip is None and (ow, nw) == (1.8, 2.3)


def test_warm_min_that_absorbed_a_build_is_not_trusted():
    # ADVICE r11: every warm run paid a rebuilt shared frame (cache
    # eviction) — bench.py tags the row "warm_builds" and the inflated
    # warm_min must not be read as a regression; the side falls back
    # to its build-excluded cold.
    o = {"cold": 2.0, "warm_min": 1.8}
    n = {
        "cold": 9.0,
        "warm_min": 8.9,  # inflated: absorbed a 7 s build
        "warm_builds": {"sig": 7.0},
        "shared_builds": {"sig": 7.1},
        "cold_ex_shared": 1.9,
    }
    ow, nw, skip = pick_pair(o, n)
    assert skip is None and (ow, nw) == (1.8, 1.9)


def test_canary_line_attributes_box_drift():
    old = {"canary": {"median": 0.10, "min": 0.09, "runs": []}}
    new = {"canary": {"median": 0.15, "min": 0.14, "runs": []}}
    line = canary_line(old, new)
    assert "1.50x" in line
    assert "OLD side only" in canary_line(old, {})
    assert "neither" in canary_line({}, {})
    # an errored canary (bench recorded {"error": ...}) counts as absent
    assert "NEW side only" in canary_line({"canary": {"error": "boom"}}, new)


def test_canary_line_prints_parallel_ratio_when_both_sides_have_it():
    old = {"canary": {"median": 0.10, "parallel": {"median": 1.0}}}
    new = {"canary": {"median": 0.10, "parallel": {"median": 1.6}}}
    line = canary_line(old, new)
    assert "parallel" in line and "1.60x" in line
    # one side missing (or errored) parallel probe: single-thread line only
    assert "parallel" not in canary_line(
        old, {"canary": {"median": 0.10, "parallel": {"error": "boom"}}}
    )
    assert "parallel" not in canary_line(old, {"canary": {"median": 0.10}})


def test_canary_line_refuses_cross_table_parallel_ratio():
    # r14 moved the parallel probe's workload off the headline events
    # table onto orders; a ratio across the two workloads attributes
    # nothing.  Pre-r14 records carry no `table` key and mean events.
    old = {"canary": {"median": 0.10, "parallel": {"median": 1.0}}}
    new = {
        "canary": {
            "median": 0.10,
            "parallel": {"median": 0.4, "table": "orders"},
        }
    }
    line = canary_line(old, new)
    assert "ratio not comparable" in line and "events -> orders" in line
    assert "0.40x" not in line and "4.00x" not in line
    # same table on both sides (post-r14 pair): ratio prints normally
    both = canary_line(new, new)
    assert "1.00x" in both and "not comparable" not in both


def test_canary_line_refuses_cross_regime_ratio():
    # Round 14: the pre-r14 instrument timed the canary on the
    # fresh-JVM warm-up plateau (~2-3x steady state); post-r14 records
    # are steady-state and carry a `regime` marker.  A ratio across the
    # regimes measures the instrument change, not the box — refuse,
    # and don't print a parallel ratio either (both probes changed
    # regime together).
    old = {"canary": {"median": 0.21, "parallel": {"median": 0.5}}}
    new = {
        "canary": {
            "median": 0.085,
            "regime": "steady_state_r14",
            "parallel": {
                "median": 0.45,
                "table": "events",
                "regime": "steady_state_r14",
            },
        }
    }
    line = canary_line(old, new)
    assert "regime changed (warmup_v1 -> steady_state_r14)" in line
    assert "box ratio" not in line and "parallel" not in line
    # same regime on both sides: ratio prints normally
    both = canary_line(new, new)
    assert "box ratio 1.00x" in both and "not comparable" not in both


def test_canary_line_refuses_cross_regime_parallel_ratio():
    # Defense in depth: even with matching top-level regimes, a
    # parallel sub-record regime mismatch must not print a number
    # (mirrors the workload-table guard).
    old = {
        "canary": {
            "median": 0.085,
            "regime": "steady_state_r14",
            "parallel": {"median": 0.5, "table": "events"},
        }
    }
    new = {
        "canary": {
            "median": 0.085,
            "regime": "steady_state_r14",
            "parallel": {
                "median": 0.45,
                "table": "events",
                "regime": "steady_state_r14",
            },
        }
    }
    line = canary_line(old, new)
    assert "box ratio 1.00x" in line
    assert "parallel: measurement regime changed" in line
    assert "0.90x" not in line


def _run_main(tmp_path, old: dict, new: dict, monkeypatch):
    import json as _json
    import sys as _sys

    from tools.compare_bench import main

    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(_json.dumps(old))
    pn.write_text(_json.dumps(new))
    monkeypatch.setattr(_sys, "argv", ["compare_bench.py", str(po), str(pn)])
    return main()


def _full_record(detail: dict) -> dict:
    return {"value": 1.0, "warm_total": 1.0, "queries_detail": detail}


def test_main_refuses_compact_record_without_queries_detail(
    tmp_path, monkeypatch, capsys
):
    # A compact stdout-line record has no queries_detail; gating on it
    # would compare zero pairs and pass vacuously — must refuse (exit 2)
    # like the shard case.
    ok = _full_record({"q1": {"cold": 1.0, "warm_min": 1.0}})
    assert _run_main(tmp_path, ok, {"value": 1.0}, monkeypatch) == 2
    assert "no queries_detail" in capsys.readouterr().out
    assert _run_main(tmp_path, {"value": 1.0}, ok, monkeypatch) == 2


def test_main_fails_gate_when_query_errors_in_new(
    tmp_path, monkeypatch, capsys
):
    # Regression-to-crash: the query's NEW detail row carries only
    # {"n":0,"err":...}; the timing loop skips it, so the aggregated
    # errored-in-NEW report must fail the gate loudly instead.
    old = _full_record({"q1": {"cold": 1.0, "warm_min": 1.0}})
    new = _full_record({"q1": {"n": 0, "err": "RuntimeError: boom"}})
    assert _run_main(tmp_path, old, new, monkeypatch) == 1
    out = capsys.readouterr().out
    assert "ERRORED in NEW: q1" in out and "boom" in out
    # recovery direction (errored OLD, fine NEW) is informational only
    assert _run_main(tmp_path, new, old, monkeypatch) == 0
    assert "recovered from OLD errors (1): q1" in capsys.readouterr().out


def test_main_fails_gate_when_added_query_errors_in_new(
    tmp_path, monkeypatch, capsys
):
    # ADVICE r14: a query ADDED since the baseline has no OLD row, so
    # the shared-key errored-in-NEW scan missed it — a brand-new query
    # that crashes sat in the informational "new queries" list and the
    # gate exited 0.  Error rows among `added` must fail the gate too.
    old = _full_record({"q1": {"cold": 1.0, "warm_min": 1.0}})
    new = _full_record(
        {
            "q1": {"cold": 1.0, "warm_min": 1.0},
            "q2": {"n": 0, "err": "RuntimeError: new and broken"},
        }
    )
    assert _run_main(tmp_path, old, new, monkeypatch) == 1
    out = capsys.readouterr().out
    assert "ERRORED in NEW: q2" in out and "new and broken" in out
    # an added query that RUNS stays informational — no gate trip
    ok_new = _full_record(
        {
            "q1": {"cold": 1.0, "warm_min": 1.0},
            "q2": {"cold": 1.0, "warm_min": 1.0},
        }
    )
    assert _run_main(tmp_path, old, ok_new, monkeypatch) == 0
    assert "new queries (1): q2" in capsys.readouterr().out


def test_committed_baseline_carries_canary_anchor():
    """VERDICT r12 ask 2: the committed fast-box BENCH_LOCAL.json must
    carry a canary anchor so a slow-box bench run is self-explaining —
    compare_bench prints a measured box ratio instead of "box drift not
    attributable".  The anchor is retro-dated from NGRAM_PROBE_r12's 26
    canary_sec samples (same fixed nation scan+agg query bench.run_canary
    times), with provenance recorded in the JSON itself."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    local = json.load(open(os.path.join(root, "BENCH_LOCAL.json")))
    anchor = local.get("canary")
    assert anchor and 0.0 < anchor["median"] < 0.2, (
        "BENCH_LOCAL.json lost its fast-box canary anchor"
    )
    # Either the retro-anchor (must carry provenance saying from where)
    # or a wholesale fast-box re-record (bench.run_canary output, which
    # always carries the parallel probe) — the sanctioned re-record
    # path from SCALING.md must not turn this pin red.
    assert "provenance" in anchor or "parallel" in anchor
    # the anchor must actually flow through the attribution line (the
    # probe record copies the anchor's regime so this pin survives the
    # sanctioned wholesale re-record, which bumps the regime marker)
    probe = {"median": 2 * anchor["median"]}
    if "regime" in anchor:
        probe["regime"] = anchor["regime"]
    line = canary_line(local, {"canary": probe})
    assert "box ratio 2.00x" in line


def test_host_line_surfaces_suite_steal():
    """Round 13: steal episodes are minutes-long and can miss the
    canary window while hitting the suite — host_line prints the
    suite-window steal%% when either side recorded it, and stays
    silent for pre-r13 records that lack the field."""
    from tools.compare_bench import host_line

    old = {"host_suite": {"steal_pct": 0.1, "idle_pct": 40.0}}
    new = {"host_suite": {"steal_pct": 7.1, "idle_pct": 5.0}}
    assert host_line(old, new) == "suite steal: 0.10% -> 7.10%"
    assert host_line({}, new) == "suite steal: n/a -> 7.10%"
    assert host_line(old, {"host_suite": {}}) == "suite steal: 0.10% -> n/a"
    assert host_line({}, {}) is None  # pre-r13 on both sides
