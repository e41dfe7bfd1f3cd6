"""Unit pins for tools/compare_bench.py's pair selection — the
cross-round perf gate must not depend on WHICH query paid a shared
frame's build (registry order moves the payer between rounds).

Pure-dict tests, no Spark session.
"""

from __future__ import annotations

from tools.compare_bench import pick_pair


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
