"""Diff two bench.py JSON outputs and flag per-query regressions.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 2.0]

Compares warm_min (falling back to cold) per query, prints the
queries whose ratio NEW/OLD exceeds the threshold, the ones that
disappeared or newly ERRORED, and the totals.  Exit code 1 if any
regression exceeds the threshold or any query errored in NEW —
suitable as a CI gate between rounds.  Exit 2 when either input
can't back the gate (sharded run, or a compact stdout record with
no queries_detail).
"""

from __future__ import annotations

import json
import sys


def pick_pair(o: dict, n: dict) -> tuple[float | None, float | None, str | None]:
    """Choose the (old, new) seconds to compare for one query, or a
    skip reason.

    A side's warm_min is trusted when present AND not tagged
    "warm_builds" (bench.py sets that tag only when EVERY warm run
    paid a shared-frame build — cache eviction — so warm_min absorbed
    one and is inflated).  Trusted warm on both sides wins (builds are
    normally paid cold, so warm is payer-independent).

    When exactly one side has a trusted warm_min, the other side falls
    back to its build-excluded cold (cold_ex_shared when tagged as the
    payer, raw cold when untagged) rather than skipping — skipping
    here would silently drop a real regression from the gate (ADVICE
    r11).  Only the all-cold case with a payer tag on exactly ONE side
    is skipped: there the untagged side may predate the tagging
    entirely, so the raw colds aren't comparable and any ratio would
    be a phantom."""

    def eff_warm(d: dict) -> float | None:
        return d.get("warm_min") if "warm_builds" not in d else None

    def eff_cold(d: dict) -> float | None:
        return d.get("cold_ex_shared", d.get("cold"))

    ow, nw = eff_warm(o), eff_warm(n)
    if ow is not None and nw is not None:
        return ow, nw, None
    if ow is None and nw is None:
        if ("shared_builds" in o) != ("shared_builds" in n):
            return None, None, "shared-frame build tagged on one side only"
        return eff_cold(o), eff_cold(n), None
    return (
        ow if ow is not None else eff_cold(o),
        nw if nw is not None else eff_cold(n),
        None,
    )


def canary_line(old: dict, new: dict) -> str:
    """One line attributing cross-round drift to the box: the ratio of
    the fixed trivial-query medians bench.py records at suite start.
    A totals drift that tracks the canary ratio is environment, not
    code."""
    oc, nc = old.get("canary"), new.get("canary")
    oc = oc if oc and "median" in oc else None  # errored canary = absent
    nc = nc if nc and "median" in nc else None
    if not oc and not nc:
        return "canary: recorded on neither side — box drift not attributable"
    if not oc or not nc:
        have = "OLD" if oc else "NEW"
        return f"canary: recorded on {have} side only — box drift not attributable"
    # Measurement-regime guard (round 14): the pre-r14 instrument timed
    # the canary on the fresh-JVM warm-up plateau (~2-3x steady state —
    # see bench.CANARY_WARMUP); post-r14 records are steady-state and
    # carry a `regime` marker.  A ratio across the two regimes measures
    # the instrument change, not the box, so name the change instead.
    oreg = oc.get("regime", "warmup_v1")
    nreg = nc.get("regime", "warmup_v1")
    if oreg != nreg:
        return (
            f"canary: measurement regime changed ({oreg} -> {nreg}), "
            f"ratios not comparable"
        )
    ratio = nc["median"] / oc["median"] if oc["median"] else float("nan")
    line = (
        f"canary: {oc['median']:.4f}s -> {nc['median']:.4f}s "
        f"(box ratio {ratio:.2f}x)"
    )
    # Parallel-throughput canary (round 12): scheduler latency and
    # all-core throughput drift INDEPENDENTLY on shared hosts, so a
    # recovered trivial canary does not clear a slow suite — print
    # both ratios when both sides recorded the parallel probe.
    op, np_ = oc.get("parallel"), nc.get("parallel")
    op = op if op and "median" in op else None
    np_ = np_ if np_ and "median" in np_ else None
    if op and np_:
        # The parallel probe's workload table changed events->orders in
        # r14 (records before that carry no `table` key = events); a
        # ratio across different workloads attributes nothing, so name
        # the change instead of printing a number.
        ot = op.get("table", "events")
        nt = np_.get("table", "events")
        opr = op.get("regime", "warmup_v1")
        npr = np_.get("regime", "warmup_v1")
        if ot != nt:
            line += (
                f" | parallel: workload table changed ({ot} -> {nt}), "
                f"ratio not comparable"
            )
        elif opr != npr:
            line += (
                f" | parallel: measurement regime changed "
                f"({opr} -> {npr}), ratio not comparable"
            )
        else:
            pratio = (
                np_["median"] / op["median"] if op["median"] else float("nan")
            )
            line += (
                f" | parallel: {op['median']:.3f}s -> {np_['median']:.3f}s "
                f"({pratio:.2f}x)"
            )
    return line


def host_line(old: dict, new: dict) -> str | None:
    """Suite-window hypervisor-steal attribution (round 13): steal on
    this host arrives in minutes-long EPISODES that can miss the 5 s
    canary window while hitting the suite's all-core phases, so
    bench.py records steal% over the whole suite too.  A slow suite
    with high suite steal is the box, whatever the canary said.
    Returns None when neither side recorded it (pre-r13 records)."""
    oh = (old.get("host_suite") or {}).get("steal_pct")
    nh = (new.get("host_suite") or {}).get("steal_pct")
    if oh is None and nh is None:
        return None
    fmt = lambda v: "n/a" if v is None else f"{v:.2f}%"  # noqa: E731
    return f"suite steal: {fmt(oh)} -> {fmt(nh)}"


def main() -> int:
    threshold = 2.0
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            try:
                if "=" in a:
                    threshold = float(a.split("=", 1)[1])
                else:
                    i += 1
                    threshold = float(argv[i])
            except (IndexError, ValueError):
                print(__doc__)
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    for label, doc in (("OLD", old), ("NEW", new)):
        if doc.get("shard"):
            print(
                f"{label} file is a sharded bench ({doc['shard']}) — "
                "not comparable to a full-suite baseline"
            )
            return 2
    od = old.get("queries_detail") or {}
    nd = new.get("queries_detail") or {}
    for label, d in (("OLD", od), ("NEW", nd)):
        if not d:
            # A compact stdout-line record (bench.py deliberately omits
            # queries_detail from it) would make the per-query loop
            # vacuous — zero pairs compared, "no regression", exit 0.
            # Refuse like the shard case instead of gating on nothing.
            print(
                f"{label} file has no queries_detail — compact stdout "
                "records can't back the per-query gate; use the "
                "BENCH_DETAIL file bench.py writes"
            )
            return 2

    print(f"totals: cold {old.get('value')} -> {new.get('value')} | "
          f"warm {old.get('warm_total')} -> {new.get('warm_total')} | "
          f"queries {len(od)} -> {len(nd)}")
    print(canary_line(old, new))
    hl = host_line(old, new)
    if hl:
        print(hl)
    gone = sorted(set(od) - set(nd))
    if gone:
        print(f"missing in NEW ({len(gone)}): {', '.join(gone)}")
    added = sorted(set(nd) - set(od))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")

    # A query that ERRORED in NEW has a detail row with no timings;
    # pick_pair would return (ow, None) and the loop below would skip
    # it silently — a regression-to-crash passing the gate invisibly.
    # Say it loudly and fail the gate like a timing regression.  The
    # scan covers ADDED queries too: a brand-new query that crashes
    # has no OLD row, so the shared-key scan alone would leave it in
    # the informational "new queries" list and exit 0.
    errored_new = sorted(
        [n for n in set(od) & set(nd) if "err" in nd[n] and "err" not in od[n]]
        + [n for n in added if "err" in nd[n]]
    )
    for n in errored_new:
        print(f"ERRORED in NEW: {n}: {nd[n]['err'][:160]}")
    recovered = sorted(
        n for n in set(od) & set(nd) if "err" in od[n] and "err" not in nd[n]
    )
    if recovered:
        print(f"recovered from OLD errors ({len(recovered)}): "
              f"{', '.join(recovered)}")

    regressions = []
    for name in sorted(set(od) & set(nd)):
        ow, nw, skip = pick_pair(od[name], nd[name])
        if skip:
            print(f"skipped {name}: {skip}")
            continue
        if not ow or not nw or ow <= 0:
            continue
        ratio = nw / ow
        if ratio > threshold and nw - ow > 0.5:  # ignore sub-second jitter
            # a warm_min with large run-to-run warm spread on either
            # side marks the comparison as box-noise-suspect
            noisy = [
                label
                for label, d in (("old", od[name]), ("new", nd[name]))
                if d.get("warm_spread") is not None
                and d.get("warm_min")
                and d["warm_spread"] > 0.5 * d["warm_min"]
            ]
            regressions.append((ratio, name, ow, nw, noisy))
    for ratio, name, ow, nw, noisy in sorted(regressions, reverse=True):
        tag = f"  [noisy warm runs: {', '.join(noisy)}]" if noisy else ""
        print(f"REGRESSION {name}: {ow:.2f}s -> {nw:.2f}s ({ratio:.1f}x){tag}")
    if not regressions:
        print(f"no per-query regression above {threshold}x")
    return 1 if (regressions or errored_new) else 0


if __name__ == "__main__":
    raise SystemExit(main())
