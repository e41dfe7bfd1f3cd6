"""Diff two bench.py JSON outputs and flag per-query regressions.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 2.0]

Compares warm_min (falling back to cold) per query, prints the
queries whose ratio NEW/OLD exceeds the threshold, the ones that
disappeared, and the totals.  Exit code 1 if any regression exceeds
the threshold — suitable as a CI gate between rounds.
"""

from __future__ import annotations

import json
import sys


def pick_pair(o: dict, n: dict) -> tuple[float | None, float | None, str | None]:
    """Choose the (old, new) seconds to compare for one query, or a
    skip reason.

    warm_min on both sides wins (builds are only paid cold, so warm is
    payer-independent).  On the cold fallback, shared-frame builds are
    excluded on BOTH sides via cold_ex_shared (bench.py tags the payer
    with "shared_builds"/"cold_ex_shared"); when exactly ONE side
    carries a payer tag the raw colds aren't comparable — the build
    moved between rounds, or the baseline predates the tagging — so
    the query is noted and skipped rather than read as a phantom
    regression or speedup."""
    ow, nw = o.get("warm_min"), n.get("warm_min")
    if ow is not None and nw is not None:
        return ow, nw, None
    if ("shared_builds" in o) != ("shared_builds" in n):
        return None, None, "shared-frame build tagged on one side only"
    if ow is None:
        ow = o.get("cold_ex_shared", o.get("cold"))
    if nw is None:
        nw = n.get("cold_ex_shared", n.get("cold"))
    return ow, nw, None


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
    od = old.get("queries_detail", {})
    nd = new.get("queries_detail", {})

    print(f"totals: cold {old.get('value')} -> {new.get('value')} | "
          f"warm {old.get('warm_total')} -> {new.get('warm_total')} | "
          f"queries {len(od)} -> {len(nd)}")
    gone = sorted(set(od) - set(nd))
    if gone:
        print(f"missing in NEW ({len(gone)}): {', '.join(gone)}")
    added = sorted(set(nd) - set(od))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")

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
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
