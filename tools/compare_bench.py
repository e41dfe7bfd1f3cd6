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


def _warm(detail: dict) -> float | None:
    w = detail.get("warm_min")
    if w is not None:
        return w
    # Single-run fallback: prefer the shared-build-excluded cold, so a
    # registry reorder that moves WHICH query pays a shared-frame build
    # (bench.py tags the payer with "shared_builds"/"cold_ex_shared")
    # never reads as a per-query regression or speedup.
    ce = detail.get("cold_ex_shared")
    return ce if ce is not None else detail.get("cold")


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
        ow, nw = _warm(od[name]), _warm(nd[name])
        if not ow or not nw or ow <= 0:
            continue
        ratio = nw / ow
        if ratio > threshold and nw - ow > 0.5:  # ignore sub-second jitter
            regressions.append((ratio, name, ow, nw))
    for ratio, name, ow, nw in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {ow:.2f}s -> {nw:.2f}s ({ratio:.1f}x)")
    if not regressions:
        print(f"no per-query regression above {threshold}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
