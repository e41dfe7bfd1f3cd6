"""Isolated warm-variance probe for the n-gram Jaccard family.

    python tools/ngram_variance_probe.py [--runs 12] [--sf /root/testdata/sf0.1]

Settles VERDICT r10/r11 ask: is the `dedup_ngram_jaccard` /
`dedup_ngram_jaccard_prefix` warm spread (observed up to ~1.05x of
warm_min in full-suite runs) a property of the queries (the suspect:
the `materialize` localCheckpoint cadence in operators/dedup.py) or of
the box (CPU contention / JVM GC pressure from suite neighbors)?

Protocol, per the verdict's "done" condition:
- ONE dedicated JVM running ONLY this family — no suite neighbors, so
  any spread observed here belongs to the query or the box, not to
  suite-position interference.
- SPARK_GRAFT_SHARED_FRAMES **off** (the flag-off path is the one with
  per-run materialize builds, i.e. the suspect cadence).
- >=10 warm runs per query, each bracketed by:
  - a fixed box canary (tiny JVM-side scan+agg on a 25-row table) —
    tracks box/JVM health independent of the probe queries;
  - JVM GC deltas (collection count + time from the GC MXBeans) —
    tracks whether slow runs are GC-bound;
  - 1-minute system load average.
Correlation of run time with the canary => box-level noise.
Correlation with GC-time delta (canary flat) => the materialize
cadence is creating collector pressure and the cadence should be
tuned.  Neither => irreducible scheduler jitter; close as
environmental.

Writes NGRAM_PROBE_r12.json (per-run rows + summary stats) and prints
a one-line verdict.  This is a TIMING run: never execute it alongside
another Spark JVM.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["dedup_ngram_jaccard", "dedup_ngram_jaccard_prefix"]


def gc_totals(spark) -> tuple[int, int]:
    """(total collection count, total collection millis) across all
    JVM garbage collectors."""
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    count = t = 0
    for i in range(beans.size()):
        b = beans.get(i)
        count += b.getCollectionCount()
        t += b.getCollectionTime()
    return count, t


def load_avg(spark) -> float:
    os_bean = spark._jvm.java.lang.management.ManagementFactory.getOperatingSystemMXBean()
    return float(os_bean.getSystemLoadAverage())


def pearson(xs: list[float], ys: list[float]) -> float | None:
    n = len(xs)
    if n < 3:
        return None
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    if sxx == 0 or syy == 0:
        return None
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return round(sxy / (sxx * syy) ** 0.5, 3)


def main() -> int:
    runs = 12
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        # exact flag names only, and a usage exit (not a traceback) on a
        # missing/malformed value — same contract as gen_priority.py
        try:
            if a == "--runs" or a.startswith("--runs="):
                runs = int(a.split("=", 1)[1] if "=" in a else argv[(i := i + 1)])
            elif a == "--sf" or a.startswith("--sf="):
                sf_dir = a.split("=", 1)[1] if "=" in a else argv[(i := i + 1)]
            else:
                print(__doc__, file=sys.stderr)
                print(f"unrecognized argument: {a}", file=sys.stderr)
                return 2
        except (IndexError, ValueError) as exc:
            print(__doc__, file=sys.stderr)
            print(f"bad value for {a}: {exc}", file=sys.stderr)
            return 2
        i += 1

    # Flag-off is the point of the probe; hard-set rather than setdefault
    # so a shell that exported =1 can't silently change the experiment.
    os.environ["SPARK_GRAFT_SHARED_FRAMES"] = "0"

    from aiesec_guc_spark.catalog import load_table
    from aiesec_guc_spark.queries import spark_queries
    from aiesec_guc_spark.session import get_spark

    spark = get_spark("ngram-variance-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    nation = load_table(spark, sf_dir, "nation")

    def canary() -> float:
        t0 = time.time()
        nation.groupBy("n_regionkey").count().write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 4)

    # JVM warm-up: one canary + one cold pass of each probe query at the
    # smallest available sf so codegen/JIT is out of the measured runs;
    # fall back to the probe's own sf_dir when the standard small dir is
    # absent (a custom --sf box) rather than crashing pre-measurement.
    canary()
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    for name in QUERIES:
        qs[name](spark, warm_sf).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict] = {
        "sf_dir": sf_dir,
        "runs_requested": runs,
        "shared_frames": os.environ["SPARK_GRAFT_SHARED_FRAMES"],
    }
    for name in QUERIES:
        rows: list[dict] = []
        for r in range(runs + 1):  # +1: first run is cold, excluded from stats
            c_before = canary()
            gcc0, gct0 = gc_totals(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.time() - t0, 3)
            gcc1, gct1 = gc_totals(spark)
            rows.append(
                {
                    "run": r,
                    "cold": r == 0,
                    "sec": elapsed,
                    "canary_sec": c_before,
                    "gc_count_delta": gcc1 - gcc0,
                    "gc_ms_delta": gct1 - gct0,
                    "load_avg": load_avg(spark),
                }
            )
            # Same cleanup cadence as bench.py so the probe measures the
            # query, not block buildup.
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            print(
                f"# {name} run {r}{' (cold)' if r == 0 else ''}: {elapsed:.3f}s "
                f"canary {c_before:.3f}s gc {gct1 - gct0}ms",
                file=sys.stderr,
                flush=True,
            )
        warm = [row for row in rows if not row["cold"]]
        secs = [row["sec"] for row in warm]
        wmin = min(secs)
        summary = {
            "warm_min": wmin,
            "warm_max": max(secs),
            "warm_mean": round(sum(secs) / len(secs), 3),
            "warm_spread": round(max(secs) - wmin, 3),
            "spread_over_min": round((max(secs) - wmin) / wmin, 3),
            "corr_sec_canary": pearson(secs, [r["canary_sec"] for r in warm]),
            "corr_sec_gc_ms": pearson(secs, [float(r["gc_ms_delta"]) for r in warm]),
            "corr_sec_load": pearson(secs, [r["load_avg"] for r in warm]),
        }
        out[name] = {"runs": rows, "summary": summary}
        print(f"# {name} summary: {json.dumps(summary)}", file=sys.stderr, flush=True)

    path = os.path.join(REPO, "NGRAM_PROBE_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    verdicts = {
        n: (
            "STABLE (spread < 0.5x warm_min)"
            if out[n]["summary"]["spread_over_min"] < 0.5
            else "VARIANT"
        )
        for n in QUERIES
    }
    print(json.dumps({"probe": "ngram_variance", "file": path, "verdicts": verdicts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
