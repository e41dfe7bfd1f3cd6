"""Benchmark runner — the driver's per-round BENCH gate.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line as the LAST stdout line: {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {5 slowest},
"families": {...}, "warm_total": ..., "sf": ...,
"detail_file": "BENCH_DETAIL.json"}.  The complete per-query record
(the old 20 kB form, with "queries_detail" for
tools/compare_bench.py) is written to BENCH_DETAIL.json — driver
stdout capture truncates lines that long (BENCH_r07/r08 were
recorded with "parsed": null).

Each query is timed end-to-end (plan + execute + a count-style fold)
after a warm-up of the session JVM.

Sharding (registry hygiene at 177+ queries — full-suite wall time
grows linearly with registry size, so local iteration shouldn't pay
for families it didn't touch):

    python bench.py --family dedup,similarity   # name-prefix shard
    python bench.py --queries q1,q2             # exact-name shard

The driver's invocation (no args) is unchanged: full registry, full
3-run protocol.  Sharded output carries a "shard" key so a partial
JSON can never be mistaken for a full-suite baseline by
tools/compare_bench.py.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (kept in sync as families land).
HEADLINE = [
    "snapshot_delta_events",
    "snapshot_delta_users",
    "snapshot_changed_users",
    "events_hourly_tumbling",
    "events_sessionize",
]


def _parse_shard(argv: list[str]) -> tuple[list[str] | None, list[str] | None]:
    """(--family prefixes, --queries names) — both None = full suite.

    Argument-strict like the sibling CLIs (compare_bench, steal_probe):
    an unknown token — e.g. the typo `--query` — must exit with usage,
    not silently fall through to a ~30-minute full-suite run whose
    output then looks like a legitimate full baseline.
    """
    fams: list[str] | None = None
    only: list[str] | None = None
    i = 0
    while i < len(argv):
        a = argv[i]
        matched = None
        for flag in ("--family", "--queries"):
            if a == flag or a.startswith(flag + "="):
                matched = flag
                if "=" in a:
                    val = a.split("=", 1)[1]
                else:
                    i += 1
                    if i >= len(argv):
                        print(__doc__)
                        raise SystemExit(2)
                    val = argv[i]
                parsed = [v for v in val.split(",") if v]
                if flag == "--family":
                    fams = parsed
                else:
                    only = parsed
        if matched is None:
            print(__doc__)
            print(f"unknown argument: {a}", file=sys.stderr)
            raise SystemExit(2)
        i += 1
    return fams, only


def summarize_runs(
    runs: list[float], run_builds: list[list[tuple[str, float]]]
) -> dict:
    """Per-query detail row from N timed runs + the shared-frame builds
    each run paid (run_builds[i] = (key, sec) builds logged during run
    i; run 0 is cold).

    Pure function so the accounting is unit-testable without Spark:

    - warm_min/warm_spread come from BUILD-FREE warm runs when any
      exist — a build paid in a warm run (cache eviction) must not
      inflate the number compare_bench gates on.
    - If EVERY warm run paid a build, warm_min is unavoidably inflated
      and the row carries "warm_builds" so tools/compare_bench.py can
      fall back to the cold comparison instead of reading a phantom
      regression (ADVICE r11).
    - Cold-side builds are tagged as before ("shared_builds" +
      "cold_ex_shared").
    """
    d: dict = {"n": len(runs), "cold": runs[0]}
    warm_idx = range(1, len(runs))
    clean = [runs[i] for i in warm_idx if not run_builds[i]]
    warm_pool = clean if clean else [runs[i] for i in warm_idx]
    d["warm_min"] = min(warm_pool) if warm_pool else None
    d["spread"] = round(max(runs) - min(runs), 3)
    # run-to-run variance of the SAME pool warm_min came from — the
    # number that protects the 2x warm gate on a noisy box
    d["warm_spread"] = (
        round(max(warm_pool) - min(warm_pool), 3) if len(warm_pool) > 1 else None
    )
    if run_builds[0]:
        d["shared_builds"] = {k: s for k, s in run_builds[0]}
        d["cold_ex_shared"] = round(
            max(0.0, runs[0] - sum(s for _, s in run_builds[0])), 3
        )
    if not clean and len(runs) > 1:
        warm_paid = [b for i in warm_idx for b in run_builds[i]]
        if warm_paid:
            d["warm_builds"] = {k: s for k, s in warm_paid}
    return d


def queries_all_map(timings: dict[str, float], detail: dict[str, dict]) -> dict:
    """{name: [cold, trusted_warm]} for every successfully-timed query
    — the full-registry map the stdout line publishes (r16, VERDICT
    r15 item 2) so the driver's PERF/scaling can compare all queries
    instead of the top-5 overlap.  Errored queries carry no timings
    and are excluded here exactly as they are from "queries"."""
    return {n: [detail[n]["cold"], trusted_warm(detail[n])] for n in sorted(timings)}


def trusted_warm(d: dict) -> float | None:
    """The warm seconds a TOTAL may add for one detail row.

    warm_min when it came from build-free runs; otherwise the
    build-excluded cold — the same per-row fallback compare_bench's
    pick_pair applies, so the printed `warm X -> Y` totals line can
    never show a phantom drift the per-query gate was taught to
    ignore (a warm_builds-tagged warm_min absorbed a shared-frame
    rebuild and is inflated)."""
    if d.get("warm_min") is not None and "warm_builds" not in d:
        return d["warm_min"]
    return d.get("cold_ex_shared", d.get("cold"))


#: Box-calibration canary (VERDICT r11 item 3): a fixed trivial query
#: timed N times at suite start.  Its median moves with the BOX (CPU
#: contention, JVM health), not with any query's plan, so
#: tools/compare_bench.py can print the cross-round canary ratio beside
#: the totals and environment drift becomes attributable in one line.
CANARY_RUNS = 5

#: Steady-state warm-up (round-14 finding, SCALING.md "The slow-boot
#: class was mostly instrument warm-up"): the canary query's latency
#: in a fresh JVM DECAYS for ~25 runs before reaching steady state —
#: measured same-boot 2026-08-16: runs 1-5 median 0.2103 s, runs
#: 26-40 median ~0.075 s, a 2.8x gap from JIT/codegen warm-up alone.
#: The pre-r14 instrument timed runs 2-6 (one tiny warm-up query,
#: then 5 timed), so every "slow boot class" fingerprint it produced
#: (0.14-0.27 s vs the fully-warm 0.089 s anchor) was dominated by
#: this plateau, not box state.  Fix: burn CANARY_WARMUP untimed runs
#: of the SAME queries first, and stamp the record with a `regime`
#: marker so tools/compare_bench.py refuses ratios across the regime
#: change (pre-r14 records carry no marker = "warmup_v1").
CANARY_WARMUP = 20
CANARY_PARALLEL_WARMUP = 10
CANARY_REGIME = "steady_state_r14"


def _host_cpu_sample() -> list[int] | None:
    """Canonical /proc/stat sampler lives in tools/steal_probe.py (the
    dedicated host-introspection probe); bench re-exports it so the
    two recorders can never drift.  None off-Linux."""
    from tools.steal_probe import cpu_sample

    return cpu_sample()


def _host_attribution(before: list[int] | None) -> dict:
    """Host-level drift attribution over the window since `before`
    (round-12 verdict item 5).  The parallel-throughput cap this host
    exhibits is EPISODIC hypervisor CPU steal — measured r13: 7.1%
    steal in one 32-core burst window, <=0.2% in eleven adjacent
    ones, with the cgroup CPU quota unlimited (cpu.cfs_quota_us=-1)
    and /proc/pressure flat — so a canary-window sample can MISS an
    episode that hits the suite's long all-core phases.  Recording
    steal over BOTH windows makes every bench run self-attributing:
    a slow suite with high suite-window steal is the box, whatever
    the canary said."""
    from tools.steal_probe import read_quota_and_psi

    after = _host_cpu_sample()
    out: dict = {}
    if before is not None and after is not None:
        delta = [b - a for a, b in zip(before, after)]
        total = sum(delta)
        if total > 0:
            out["steal_pct"] = round(100.0 * delta[7] / total, 2)
            out["idle_pct"] = round(100.0 * delta[3] / total, 2)
    try:
        out["loadavg1"] = round(os.getloadavg()[0], 2)
    except (OSError, AttributeError):
        pass
    quota = read_quota_and_psi().get("cpu_quota")
    if quota is not None:
        out["cpu_quota"] = quota
    return out


def run_canary(spark, sf_dir: str) -> dict:
    from aiesec_guc_spark.catalog import load_table

    nation = load_table(spark, sf_dir, "nation")  # 25 rows at every SF

    def scan_agg() -> None:
        nation.groupBy("n_regionkey").count().write.format("noop").mode(
            "overwrite"
        ).save()

    # Untimed steady-state warm-up of the SAME query (see CANARY_WARMUP
    # note): without it the timed window lands on the fresh-JVM decay
    # plateau and reads ~2-3x the box's true single-thread latency.
    for _ in range(CANARY_WARMUP):
        scan_agg()
    # Per-probe host windows (ADVICE r14, tightened r15): sample AFTER
    # the warm-up burns and attribute IMMEDIATELY after the timed
    # runs, so canary.host covers exactly the timed scheduler-canary
    # window — r14 records sampled before the warm-up (wider window);
    # the parallel probe below gets its own window for the same
    # reason (its all-core warm-up shuffles are the steal-prone phase
    # and must not contaminate this attribution).
    host_before = _host_cpu_sample()
    samples: list[float] = []
    for _ in range(CANARY_RUNS):
        t0 = time.time()
        scan_agg()
        samples.append(round(time.time() - t0, 4))
    out = {
        "regime": CANARY_REGIME,
        "runs": samples,
        "min": min(samples),
        "median": sorted(samples)[len(samples) // 2],
        "host": _host_attribution(host_before),
    }
    # Parallel-throughput canary (round-12 run-5 finding): on this
    # class of host, single-thread job latency and ALL-CORE shuffle
    # throughput decouple — the scheduler canary above recovered to
    # 0.20 s while the suite ran 1.5x slow under a hypervisor-level
    # parallel cap.  A fixed 32-task shuffle+agg measures the axis
    # the trivial canary cannot see, so a drifted total can be
    # attributed to EITHER latency or throughput in one line.
    # Workload choice (ADVICE r12 tail; settled r14): a SYNTHETIC
    # range()-based frame, not a suite table — in r12-r13 the probe's
    # 5 pre-suite shuffles over events pre-warmed the very table all
    # five HEADLINE queries scan (SCALING.md "Comparability caveat"),
    # and ANY suite table has the same problem for its own families.
    # range() warms nothing the suite reads, and removing the parquet
    # scan makes the probe a purer shuffle-throughput instrument.
    # The record carries `table` so compare_bench refuses to print a
    # cross-workload parallel ratio against pre-r14 records.
    try:
        from pyspark.sql import functions as F

        base = spark.range(0, 2_000_000, 1, 32).select(
            (F.col("id") % 100_000).alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        def shuffle_agg() -> None:
            base.repartition(32, "k").groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            ).write.format("noop").mode("overwrite").save()

        # Same steady-state treatment as the scheduler canary: the
        # shuffle path has its own fresh-JVM decay (first run ~1.3 s,
        # steady ~0.3-0.5 s), so time only post-warm-up runs.
        for _ in range(CANARY_PARALLEL_WARMUP):
            shuffle_agg()
        phost_before = _host_cpu_sample()
        psamples: list[float] = []
        for _ in range(CANARY_RUNS):
            t0 = time.time()
            shuffle_agg()
            psamples.append(round(time.time() - t0, 4))
        out["parallel"] = {
            "table": "synthetic_range_2m",
            "regime": CANARY_REGIME,
            "runs": psamples,
            "min": min(psamples),
            "median": sorted(psamples)[len(psamples) // 2],
            "host": _host_attribution(phost_before),
        }
    except Exception as exc:  # noqa: BLE001 — diagnostic, not a gate
        out["parallel"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def main() -> None:
    from aiesec_guc_spark.queries import spark_queries
    from aiesec_guc_spark.session import get_spark

    fams, only = _parse_shard(sys.argv[1:])
    # Cross-query CSE: the MinHash/CC frames shared by ≥5 dedup-family
    # queries are computed once per JVM instead of per (query × run) —
    # see operators/dedup.py shared_frame.  Deterministic frames only,
    # so value hashes are unchanged; respect an explicit off-switch.
    os.environ.setdefault("SPARK_GRAFT_SHARED_FRAMES", "1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            raise SystemExit(2)
        names = [n for n in names if n in set(only)]
    if fams is not None:
        names = [n for n in names if any(n.startswith(f) for f in fams)]
    if not names:
        print("shard matched no queries", file=sys.stderr)
        raise SystemExit(2)

    # JVM/codegen warm-up on the smallest sf so per-query timings
    # measure the engine, not session startup.  Falls back to SF_DIR
    # when the fixture tree is absent (custom-corpus boxes), and a
    # failed warm-up is SAID on stderr — silently swallowing it lets
    # the first query's "cold" absorb several seconds of JVM startup
    # with zero indication in the record.
    warmup_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warmup_dir):
        warmup_dir = SF_DIR
    try:
        qs[names[0]](spark, warmup_dir).count()
    except Exception as exc:  # noqa: BLE001 — diagnostic, not a gate
        print(
            f"# warm-up failed ({type(exc).__name__}: {exc}"[:200]
            + ") — first query's cold includes session startup",
            file=sys.stderr,
            flush=True,
        )

    # Box canary AFTER warm-up, BEFORE the suite — measures the box,
    # not session startup or suite-induced pressure.  A canary failure
    # (e.g. a custom SF_DIR without the nation table) must not abort
    # the suite it exists to calibrate.
    try:
        canary = run_canary(spark, SF_DIR)
    except Exception as exc:  # noqa: BLE001 — diagnostic, not a gate
        canary = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    # Steal episodes are minutes-long and can miss the ~5 s canary
    # window while hitting the suite (r12 run 5: canary recovered,
    # totals 1.5x) — so sample the WHOLE suite window too.
    suite_cpu_before = _host_cpu_sample()

    # Determinism accounting: each query runs N times (first = cold,
    # includes codegen/JIT compile; rest = warm).  The headline value
    # stays the sum of COLD timings for cross-round comparability;
    # per-query runs + spread make the ±-seconds compile-storm jitter
    # (see session.py JIT notes) visible instead of folklore.
    # Default 3 (one cold + TWO warm samples): suite-position
    # interference (async block cleanup, JIT/GC pressure from a heavy
    # neighbor) can inflate a single warm run by several seconds —
    # observed 11 s for a query that runs 1.3 s in isolation — and
    # with one warm sample that outlier IS the reported warm_min.
    runs_per_query = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # The similarity family's unrolled dot-product codegen embeds
    # broadcast relation ids, so every plan instance recompiles; at
    # n=2 the bench can't separate compile storms from execution.
    # Give that family ≥4 runs so warm_min is a real execution number.
    similarity_runs = max(runs_per_query, 4)
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        # The composite recall query re-runs all four similarity
        # pipelines per invocation (~15 s each); its components are
        # already benched individually at high run counts, so it keeps
        # the default count.
        n_runs = (
            similarity_runs
            if name.startswith("similarity_") and name != "similarity_ann_recall"
            else runs_per_query
        )
        runs: list[float] = []
        # Shared-frame accounting (ADVICE r9/r11): with
        # SPARK_GRAFT_SHARED_FRAMES=1 the FIRST consumer of a shared
        # frame pays its build inside one of its runs, so timings are
        # order-dependent.  Snapshot the build log around EVERY run so
        # summarize_runs can tag the cold payer (shared_builds /
        # cold_ex_shared) AND keep warm_min build-free (a build paid in
        # a warm run after a cache eviction would otherwise silently
        # inflate it — the phantom-regression class compare_bench
        # exists to prevent).
        from aiesec_guc_spark.operators import dedup as _dedup_ops

        run_builds: list[list[tuple[str, float]]] = []
        # Failure isolation: one raising query must not abort the
        # suite — record the error row and keep benching the rest.
        try:
            for _ in range(n_runs):
                builds_pre = len(_dedup_ops._FRAME_BUILD_LOG)
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                # noop sink: forces full materialization of every output
                # column (count() would let Catalyst skip computing them).
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                run_builds.append(list(_dedup_ops._FRAME_BUILD_LOG[builds_pre:]))
                # Release per-query state so it can't squeeze later
                # queries: clearCache drops catalog-cached relations, and
                # the explicit Python gc releases py4j refs to
                # localCheckpoint'd DataFrames (operators materialize
                # intermediates eagerly) so Spark's ContextCleaner can
                # free their blocks — without it, block buildup degrades
                # unrelated queries late in the suite (observed: 6-row
                # fixture queries at 70 s).
                df = None
                spark.catalog.clearCache()
                gc.collect()
                # The Python gc only releases py4j refs; the JVM must
                # run ITS collector before ContextCleaner's weak-ref
                # queue drains and localCheckpoint blocks actually
                # free.  Without this, block buildup from the heavy
                # dedup/similarity families bleeds multi-second pauses
                # into later unrelated queries (observed: 1.5 s query
                # with a 21 s sample late in the suite).
                spark._jvm.System.gc()
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            detail[name] = {"n": len(runs), "err": errors[name]}
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr, flush=True)
            gc.collect()
            # Same JVM collection as the success path: an errored query
            # may have COMPLETED earlier runs whose localCheckpoint
            # blocks otherwise linger and bleed pauses into later
            # queries (the success path documents the 21 s sample).
            # Guarded: if the query failed BECAUSE the session/Py4J
            # bridge died, these JVM round-trips raise inside the
            # handler and abort the isolate-record-continue loop the
            # rest of the suite depends on — record and move on, the
            # next query's own failure will say the session is gone.
            try:
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            except Exception:  # noqa: BLE001 — dead session; keep the loop
                pass
            continue
        timings[name] = runs[0]
        detail[name] = summarize_runs(runs, run_builds)
        wm = detail[name]["warm_min"]  # build-free pool, same as recorded
        print(
            f"# {name}: cold {runs[0]:.3f}s"
            + (f", warm {wm:.3f}s" if wm is not None else ""),
            file=sys.stderr,
            flush=True,
        )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    shard = (
        {"shard": {"family": fams, "queries": only}}
        if (fams is not None or only is not None)
        else {}
    )
    warm_total = round(
        sum(trusted_warm(d) for d in detail.values() if "cold" in d),
        3,
    )
    host_suite = _host_attribution(suite_cpu_before)
    full = {
        "metric": "query_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "canary": canary,
        "host_suite": host_suite,
        "runs_per_query": runs_per_query,
        # Fixed-membership subtotal: the suite total grows as
        # queries are added round over round, so cross-round
        # comparisons should use this stable headline set.
        "headline_total": round(sum(timings[n] for n in HEADLINE if n in timings), 3),
        "queries_detail": detail,
        # Errored queries carry no timings — they are excluded
        # here but visible in "errors", so a partial total is
        # never silently mistaken for a clean full-suite run.
        "warm_total": warm_total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # present ONLY for sharded runs, so a partial JSON is
        # never mistaken for a full-suite baseline
        **shard,
    }
    # Per-query detail for 225 queries is ~20 kB of JSON — the
    # driver's stdout capture truncates lines that long (BENCH_r07/r08
    # both recorded "parsed": null with only an alphabetical tail
    # surviving).  So the FULL record goes to a repo file the driver
    # can ship, and stdout's final line is a compact (<2 kB) summary
    # that survives capture: totals + errors + per-family aggregates +
    # the slowest tail.  Sharded runs get a suffixed file so a partial
    # detail can never clobber the full-suite record.
    detail_file = "BENCH_DETAIL_SHARD.json" if shard else "BENCH_DETAIL.json"
    detail_path = os.path.join(REPO, detail_file)
    with open(detail_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    # Aggregate by defining MODULE (14 groups), not name prefix (~80
    # singleton groups at 225 queries — that alone pushed the "compact"
    # line past 4 kB, back into truncation territory).
    families: dict[str, dict[str, float | int]] = {}
    for name, d in detail.items():
        if "cold" not in d:
            continue
        fam = qs[name].__module__.rsplit(".", 1)[-1]
        row = families.setdefault(fam, {"n": 0, "cold": 0.0, "warm": 0.0})
        row["n"] += 1
        row["cold"] = round(row["cold"] + d["cold"], 3)
        row["warm"] = round(row["warm"] + trusted_warm(d), 3)
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items()),
            key=lambda kv: kv[1],
            reverse=True,
        )[:5]
    )
    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": full["value"],
                "unit": "sec",
                # Compact stand-in for the per-query map: family
                # subtotals + the 5 slowest individual queries.  The
                # complete per-query map lives in detail_file.
                "queries": slowest,
                # r16 (VERDICT r15 item 2): the driver's PERF/scaling
                # comparison consumes THIS line, and with only the
                # top-5 overlap it could grade 2 of 225 queries.
                # Publish every query as {name: [cold, trusted_warm]}
                # — additions-only; "queries" stays the top-5 for
                # compatibility.  Size check: 225 entries ≈ 9 kB,
                # total line ≈ 11 kB, safely under the ~20 kB driver
                # stdout truncation that nulled BENCH_r07/r08 (the
                # full 20 kB+ detail stays in detail_file).
                "queries_all": queries_all_map(timings, detail),
                "families": families,
                "n_queries": len(timings),
                # Bounded error summary: a systemic failure (say 200
                # errored queries x 500-char messages) would push this
                # "compact" line ~100 kB past the driver's capture
                # truncation — the exact parsed:null failure the line
                # exists to prevent — precisely when diagnostics matter
                # most.  Count + 10 truncated samples here; complete
                # messages in detail_file.
                "n_errors": len(errors),
                "errors": {n: errors[n][:80] for n in sorted(errors)[:10]},
                "canary": canary,
                "host_suite": host_suite,
                "runs_per_query": runs_per_query,
                "headline_total": full["headline_total"],
                "warm_total": warm_total,
                "sf": full["sf"],
                "detail_file": detail_file,
                **shard,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
