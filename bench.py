"""Benchmark runner — the driver's per-round BENCH gate.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + a count-style fold)
after a warm-up of the session JVM.
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


def main() -> None:
    from aiesec_guc_spark.queries import spark_queries
    from aiesec_guc_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # JVM/codegen warm-up on the smallest sf so per-query timings
    # measure the engine, not session startup.
    try:
        qs[names[0]](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        # noop sink: forces full materialization of every output
        # column (count() would let Catalyst skip computing them).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)
        # Release per-query state so it can't squeeze later queries:
        # clearCache drops catalog-cached relations, and the explicit
        # Python gc releases py4j refs to localCheckpoint'd
        # DataFrames (operators materialize intermediates eagerly)
        # so Spark's ContextCleaner can free their blocks — without
        # it, block buildup degrades unrelated queries late in the
        # suite (observed: 6-row fixture queries at 70 s).
        df = None
        spark.catalog.clearCache()
        gc.collect()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
