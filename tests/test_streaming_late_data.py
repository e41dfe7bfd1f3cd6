"""Watermark late-data semantics, end to end: a row arriving AFTER its
window has been finalized must be dropped from an append-mode windowed
aggregation — this is the mechanism that bounds state at 100 TB, so it
gets its own test instead of being folded into the availableNow drain
tests.

Semantics pinned here (verified against pyspark 4.1.2): a "late" row
that arrives in the SAME micro-batch in which the watermark first
crosses its window is still included — the window is only evicted at
the end of that batch.  The guaranteed drop is for rows arriving after
eviction, so the test uses three micro-batches: (1) watermark
advances, (2) the window finalizes and emits, (3) the late row arrives
and must neither change the emitted count nor re-emit the window.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F


def _write_events(spark, path: str, times: list[dt.datetime]) -> None:
    rows = [(i, t) for i, t in enumerate(times)]
    spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_late_row_dropped_after_window_finalized(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(h: int, m: int) -> dt.datetime:
        return base.replace(hour=h, minute=m)

    # Batch 1: two rows in the 10:00 window plus a 13:00 row that
    # advances the watermark to 12:00 (1 h delay) at the NEXT batch.
    _write_events(spark, src_dir, [at(10, 5), at(10, 10), at(13, 0)])
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    # Batch 2: on-time row; runs with watermark 12:00, so the 10:00
    # window (end 11:00 < 12:00) is evicted and emitted with n=2.
    _write_events(spark, src_dir, [at(13, 30)])
    time.sleep(1.1)
    # Batch 3: genuinely late row for the already-finalized window.
    _write_events(spark, src_dir, [at(10, 30)])

    n_files = sum(1 for f in os.listdir(src_dir) if f.endswith(".parquet"))
    assert n_files == 3, "expected one part file per batch"

    agg = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = sorted(
        (r["start"], r["n"])
        for r in spark.table("late_data_test")
        .select(F.col("window.start").alias("start"), "n")
        .collect()
    )
    # Exactly one finalized window, counting only the on-time rows.
    # n=3 would mean the late row mutated an already-emitted window; a
    # second (10:00, 1) row would mean it re-opened evicted state; a
    # 13:00 window row would mean append emitted before finalization.
    assert out == [(at(10, 0), 2)], f"append output {out}"


def test_stream_stream_outer_join_withholds_terminal_unmatched_row(
    spark, tmp_path
):
    """TRIPWIRE pinning the stream-stream LEFT OUTER join emission gap
    documented in streaming/incremental.py (run_streaming_interval_join
    removed its outer variant over this): under pyspark 4.1.2 +
    availableNow, an unmatched left row whose eviction bound
    (c_ts + range + delay) the FINAL watermark never passes is
    withheld — even though availableNow has consumed ALL data, so any
    batch oracle would emit its null row.  Emission is therefore
    data-dependent (it hinges on where stream-end falls relative to
    each row's bound), which is why the INNER form is the gate-checked
    surface.

    If a Spark upgrade starts flushing terminal state (emitting
    (40, None) here), this test fails loudly — that's the signal the
    outer variant can be promoted to a gate-checked query with a
    batch-SQL oracle.

    Two deterministic facts pinned:
    - click 10 (unmatched, eviction bound LONG passed by the final
      watermark) DOES emit its outer row — the working half;
    - click 40 (unmatched, 7 min before max event time, bound NOT
      passed: watermark = max_ts - 10 min < c_ts + 5 min) emits
      NOTHING.
    """
    src_dir = str(tmp_path / "ev")
    t0 = dt.datetime(2026, 3, 1, 12, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    b1 = [(1, 10, at(0), "click"), (2, 20, at(0), "click"), (2, 21, at(2), "purchase")]
    # 3h later: watermark advances past batch-1 bounds; u4's purchase
    # is OUTSIDE its click's 5-min window (unmatched both ways)
    b2 = [
        (3, 30, at(180), "click"),
        (3, 31, at(181), "purchase"),
        (4, 40, at(183), "click"),
        (4, 41, at(190), "purchase"),
    ]

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode("append").parquet(src_dir)

    write(b1)
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    write(b2)

    src = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + INTERVAL 5 MINUTES"
        ),
        "left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("oj_tripwire")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.table("oj_tripwire").collect()
    )
    # A batch left join would ALSO contain (40, None).
    assert got == [(10, None), (20, 21), (30, 31)], got
