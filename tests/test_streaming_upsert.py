"""Multi-batch semantics of the foreachBatch merge-upsert: the state
view must evolve batch over batch (insert, update-if-newer,
ignore-if-older), not just reproduce a single-batch argmax — the
single-batch case is already covered by the oracle gate."""

from __future__ import annotations

import datetime as dt
import time

from aiesec_guc_spark.streaming.incremental import run_streaming_upsert_latest


def _write(spark, path: str, rows) -> None:
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_upsert_merges_across_micro_batches(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    t = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(m: int) -> dt.datetime:
        return t.replace(minute=m)

    # Batch 1: users 1 and 2 appear.
    _write(spark, src_dir, [(1, at(0), 100, 1.0), (2, at(1), 101, 2.0)])
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    # Batch 2: newer event for user 1 (must replace), new user 3.
    _write(spark, src_dir, [(1, at(30), 200, 9.0), (3, at(5), 201, 3.0)])
    time.sleep(1.1)
    # Batch 3: OLDER event for user 1 (must NOT replace), plus a
    # same-ts tie for user 2 with a higher event_id (tie-break wins).
    _write(spark, src_dir, [(1, at(10), 300, 7.0), (2, at(1), 301, 4.0)])

    src = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = run_streaming_upsert_latest(
        spark, sf_dir="", query_name="upsert_mb_test", src=src
    )
    got = {r["user_id"]: (r["event_id"], r["value"]) for r in out.collect()}
    assert got == {
        1: (200, 9.0),  # batch-2 update survived the older batch-3 row
        2: (301, 4.0),  # same-ts tie resolved by higher event_id
        3: (201, 3.0),
    }


def test_superseded_state_blocks_are_released(spark, tmp_path):
    """Each micro-batch localCheckpoints a fresh state copy; the
    superseded copy must be dropped at the RDD level (DataFrame
    .unpersist() is a no-op for localCheckpoints — it talks to the
    CacheManager, which never registered them).  Persistent-RDD count
    must stay bounded at the ONE live state, not grow O(batches)."""
    src_dir = str(tmp_path / "obs")
    rows = [
        (i % 7, dt.datetime(2026, 1, 1, 9, 0, i), i, float(i))
        for i in range(40)
    ]
    for k in range(8):  # 8 files -> 8 micro-batches
        spark.createDataFrame(
            rows[k * 5 : (k + 1) * 5],
            "user_id long, ts timestamp, event_id long, value double",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    sc = spark.sparkContext
    n0 = sc._jsc.sc().getPersistentRDDs().size()
    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = run_streaming_upsert_latest(
        spark, sf_dir="", query_name="upsert_gc_test", src=src
    )
    assert out.count() == 7
    n_after = sc._jsc.sc().getPersistentRDDs().size()
    assert n_after - n0 <= 1, (
        f"superseded state copies leaked: {n0} -> {n_after} persistent RDDs"
    )
