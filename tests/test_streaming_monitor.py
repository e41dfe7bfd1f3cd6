"""Streaming observability: the ProgressMonitor listener must see
every micro-batch of an availableNow drain — input rows adding up to
the source row count, state rows for stateful operators, and a clean
termination with no exceptions."""

from __future__ import annotations

from aiesec_guc_spark.catalog import load_table
from aiesec_guc_spark.streaming.incremental import run_streaming_dedup
from aiesec_guc_spark.streaming.monitor import ProgressMonitor


def test_monitor_observes_dedup_drain(spark, sf_dir):
    n_events = load_table(spark, sf_dir, "events").count()

    mon = ProgressMonitor.attach(spark)
    try:
        out = run_streaming_dedup(spark, sf_dir, query_name="mon_dedup")
        assert out.count() == n_events  # replay collapsed to exactly-once
        assert mon.wait_for_batches(1)
        stats = mon.summary()
    finally:
        mon.detach(spark)

    # the replayed stream feeds 2x the events through the source
    assert stats["total_input_rows"] == 2 * n_events
    assert stats["n_fed_batches"] >= 1
    # dedup is stateful: the store held the surviving keys
    assert stats["max_state_rows"] >= n_events
    assert stats["n_exceptions"] == 0
    assert stats["max_batch_ms"] > 0


def test_monitor_detach_stops_collection(spark, sf_dir):
    mon = ProgressMonitor.attach(spark)
    mon.detach(spark)
    run_streaming_dedup(spark, sf_dir, query_name="mon_dedup2")
    assert mon.summary()["n_batches"] == 0
