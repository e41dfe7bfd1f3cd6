"""Streaming SCD2 maintenance (run_streaming_scd2): multi-batch
versioning must equal the one-shot batch apply, replayed batches must
be skipped via the content-keyed marker protocol (not re-applied), and
— the regression this file pins — NEW data arriving after a completed
run must be APPLIED, never dropped because its epoch id collides with
an already-applied batch's id."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from aiesec_guc_spark.operators.scd import scd2_apply
from aiesec_guc_spark.streaming.incremental import run_streaming_scd2


def _write(spark, path: str, rows) -> None:
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(path)


def _scd_rows(spark, path):
    return sorted(
        (r["user_id"], r["status"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(path).collect()
    )


def test_streaming_scd2_matches_oneshot_and_skips_replay(spark, tmp_path):
    src_dir = str(tmp_path / "obs")
    t0 = dt.datetime(2026, 2, 1, 9, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    b1 = [(1, at(0), "click"), (2, at(1), "view")]
    b2 = [(1, at(10), "purchase"), (2, at(11), "view"), (3, at(12), "click")]
    _write(spark, src_dir, b1)
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    _write(spark, src_dir, b2)

    def stream():
        return (
            spark.readStream.schema("user_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    target = str(tmp_path / "dim")
    out = run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())

    # reference: one-shot batch apply over the union
    ref_target = str(tmp_path / "dim_ref")
    all_changes = spark.createDataFrame(
        b1 + b2, "user_id long, ts timestamp, event_type string"
    ).select(
        "user_id", F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("status"),
    )
    scd2_apply(spark, ref_target, all_changes, "user_id", ["status"], "ts_us")
    assert _scd_rows(spark, target) == _scd_rows(spark, ref_target)
    # user 2's repeated "view" must not have versioned
    assert (
        out.filter((F.col("user_id") == 2)).count() == 1
    )

    # one content-keyed marker per applied batch in the hidden sibling
    marker_dir = str(tmp_path / ".dim__epochs")
    assert len(os.listdir(marker_dir)) == 2

    # replay: a FRESH checkpoint re-delivers both batches (at-least-
    # once); the content-keyed markers must skip them (re-applying
    # would fail-stop on the closed-history precondition) and leave
    # the table unchanged
    before = _scd_rows(spark, target)
    run_streaming_scd2(
        spark, sf_dir="", target_path=target, src=stream(),
        checkpoint_dir=str(tmp_path / "ckpt_replay"),
    )
    assert _scd_rows(spark, target) == before

    # NEW data after a completed run, default (stable sibling)
    # checkpoint: source progress resumes, so only the new file forms
    # a batch and it MUST be applied — under the old tempdir-per-call
    # checkpoint it re-formed as epoch 0 and the bare-epoch marker
    # check silently dropped it.
    time.sleep(1.1)
    b3 = [(3, at(20), "purchase")]
    _write(spark, src_dir, b3)
    run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())
    u3 = sorted(
        (r["status"], r["valid_to"] is None)
        for r in spark.read.parquet(target)
        .filter(F.col("user_id") == 3)
        .collect()
    )
    assert u3 == [("click", False), ("purchase", True)]
    assert len(os.listdir(marker_dir)) == 3


def test_crash_between_apply_and_history_marker_recovers(spark, tmp_path):
    """The wedge scenario: a batch APPLIES (table swapped, atomic
    in-table marker present) but the process dies before the history
    marker lands.  Redelivery must SKIP the batch (not trip the
    late-data guard) and backfill the history marker — recovery
    proceeds with no manual surgery."""
    import datetime as dt
    import glob

    src_dir = str(tmp_path / "obs")
    target = str(tmp_path / "dim")
    t0 = dt.datetime(2026, 3, 1, 9, 0, 0)
    _write(spark, src_dir, [(1, t0, "click"), (1, t0 + dt.timedelta(hours=1), "purchase")])

    def stream():
        return (
            spark.readStream.schema(
                "user_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    run_streaming_scd2(
        spark, sf_dir="", target_path=target, src=stream(),
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    before = _scd_rows(spark, target)
    # the swap left the batch's atomic marker inside the table dir
    atomic = glob.glob(os.path.join(target, "._applied_*"))
    assert atomic, "atomic in-table marker missing after apply"

    # simulate the crash window: history marker gone, apply landed
    marker_dir = str(tmp_path / ".dim__epochs")
    for m in os.listdir(marker_dir):
        os.remove(os.path.join(marker_dir, m))

    # fresh checkpoint redelivers the batch; without the atomic
    # marker this would raise scd2_apply's closed-history ValueError
    run_streaming_scd2(
        spark, sf_dir="", target_path=target, src=stream(),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert _scd_rows(spark, target) == before
    # ...and the history marker was backfilled (self-healing)
    assert len(os.listdir(marker_dir)) >= 1


def test_orphaned_checkpoint_without_table_fails_loudly(spark, tmp_path):
    # The durable checkpoint outlives the table by design; but if the
    # TABLE is deleted while the checkpoint is kept, a rerun would
    # resume source offsets and silently rebuild an empty/partial
    # dimension.  The guard must fail loudly instead.
    import shutil

    import pytest

    src_dir = str(tmp_path / "obs")
    t0 = dt.datetime(2026, 2, 1, 9, 0, 0)
    _write(spark, src_dir, [(1, t0, "click"), (2, t0, "view")])

    def stream():
        return (
            spark.readStream.schema("user_id long, ts timestamp, event_type string")
            .parquet(src_dir)
        )

    target = str(tmp_path / "dim")
    run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())
    assert os.path.isdir(target)

    # table deleted, checkpoint (with consumed offsets) kept
    shutil.rmtree(target)
    with pytest.raises(RuntimeError, match="consumed source offsets"):
        run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())


def test_empty_source_is_a_legal_noop(spark, tmp_path):
    # An availableNow drain over a source with no observations must
    # return the typed empty dimension, not crash reading the
    # never-created target path.
    src_dir = str(tmp_path / "obs")
    spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .parquet(src_dir)
    )
    target = str(tmp_path / "dim")
    out = run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream)
    assert out.count() == 0
    assert out.columns == ["user_id", "status", "valid_from", "valid_to"]
    assert not os.path.isdir(target)  # nothing applied, nothing created


def test_resume_after_noop_drain_applies_new_data(spark, tmp_path):
    # Quiet-day workflow (ADVICE r9): a no-op drain commits source
    # offsets without ever creating the table.  That checkpoint state
    # must NOT trip the orphaned-checkpoint guard — no batch was ever
    # applied, so nothing was lost — and a later run against the SAME
    # durable checkpoint must apply newly arrived data normally.
    src_dir = str(tmp_path / "obs")
    spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(src_dir)

    def stream():
        return (
            spark.readStream.schema("user_id long, ts timestamp, event_type string")
            .parquet(src_dir)
        )

    target = str(tmp_path / "dim")
    out = run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())
    assert out.count() == 0 and not os.path.isdir(target)

    # day 2: real observations arrive; same target => same default
    # durable checkpoint, which now holds the no-op run's offsets
    t0 = dt.datetime(2026, 2, 2, 9, 0, 0)
    _write(spark, src_dir, [(1, t0, "click"), (2, t0, "view")])
    out2 = run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())
    assert sorted(r["user_id"] for r in out2.select("user_id").collect()) == [1, 2]
    assert os.path.isdir(target)

    # and the real-orphan state (markers present, table gone) still
    # fails loudly — the guard lost no teeth
    import shutil

    import pytest

    shutil.rmtree(target)
    with pytest.raises(RuntimeError, match="consumed source offsets"):
        run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream())
