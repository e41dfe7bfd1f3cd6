"""Degenerate-input sweep for the SIDE-EFFECT entry points (VERDICT r9
item 6): the 225 registered queries already survive empty / one-row /
null-injected corpora (tests/test_empty_corpus.py); this file gives the
pytest-only operators — MERGE, SCD2 apply, compaction/layout, retention,
snapshot rotation, the publish pipeline, and the streaming SCD2 drain —
the same systematic treatment.  At 100 TB these states are routine
(a quiet day's empty updates frame, a zero-row file inside a stream, a
fresh table before first ingest, a partition with nothing to compact),
and an operator that throws on them wedges the whole scheduled run.

The bar everywhere: no raise, and where the operation is a logical
no-op, the target's prior state must be untouched.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from aiesec_guc_spark.operators.maintenance import (
    compact_partitions,
    compact_table,
    expire_partitions,
    file_stats,
    vacuum_siblings,
    zorder_rewrite,
)
from aiesec_guc_spark.operators.merge import merge_upsert
from aiesec_guc_spark.operators.scd import scd2_apply
from aiesec_guc_spark.operators.snapshot import write_snapshot

SCHEMA = "user_id long, status string, ts long"


def _frame(spark, shape: str):
    """The three degenerate updates/changes frames."""
    rows = {
        "empty": [],
        "one_row": [(7, "new", 500)],
        # non-key columns NULL — a half-written upstream record
        "nulls": [(8, None, 600), (9, None, None)],
    }[shape]
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, target: str):
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100)], SCHEMA
    )
    merge_upsert(spark, target, base, keys=["user_id"], order_col="ts")
    return base


SHAPES = ["empty", "one_row", "nulls"]


@pytest.mark.parametrize("shape", SHAPES)
def test_merge_upsert_degenerate_updates(spark, tmp_path, shape):
    target = str(tmp_path / "t")
    _seed(spark, target)
    before = sorted(spark.read.parquet(target).collect())
    res = merge_upsert(spark, target, _frame(spark, shape), ["user_id"], "ts")
    after = spark.read.parquet(target)
    if shape == "empty":
        assert res["n_after"] == res["n_before"] == 3
        assert sorted(after.collect()) == before
    else:
        # new keys insert — including all-NULL value/order columns
        assert res["n_after"] == 3 + res["n_updates"]


@pytest.mark.parametrize("shape", SHAPES)
def test_merge_upsert_degenerate_creation(spark, tmp_path, shape):
    # the CREATION path (no existing table) under the same frames
    target = str(tmp_path / "t")
    res = merge_upsert(spark, target, _frame(spark, shape), ["user_id"], "ts")
    assert res["n_before"] == 0
    assert spark.read.parquet(target).count() == res["n_after"]


@pytest.mark.parametrize("shape", SHAPES)
def test_scd2_apply_degenerate_batch(spark, tmp_path, shape):
    target = str(tmp_path / "dim")
    scd2_apply(
        spark,
        target,
        spark.createDataFrame([(1, "a", 100), (2, "b", 100)], SCHEMA),
        "user_id",
        ["status"],
        "ts",
    )
    before = sorted(spark.read.parquet(target).collect())
    scd2_apply(spark, target, _frame(spark, shape), "user_id", ["status"], "ts")
    after = spark.read.parquet(target)
    if shape == "empty":
        assert sorted(after.collect()) == before
    else:
        # unknown keys insert their first version — open (valid_to NULL)
        n_new = _frame(spark, shape).count()
        assert after.filter(F.col("valid_to").isNull()).count() == 2 + n_new


@pytest.mark.parametrize("shape", SHAPES)
def test_scd2_apply_degenerate_creation(spark, tmp_path, shape):
    target = str(tmp_path / "dim")
    scd2_apply(spark, target, _frame(spark, shape), "user_id", ["status"], "ts")
    if shape != "empty":
        assert spark.read.parquet(target).count() == _frame(spark, shape).count()


def test_compact_zero_file_table(spark, tmp_path):
    # (a) a bare directory with no data files at all
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    res = compact_table(spark, bare)
    assert res["before"]["n_files"] == 0 and res["after"] == res["before"]
    # (b) a real parquet table with zero rows
    empty = str(tmp_path / "empty")
    spark.createDataFrame([], SCHEMA).write.parquet(empty)
    res = compact_table(spark, empty, target_bytes=1)
    assert res["after"]["n_files"] >= 0  # no raise is the bar
    assert spark.read.parquet(empty).columns == ["user_id", "status", "ts"]


def test_partition_chores_on_partitionless_table(spark, tmp_path):
    flat = str(tmp_path / "flat")
    spark.createDataFrame([(1, "a", 100)], SCHEMA).write.parquet(flat)
    assert compact_partitions(spark, flat, "run_date") == {}
    assert expire_partitions(flat, "run_date", keep_last=1) == []
    assert vacuum_siblings(flat) == []


def test_zorder_rewrite_empty_frame(spark, tmp_path):
    path = str(tmp_path / "z")
    df = spark.createDataFrame([], "x long, y long")
    stats = zorder_rewrite(df, path, "x", "y", n_files=4)
    assert stats["total_bytes"] >= 0
    assert spark.read.parquet(path).count() == 0


def test_snapshot_rotation_single_empty_day(spark, tmp_path):
    # one EMPTY day is legal to write; the pair read correctly reports
    # the missing-yesterday state as its typed error, not a crash
    from aiesec_guc_spark.operators.snapshot import read_snapshot_pair

    base = str(tmp_path / "snap")
    write_snapshot(spark.createDataFrame([], SCHEMA), base, "2026-03-01")
    with pytest.raises(ValueError, match="two run_date partitions"):
        read_snapshot_pair(spark, base)


def test_publish_daily_quiet_corpus(spark, sf_dir, tmp_path):
    # a corpus with ZERO events — the quiet-day publish must complete
    # with an empty mart and a skipped notification, not crash in any
    # of its five stages (dq gate, mart, snapshot, compaction, notify)
    from aiesec_guc_spark.catalog import load_table
    from aiesec_guc_spark.pipelines.publish import publish_daily

    quiet = tmp_path / "sf_quiet"
    quiet.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        df = load_table(spark, sf_dir, t)
        (df if t != "events" else df.limit(0)).write.parquet(
            str(quiet / f"{t}.parquet")
        )
    sent = []
    manifest = publish_daily(
        spark, str(quiet), str(tmp_path / "out"), "2026-03-02", send=sent.append
    )
    assert manifest["n_rows"] == 0
    assert manifest["notified"] is False and sent == []


def test_streaming_scd2_empty_batch_mid_stream(spark, tmp_path):
    # a zero-row file BETWEEN two real files (maxFilesPerTrigger=1 →
    # it forms its own empty micro-batch) must neither crash the drain
    # nor disturb the versions the surrounding batches produce
    from aiesec_guc_spark.streaming.incremental import run_streaming_scd2

    src_dir = str(tmp_path / "obs")
    t0 = dt.datetime(2026, 3, 1, 9, 0, 0)
    stamps = "user_id long, ts timestamp, event_type string"

    def write(rows):
        spark.createDataFrame(rows, stamps).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes => deterministic batch order

    write([(1, t0, "click")])
    write([])  # the empty middle batch
    write([(1, t0 + dt.timedelta(minutes=5), "purchase")])

    stream = (
        spark.readStream.schema(stamps)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    target = str(tmp_path / "dim")
    out = run_streaming_scd2(spark, sf_dir="", target_path=target, src=stream)
    got = sorted(
        (r["user_id"], r["status"], r["valid_to"] is None)
        for r in out.collect()
    )
    assert got == [(1, "click", False), (1, "purchase", True)]
