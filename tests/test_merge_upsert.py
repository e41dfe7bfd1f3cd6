"""Batch MERGE (upsert) for parquet tables: inserts land, matched
keys take the newest version (ties prefer the update), unmatched
target rows survive, reruns are idempotent, and the swap leaves no
siblings behind."""

from __future__ import annotations

import os

import pytest

from aiesec_guc_spark.operators.merge import merge_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts long, v string")


def _snapshot(spark, path):
    return {
        (r.k): (r.ts, r.v) for r in spark.read.parquet(path).collect()
    }


def test_merge_insert_update_retain(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _df(spark, [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")])
    out0 = merge_upsert(spark, path, base, keys=["k"], order_col="ts")
    assert out0 == {"n_before": 0, "n_updates": 3, "n_after": 3}

    updates = _df(
        spark,
        [
            (2, 20, "b2"),   # newer → replaces
            (3, 5, "c_old"), # older → target retained
            (4, 10, "d"),    # new key → inserted
        ],
    )
    out = merge_upsert(spark, path, updates, keys=["k"], order_col="ts")
    assert out == {"n_before": 3, "n_updates": 3, "n_after": 4}
    assert _snapshot(spark, path) == {
        1: (10, "a"),
        2: (20, "b2"),
        3: (10, "c"),
        4: (10, "d"),
    }
    # idempotent rerun (at-least-once redelivery): same final state
    out2 = merge_upsert(spark, path, updates, keys=["k"], order_col="ts")
    assert out2["n_after"] == 4
    assert _snapshot(spark, path)[2] == (20, "b2")
    # no leftover swap siblings
    assert [p for p in os.listdir(tmp_path) if p.startswith("tbl")] == ["tbl"]


def test_merge_tie_prefers_update(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_upsert(spark, path, _df(spark, [(1, 10, "old")]), ["k"], "ts")
    merge_upsert(spark, path, _df(spark, [(1, 10, "new")]), ["k"], "ts")
    assert _snapshot(spark, path) == {1: (10, "new")}


def test_merge_rejects_schema_drift(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_upsert(spark, path, _df(spark, [(1, 10, "a")]), ["k"], "ts")
    bad = spark.createDataFrame([(1, 20)], "k int, ts long")
    with pytest.raises(ValueError, match="differing columns"):
        merge_upsert(spark, path, bad, ["k"], "ts")
