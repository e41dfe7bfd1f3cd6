"""Small-file compaction: rewrites must preserve every row exactly,
hit the planned file count, never leave a half-written table, and
no-op when the table is already compact."""

from __future__ import annotations

import os

import pytest

from aiesec_guc_spark.catalog import load_table
from aiesec_guc_spark.operators.maintenance import (
    compact_table,
    file_stats,
    plan_target_files,
)


def _fragmented(spark, sf_dir, path, n=24):
    df = load_table(spark, sf_dir, "nation")
    df.repartition(n).write.mode("overwrite").parquet(path)
    return df


def test_plan_target_files():
    assert plan_target_files(0, 100) == 1
    assert plan_target_files(1, 100) == 1
    assert plan_target_files(100, 100) == 1
    assert plan_target_files(101, 100) == 2
    with pytest.raises(ValueError):
        plan_target_files(10, 0)


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    df = _fragmented(spark, sf_dir, path)
    expected = sorted(map(tuple, df.collect()))

    before = file_stats(path)
    assert before["n_files"] >= 24

    out = compact_table(spark, path, target_bytes=before["total_bytes"] + 1)
    assert out["n_target"] == 1
    assert out["after"]["n_files"] == 1

    back = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert back == expected
    # no leftover temp/old siblings from the swap
    siblings = [p for p in os.listdir(tmp_path) if p.startswith("tbl")]
    assert siblings == ["tbl"]


def test_compaction_noop_when_already_compact(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    df = load_table(spark, sf_dir, "nation")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stats = file_stats(path)
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    out = compact_table(spark, path, target_bytes=stats["total_bytes"] + 1)
    assert out["after"] == out["before"]
    # untouched files — the no-op really didn't rewrite
    assert {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    } == mtimes


def test_compaction_respects_target_size(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    _fragmented(spark, sf_dir, path, n=16)
    before = file_stats(path)
    # aim for ~4 files
    target = max(1, before["total_bytes"] // 4)
    out = compact_table(spark, path, target_bytes=target)
    assert out["after"]["n_files"] == out["n_target"]
    assert out["after"]["n_files"] < before["n_files"]


def test_vacuum_removes_only_orphan_siblings(spark, sf_dir, tmp_path):
    from aiesec_guc_spark.operators.maintenance import vacuum_siblings

    path = str(tmp_path / "tbl")
    _fragmented(spark, sf_dir, path, n=4)
    # simulate a crash mid-swap: stale temp + old dirs beside the table
    for orphan in ("tbl__compact_dead1", "tbl__merge_dead2", "tbl__old_dead3"):
        os.makedirs(tmp_path / orphan)
    # an unrelated sibling must survive
    os.makedirs(tmp_path / "tbl_backup")

    matched = vacuum_siblings(path, dry_run=True)
    assert len(matched) == 3
    assert all(os.path.exists(m) for m in matched)

    removed = vacuum_siblings(path)
    assert len(removed) == 3
    left = sorted(os.listdir(tmp_path))
    assert left == ["tbl", "tbl_backup"]
    # table untouched
    assert spark.read.parquet(path).count() > 0
