"""The composed publish pipeline: DQ gate blocks bad inputs, the
snapshot lands partitioned and idempotent, compaction leaves one
file, and the guarded notification fires exactly when rows exist."""

from __future__ import annotations

import os

import pytest

from aiesec_guc_spark.pipelines.publish import (
    DEFAULT_BLOCKING,
    PublishBlocked,
    publish_daily,
)


def test_publish_happy_path_and_idempotent_rerun(spark, sf_dir, tmp_path):
    sent = []
    out = str(tmp_path / "warehouse")

    m1 = publish_daily(
        spark, sf_dir, out, "2026-08-14", send=sent.append
    )
    assert m1["n_rows"] > 0
    assert m1["notified"] is True
    assert len(sent) == 1 and "rows" in sent[0]
    assert m1["dq"]["dup_orderkeys"] == 0
    # compacted day: a single data file in the partition dir
    part = os.path.join(out, "daily_ops_mart", "run_date=2026-08-14")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) == 1

    # rerun of the SAME day replaces, never duplicates
    m2 = publish_daily(spark, sf_dir, out, "2026-08-14", send=sent.append)
    assert m2["n_rows"] == m1["n_rows"]

    # a second day lands beside the first, both readable
    publish_daily(spark, sf_dir, out, "2026-08-15", send=sent.append)
    snaps = spark.read.parquet(os.path.join(out, "daily_ops_mart"))
    days = {
        r[0]
        for r in snaps.selectExpr("CAST(run_date AS STRING)").distinct().collect()
    }
    assert days == {"2026-08-14", "2026-08-15"}


def test_publish_blocked_by_dq(spark, sf_dir, tmp_path):
    # the synthetic corpus HAS shipped-before-ordered rows; promoting
    # that advisory check to blocking must stop the publish cold
    blocking = frozenset(DEFAULT_BLOCKING | {"shipped_before_ordered"})
    out = str(tmp_path / "warehouse")
    with pytest.raises(PublishBlocked) as exc:
        publish_daily(spark, sf_dir, out, "2026-08-14", blocking=blocking)
    assert "shipped_before_ordered" in exc.value.violations
    # nothing was published
    assert not os.path.exists(os.path.join(out, "daily_ops_mart"))
