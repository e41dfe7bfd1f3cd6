"""Snapshot rotation as a partitioned table (S5/S9): append-only
run_date partitions replace the reference's file copy; the delta over
the latest pair equals the golden fixture delta."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from aiesec_guc_spark.operators.snapshot import (
    read_snapshot_pair,
    snapshot_delta,
    write_snapshot,
)
from aiesec_guc_spark.sources.fixtures import EXPECTED_DELTA_ROWS, snapshot_pair


def test_partitioned_rotation_roundtrip(spark):
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        write_snapshot(yesterday, base, "2026-08-12")
        write_snapshot(today, base, "2026-08-13")
        t2, y2 = read_snapshot_pair(spark, base)
        assert t2.count() == today.count()
        assert y2.count() == yesterday.count()
        delta = snapshot_delta(t2, y2, keys=["opportunity_id"])
        got = sorted(tuple(r) for r in delta.select(*today.columns).collect())
        assert got == sorted(EXPECTED_DELTA_ROWS)


def test_rerun_same_run_date_is_idempotent(spark):
    """A cron retry of the same run_date replaces that partition
    instead of appending a duplicate copy of every row (and leaves
    other partitions untouched)."""
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        write_snapshot(yesterday, base, "2026-08-12")
        write_snapshot(today, base, "2026-08-13")
        write_snapshot(today, base, "2026-08-13")  # retry
        t2, y2 = read_snapshot_pair(spark, base)
        assert t2.count() == today.count()
        assert y2.count() == yesterday.count()


def test_rerun_to_empty_replaces_the_stale_day(spark):
    """A retry whose re-scrape finds NOTHING must make the day empty —
    dynamic partition overwrite alone would leave the first write's
    rows in place (zero incoming rows touch zero partitions), silently
    resurrecting a listing the site no longer shows."""
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        write_snapshot(yesterday, base, "2026-08-12")
        write_snapshot(today, base, "2026-08-13")
        write_snapshot(today.limit(0), base, "2026-08-13")  # empty retry
        t2, y2 = read_snapshot_pair(spark, base)
        assert t2.count() == 0
        assert y2.count() == yesterday.count()


def test_rotation_reads_prune_partitions(spark):
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        for d in ["2026-08-10", "2026-08-11", "2026-08-12"]:
            write_snapshot(yesterday, base, d)
        write_snapshot(today, base, "2026-08-13")
        t2, _ = read_snapshot_pair(spark, base)
        # partition filter appears in the scan
        plan = t2._jdf.queryExecution().executedPlan().toString()
        assert "run_date" in plan
        assert t2.count() == today.count()


def test_blind_path_never_overwrites_fresh_rows(spark):
    """ADVICE r11 (medium): when the local filesystem cannot see
    base_path as a literal directory (here: a ``file://`` URI — same
    class as hdfs:// / s3a:// on a cluster), the post-write listing is
    BLIND, not empty — write_snapshot must not conclude "zero rows
    written" and clobber the freshly written partition with an empty
    frame.  Non-empty days keep their rows; a rerun-to-empty on the
    same blind path still replaces the stale day (via the df-based
    emptiness fallback)."""
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        blind = f"file://{base}"
        write_snapshot(yesterday, blind, "2026-08-12")
        write_snapshot(today, blind, "2026-08-13")
        t2, y2 = read_snapshot_pair(spark, base)  # plain path: same dir
        assert t2.count() == today.count()  # NOT clobbered to empty
        assert y2.count() == yesterday.count()
        # quiet-day rerun through the blind path replaces the stale day
        write_snapshot(today.limit(0), blind, "2026-08-13")
        t3, y3 = read_snapshot_pair(spark, base)
        assert t3.count() == 0
        assert y3.count() == yesterday.count()


def test_empty_yesterday_then_real_today_delta(spark):
    """The quiet-day rotation composition the round-10 write_snapshot
    fix enables: day 1 produces ZERO rows (legal), day 2 is real — the
    pair read must see both partitions (the empty day's directory
    carries the schema) and the delta over (real today, empty
    yesterday) is ALL of today's rows."""
    today, _ = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        write_snapshot(today.limit(0), base, "2026-08-12")
        write_snapshot(today, base, "2026-08-13")
        t2, y2 = read_snapshot_pair(spark, base)
        assert y2.count() == 0
        assert t2.count() == today.count()
        delta = snapshot_delta(t2, y2, keys=["opportunity_id"])
        # every today row is "new" (the fixture's duplicate-ID row
        # stays duplicated — the anti-join filters by key, never dedups)
        assert delta.count() == today.count()
