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


def test_file_uri_path_is_seen_not_clobbered(spark):
    """ADVICE r11 (medium), strengthened: a ``file://`` URI — a path
    the raw local ``os.listdir`` cannot see as a literal directory —
    is SEEN by the session-backed Hadoop listing, so the zero-row
    detection works through the same resolver the write used:
    non-empty days keep their rows and a rerun-to-empty replaces the
    stale day via the normal listing diff, no blind fallback."""
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        uri = f"file://{base}"
        write_snapshot(yesterday, uri, "2026-08-12")
        write_snapshot(today, uri, "2026-08-13")
        t2, y2 = read_snapshot_pair(spark, base)  # plain path: same dir
        assert t2.count() == today.count()  # NOT clobbered to empty
        assert y2.count() == yesterday.count()
        # quiet-day rerun through the URI replaces the stale day
        write_snapshot(today.limit(0), uri, "2026-08-13")
        t3, y3 = read_snapshot_pair(spark, base)
        assert t3.count() == 0
        assert y3.count() == yesterday.count()


def test_truly_blind_listing_never_overwrites_fresh_rows(spark, monkeypatch):
    """When even the Hadoop-backed listing cannot see the path (scheme
    with no loadable FileSystem — simulated by forcing the seam to
    return None), write_snapshot must not conclude "zero rows written"
    and clobber the freshly written partition; the df-based fallback
    decides instead.  A rerun-to-empty on the same blind path still
    lands the schema-bearing empty day."""
    from aiesec_guc_spark.operators import maintenance

    today, yesterday = snapshot_pair(spark)
    real = maintenance.fs_listdir
    with tempfile.TemporaryDirectory(prefix="snaps_") as base:
        write_snapshot(yesterday, base, "2026-08-12")
        monkeypatch.setattr(
            maintenance, "fs_listdir", lambda path, spark=None: None
        )
        write_snapshot(today, base, "2026-08-13")  # blind, non-empty
        monkeypatch.setattr(maintenance, "fs_listdir", real)
        t2, y2 = read_snapshot_pair(spark, base)
        assert t2.count() == today.count()  # NOT clobbered to empty
        assert y2.count() == yesterday.count()
        monkeypatch.setattr(
            maintenance, "fs_listdir", lambda path, spark=None: None
        )
        write_snapshot(today.limit(0), base, "2026-08-13")  # blind, empty
        monkeypatch.setattr(maintenance, "fs_listdir", real)
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
