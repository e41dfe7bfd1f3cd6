"""Golden snapshot-delta fixture (FIXTURES.md §A1): the exact
insert-only semantics of the reference — updates and deletes vanish,
duplicates are preserved, N/A sentinels flow through untouched."""

from __future__ import annotations

import tempfile

from aiesec_guc_spark.operators.snapshot import (
    changed_rows,
    read_snapshot_pair,
    snapshot_delta,
    write_snapshot,
)
from aiesec_guc_spark.sources.fixtures import (
    EXPECTED_DELTA_ROWS,
    snapshot_pair,
)


def test_insert_only_delta_matches_golden(spark):
    today, yesterday = snapshot_pair(spark)
    delta = snapshot_delta(today, yesterday, keys=["opportunity_id"])
    got = sorted(tuple(r) for r in delta.collect())
    assert got == sorted(EXPECTED_DELTA_ROWS)


def test_update_and_delete_are_silently_dropped(spark):
    today, yesterday = snapshot_pair(spark)
    delta = snapshot_delta(today, yesterday, keys=["opportunity_id"])
    ids = {r["opportunity_id"] for r in delta.collect()}
    assert "1338078" not in ids  # updated (39→49 applicants) — not an insert
    assert "1999" not in ids  # deleted — reference surfaces nothing


def test_left_duplicates_preserved(spark):
    today, yesterday = snapshot_pair(spark)
    # Make the dup ID new by removing it from yesterday.
    y = yesterday.filter(yesterday.opportunity_id != "3003")
    delta = snapshot_delta(today, y, keys=["opportunity_id"])
    dup_rows = [r for r in delta.collect() if r["opportunity_id"] == "3003"]
    assert len(dup_rows) == 2  # both left-side duplicates kept


def test_empty_day_rotation_golden_chain(spark):
    """The quiet-day rotation at the FIXTURE level (VERDICT r10 item 4):
    write→rotate→diff across an EMPTY day, end to end through
    write_snapshot/read_snapshot_pair on the golden tables.

    Day 1 real (yesterday frame) → day 2 quiet (zero rows) → day 3
    real (today frame) → day 4 the same listing again.  Pinned chain:

      day 2: pair = (∅, day 1)   → delta ∅ (a quiet day reports nothing)
      day 3: pair = (day 3, ∅)   → EVERYTHING is new again — including
             re-appearances like the updated 1338078, which a diff
             against the older day 1 would have silently suppressed
             (the row-based day-discovery bug this chain pins)
      day 4: pair = (day 4, day 3) → back to the golden insert-only
             delta semantics against a REAL day (here: identical
             listings, so ∅)
    """
    today, yesterday = snapshot_pair(spark)
    with tempfile.TemporaryDirectory(prefix="snaps_golden_") as base:
        write_snapshot(yesterday, base, "2026-08-12")
        write_snapshot(today.limit(0), base, "2026-08-13")

        t, y = read_snapshot_pair(spark, base)
        assert t.count() == 0 and y.count() == yesterday.count()
        assert snapshot_delta(t, y, keys=["opportunity_id"]).count() == 0

        write_snapshot(today, base, "2026-08-14")
        t, y = read_snapshot_pair(spark, base)
        assert y.count() == 0
        delta = snapshot_delta(t, y, keys=["opportunity_id"])
        ids = {r["opportunity_id"] for r in delta.collect()}
        assert delta.count() == today.count()  # everything new again
        assert "1338078" in ids  # the re-appearance is NOT suppressed
        assert "2001" in ids  # the golden insert is of course there too

        write_snapshot(today, base, "2026-08-15")
        t, y = read_snapshot_pair(spark, base)
        assert snapshot_delta(t, y, keys=["opportunity_id"]).count() == 0


def test_changed_rows_surfaces_the_update(spark):
    today, yesterday = snapshot_pair(spark)
    diff = changed_rows(
        today.dropDuplicates(["opportunity_id"]),
        yesterday.dropDuplicates(["opportunity_id"]),
        keys=["opportunity_id"],
        compare=["applicants"],
    )
    rows = {r["opportunity_id"]: r for r in diff.collect()}
    assert set(rows) == {"1338078"}
    assert rows["1338078"]["old_applicants"] == "39 applicants"
    assert rows["1338078"]["new_applicants"] == "49 applicants"
