"""Golden snapshot-delta fixture (FIXTURES.md §A1): the exact
insert-only semantics of the reference — updates and deletes vanish,
duplicates are preserved, N/A sentinels flow through untouched."""

from __future__ import annotations

from aiesec_guc_spark.operators.snapshot import changed_rows, snapshot_delta
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
