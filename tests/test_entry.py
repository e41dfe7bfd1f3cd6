"""Smoke: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"event_id", "user_id", "event_type", "value", "ts_us"} == set(df.columns)


def test_every_query_has_callable_and_registry_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
