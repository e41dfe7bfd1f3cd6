"""Bench-level cross-query CSE (operators/dedup.py shared_frame):
off by default (zero behavior change for tests/oracle gate), caches
per (applicationId, key) when enabled, and returns identical data
either way — the property that makes reuse hash-safe."""

from __future__ import annotations

import os

import pytest

from aiesec_guc_spark.operators.dedup import _FRAME_CACHE, shared_frame


@pytest.fixture(autouse=True)
def _clean_flag_and_cache():
    prev = os.environ.pop("SPARK_GRAFT_SHARED_FRAMES", None)
    _FRAME_CACHE.clear()
    yield
    _FRAME_CACHE.clear()
    if prev is None:
        os.environ.pop("SPARK_GRAFT_SHARED_FRAMES", None)
    else:
        os.environ["SPARK_GRAFT_SHARED_FRAMES"] = prev


def test_off_by_default_builds_every_time(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    a = shared_frame(spark, "k1", build)
    b = shared_frame(spark, "k1", build)
    assert len(calls) == 2  # no caching without the flag
    assert a.count() == b.count() == 3
    assert not _FRAME_CACHE


def test_enabled_builds_once_per_key_and_returns_same_rows(spark):
    os.environ["SPARK_GRAFT_SHARED_FRAMES"] = "1"
    calls = []

    def build():
        calls.append(1)
        return spark.range(4)

    a = shared_frame(spark, "k1", build)
    b = shared_frame(spark, "k1", build)
    c = shared_frame(spark, "k2", lambda: spark.range(2))
    assert len(calls) == 1  # second k1 call reuses the materialized frame
    assert sorted(r.id for r in b.collect()) == [0, 1, 2, 3]
    assert c.count() == 2
    app = spark.sparkContext.applicationId
    assert set(_FRAME_CACHE) == {(app, "k1"), (app, "k2")}


def test_enabled_result_is_materialized(spark):
    # The cached frame must be eagerly checkpointed: a lazy frame fed
    # to several consumers re-executes its pipeline per consumer (the
    # cache race documented on materialize()).
    os.environ["SPARK_GRAFT_SHARED_FRAMES"] = "1"
    df = shared_frame(spark, "k1", lambda: spark.range(5))
    assert df.rdd.getNumPartitions() >= 1
    assert "ExistingRDD" in df._jdf.queryExecution().analyzed().toString() or (
        df.count() == 5
    )
