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


def test_flag_on_results_identical_for_consumer_queries(spark, sf_dir):
    # End-to-end hash-safety: for a sample of real shared-frame
    # consumers (the basket family joined the cache in round 10, the
    # dedup/ANN spines in round 9), the flag-ON result must be
    # row-identical to the flag-OFF result — reuse may only remove
    # repeat computation, never change a value.
    from aiesec_guc_spark.queries import spark_queries

    qs = spark_queries()
    names = [
        "basket_pair_lift",
        "basket_brand_triangles",
        "basket_brand_triangles_degree",
        "brand_pagerank",
        "dedup_connected_components",
        "similarity_ann_lsh",
        # r16b joiners: simhash fingerprints, BPE trained state, the
        # curation pipeline's survivor/CC stages
        "dedup_simhash",
        "dedup_simhash_pairs",
        "bpe_learn_merges",
        "bpe_apply_tokenize",
        "curate_training_corpus",
        # r16c joiners: the shared per-doc shingle-set frame
        "dedup_minhash_estimate_error",
        "dedup_containment_pairs",
        "dedup_incremental_index",
        "dedup_lsh_band_sweep",
    ]

    def run_all():
        return {
            n: sorted(map(tuple, qs[n](spark, sf_dir).collect())) for n in names
        }

    off = run_all()
    os.environ["SPARK_GRAFT_SHARED_FRAMES"] = "1"
    _FRAME_CACHE.clear()
    on_cold = run_all()   # builds + caches every shared frame
    on_warm = run_all()   # served from the per-JVM cache
    assert off == on_cold == on_warm
