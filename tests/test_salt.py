"""Salted join ≡ plain join (semantics preserved while the hot key's
rows spread across n_salts shuffle buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiesec_guc_spark.operators.salt import salt_fact, salted_join


def test_salted_join_equivalent_to_plain(spark):
    # Heavily skewed fact: 900 of 1000 rows share key 1.
    fact = spark.createDataFrame(
        [(1 if i < 900 else i % 50, i) for i in range(1000)], "k int, v long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(50)], "k int, name string")

    plain = fact.join(dim, on="k").select("k", "v", "name")
    salted = salted_join(fact, dim, ["k"], n_salts=8).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_dim_preserving_joins(spark):
    import pytest

    fact = spark.createDataFrame([(1, 1)], "k int, v long")
    dim = spark.createDataFrame([(1, "d")], "k int, name string")
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, ["k"], how=how)


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], "k int, v long")
    dim = spark.createDataFrame([(1, "hot")], "k int, name string")
    out = salted_join(fact, dim, ["k"], n_salts=8)
    assert out.count() == 1000
    # Assert on the ACTUAL join input: the hot key's rows span every
    # salt bucket in the salted fact frame salted_join consumes.
    salted = salt_fact(fact, 8)
    per_bucket = {
        r["_salt"]: r["n"]
        for r in salted.filter(F.col("k") == 1)
        .groupBy("_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(per_bucket) == 8
    # Roughly uniform: no bucket hoards the hot key.
    assert max(per_bucket.values()) < 1000 / 2


def test_salt_is_deterministic_across_recomputation(spark):
    # The salt must be a pure function of row content — recomputing
    # the same frame yields identical (row, salt) assignments.
    fact = spark.createDataFrame([(i % 7, i) for i in range(500)], "k int, v long")
    a = {(r["k"], r["v"]): r["_salt"] for r in salt_fact(fact, 8).collect()}
    b = {(r["k"], r["v"]): r["_salt"] for r in salt_fact(fact, 8).collect()}
    assert a == b


def test_salt_default_spread_skips_map_columns(spark):
    # MapType cannot be hashed by xxhash64 — the default spread set
    # must skip it rather than fail analysis.
    fact = spark.createDataFrame(
        [(1, 10, {"a": "b"})], "k int, v long, props map<string,string>"
    )
    dim = spark.createDataFrame([(1, "d")], "k int, name string")
    out = salted_join(fact, dim, ["k"], n_salts=4)
    assert out.count() == 1
