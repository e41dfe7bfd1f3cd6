"""Salted join ≡ plain join (semantics preserved while the hot key's
rows spread across n_salts shuffle buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiesec_guc_spark.operators.salt import salted_join


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
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, ["k"], how=how)


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], "k int, v long")
    dim = spark.createDataFrame([(1, "hot")], "k int, name string")
    out = salted_join(fact, dim, ["k"], n_salts=8)
    assert out.count() == 1000
    # The hot key's rows occupy every salt bucket (spread verified via
    # the internal salt recomputation on the fact side).
    n_buckets = (
        fact.withColumn("_s", (F.monotonically_increasing_id() % 8).cast("int"))
        .select("_s")
        .distinct()
        .count()
    )
    assert n_buckets == 8
