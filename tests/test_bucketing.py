"""Bucketed (co-located) joins: pre-bucketing both sides on the join
key removes the shuffle entirely — the layout-level optimization a
100 TB warehouse uses for its hottest repeated joins."""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import functions as F

from aiesec_guc_spark.catalog import load_table


def _drop_table_and_location(spark, name: str) -> None:
    """DROP TABLE plus removal of the managed location: a killed prior
    test run can leave the warehouse directory behind with no catalog
    entry, and saveAsTable then fails LOCATION_ALREADY_EXISTS even
    under mode('overwrite') — the catalog drop alone can't see it."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    _drop_table_and_location(spark, "b_orders")
    _drop_table_and_location(spark, "b_customer")
    (
        o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bo, bc = spark.table("b_orders"), spark.table("b_customer")
            j = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_nationkey").agg(
                F.count(F.lit(1)).alias("n")
            )
            j.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            # Join itself is exchange-free: both scans are bucketed on
            # the key, so no hash-repartition of either key column may
            # appear anywhere in the plan.
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(o_custkey" not in plan
            assert "Exchange hashpartitioning(c_custkey" not in plan
            # And the result matches the plain join.
            plain = (
                o.join(c, o.o_custkey == c.c_custkey)
                .groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        _drop_table_and_location(spark, "b_orders")
        _drop_table_and_location(spark, "b_customer")
