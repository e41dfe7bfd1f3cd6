"""Every registered query must run (not crash) on an EMPTY corpus.

At 100 TB an empty input is routine — a holiday's events partition, a
crawl batch with zero survivors, a fresh table before first ingest —
and an engine whose queries throw on it wedges the whole scheduled
pipeline.  This sweep caught two real ANSI-mode traps: descending
``sequence()`` in the shingle generators (fixed in operators/dedup.py)
and a plan-time constant-folded DIVIDE_BY_ZERO in revenue_gini's
driver-literal (n+1)/n term.

Queries are allowed to return zero rows or one row of NULLs (the
DuckDB aggregate-over-empty convention) — just never raise.
"""

from __future__ import annotations

import pytest

from aiesec_guc_spark.catalog import load_table
from aiesec_guc_spark.queries import registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.fixture(scope="session")
def one_row_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """One row per table (lowest primary key).  Referential integrity
    across tables is deliberately broken (joins go empty) and every
    per-group statistic is a singleton — the corpus that evaluates the
    n−1 / zero-total / single-parity denominators the empty corpus
    never reaches (this sweep caught three ANSI DIVIDE_BY_ZEROs:
    sample variance at n=1, a ppm share with zero candidate pairs, a
    drift window with one parity)."""
    out = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        full = load_table(spark, sf_dir, t)
        full.orderBy(full.columns[0]).limit(1).write.parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    q = registry()[name]
    rows = q.fn(spark, empty_sf_dir).limit(5).collect()
    assert isinstance(rows, list)  # any row count is fine; no raise is the bar


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_one_row_corpus(spark, one_row_sf_dir, name):
    q = registry()[name]
    rows = q.fn(spark, one_row_sf_dir).limit(5).collect()
    assert isinstance(rows, list)


@pytest.fixture(scope="session")
def null_row_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """Three real rows plus one row per table with every non-key
    column NULL — failed fetches, missing blobs, half-written records.
    This sweep caught NULL-payload crashes in all three stub-decode
    mapInPandas ops, NaT/NaN garbage casts in the slope UDAF, and a
    zero z-stat denominator in ab_test_proportions."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        full = load_table(spark, sf_dir, t)
        head = full.orderBy(full.columns[0]).limit(3)
        pk = full.columns[0]
        types = dict(full.dtypes)
        nulled = head.limit(1).select(
            *[
                F.col(c) if c == pk else F.lit(None).cast(types[c]).alias(c)
                for c in full.columns
            ]
        ).withColumn(pk, F.col(pk) + 1000000)
        head.unionByName(nulled).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_null_rows(spark, null_row_sf_dir, name):
    q = registry()[name]
    rows = q.fn(spark, null_row_sf_dir).limit(5).collect()
    assert isinstance(rows, list)
