"""The primary gate: every registered query must match its DuckDB
oracle — the same comparison the driver runs at sf0.01, executed here
at sf0.001 for speed.  Every new query added to the registry is picked
up automatically via parametrization.

Since round 10 this is DTYPE-STRICT (the permanent census VERDICT r9
item 4 asked for): the driver's comparator hashes the pandas frames
(int64 != float64 even when values are integral) and canonicalizes via
``sort_values`` (which crashes on list-valued cells), so this test now
reproduces exactly those semantics via the same helpers
tools/oracle_check.py uses:

  - no output column on EITHER engine may be object-dtype with
    non-str/bytes values (lists/arrays would crash the driver);
  - per-column pandas dtypes must match between the Spark and DuckDB
    results, datetime64 unit skew INCLUDED (r11: the driver's frame
    hash is dtype-sensitive, so ns-vs-us fails there too; the registry
    convention is VARCHAR dates, so datetime dtypes never appear);
  - values compare dtype-strictly on sort_values-canonicalized frames.

Nine rounds of "zero mismatches" from a type-INsensitive comparator
hid two driver-red rows (r9: brand_pagerank HUGEINT→float64,
embedding_random_projection array column); this test makes local green
predict driver green.
"""

from __future__ import annotations

import pytest

from aiesec_guc_spark.queries import registry
from tools.oracle_check import (
    canon,
    dtype_report,
    first_diff,
    frames_equal,
    unhashable_columns,
)

_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = _REG[name]
    spark_pd = q.fn(spark, sf_dir).toPandas()
    assert not unhashable_columns(spark_pd, "spark")
    if q.oracle is None:
        assert len(spark_pd) >= 0  # rows-only check: it ran with a stable schema
        return
    duck_pd = duck.execute(q.oracle).fetchdf()
    assert not unhashable_columns(duck_pd, "duck")
    assert len(spark_pd) == len(duck_pd), f"row count {len(spark_pd)} != {len(duck_pd)}"
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    problems = dtype_report(spark_pd, duck_pd)
    assert not problems, f"dtype census: {problems}"
    if len(spark_pd) == 0:
        return
    a, b = canon(spark_pd), canon(duck_pd)  # driver-faithful: sort_values
    col = frames_equal(a, b)
    if col is not None:
        i, va, vb = first_diff(a, b, col)
        pytest.fail(f"value diff col={col} row={i}: spark={va!r} duck={vb!r}")
