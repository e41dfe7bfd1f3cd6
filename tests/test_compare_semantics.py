"""Unit pins for the driver-faithful comparison helpers
(tools/oracle_check.py) — pure pandas, no Spark session.

These lock in the r9 lesson: the driver's gate is dtype-sensitive and
crashes on list cells, so the local comparator must reproduce exactly
those semantics.  Each test is one failure class the old
type-insensitive comparator let through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tools.oracle_check import (
    canon,
    dtype_report,
    first_diff,
    frames_equal,
    unhashable_columns,
)


def test_int_vs_float_dtype_is_flagged():
    # the brand_pagerank class: DuckDB HUGEINT -> float64 vs Spark int64,
    # values identical integers
    a = pd.DataFrame({"r": pd.array([10**12, 2 * 10**12], dtype="int64")})
    b = pd.DataFrame({"r": pd.array([1.0e12, 2.0e12], dtype="float64")})
    problems = dtype_report(a, b)
    assert problems and "float64" in problems[0] and not problems[0].startswith("DTYPE-WARN")


def test_int_width_skew_is_flagged():
    # the text_token_counts class: Spark int32 vs DuckDB BIGINT int64
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert dtype_report(a, b)


def test_datetime_unit_skew_is_a_hard_failure():
    # the driver's frame hash is dtype-sensitive, so ns-vs-us skew
    # fails its gate even when the instants are equal; the registry
    # convention (CAST dates to VARCHAR) makes any datetime dtype a bug
    a = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[ns]")})
    b = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]")})
    problems = dtype_report(a, b)
    assert problems and all(p.startswith("DTYPE ") for p in problems)


def test_unhashable_scan_reaches_past_row_50():
    # a list cell beyond a head() sample must still be caught: rows-only
    # queries have no sort_values pass to back this check up
    df = pd.DataFrame({"s": ["x"] * 60 + [["a", "b"]]})
    assert unhashable_columns(df, "spark")


def test_list_column_is_unhashable():
    # the embedding_random_projection class: array<double> output
    df = pd.DataFrame({"proj": [np.array([1.0, 2.0]), np.array([3.0, 4.0])]})
    assert unhashable_columns(df, "spark")
    # ...and the driver's sort_values canonicalization indeed dies on it
    # (TypeError for Python-list cells, ValueError for ndarray cells)
    with pytest.raises((TypeError, ValueError)):
        canon(df)


def test_string_and_null_object_columns_are_fine():
    df = pd.DataFrame({"s": ["a", None, "b"], "x": [1, 2, 3]})
    assert unhashable_columns(df, "spark") == []


def test_frames_equal_is_order_insensitive_but_value_exact():
    a = pd.DataFrame({"k": ["b", "a"], "v": [2.5, float("nan")]})
    b = pd.DataFrame({"k": ["a", "b"], "v": [float("nan"), 2.5]})
    ca, cb = canon(a), canon(b)
    assert frames_equal(ca, cb) is None  # NaN == NaN after canon
    c = pd.DataFrame({"k": ["a", "b"], "v": [float("nan"), 2.5000001]})
    col = frames_equal(ca, canon(c))
    assert col == "v"
    i, va, vb = first_diff(ca, canon(c), col)
    assert i == 1 and va == 2.5 and vb == 2.5000001
