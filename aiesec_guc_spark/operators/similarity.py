"""Vector similarity primitives.

Two implementations of the dot product:

- ``hof_dot``: generic ``aggregate(zip_with(...))`` — works for any
  dimension, but the fold is interpreted per element (no codegen), so
  per-pair cost is high.
- ``unrolled_dot``: statically-unrolled sum for a known dimension —
  the whole expression compiles into whole-stage codegen (~10-100×
  faster in all-pairs workloads).

Both produce bit-identical doubles: the unrolled sum is left-
associative (t1 + t2 + ... + tn), the fold computes 0.0 + t1 + ...
+ tn, and ``0.0 + x == x`` for every double except the sign of -0.0.
The DuckDB oracle's ``list_sum(list_transform(...))`` folds the same
way, so all three agree.

``plane_weight`` reproduces in Python the md5-derived pseudo-random
hyperplane components the oracle computes in SQL, so LSH plane dots
can be constant-folded into codegen instead of hashing per row.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64  # the corpus's embedding width (FIXTURES.md §B)


def hof_dot(a: Column, b: Column) -> Column:
    """Generic higher-order-function dot product (any dimension)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def unrolled_dot(a: Column, b: Column, dim: int = EMBEDDING_DIM) -> Column:
    """Codegen-friendly dot product for a statically-known dimension."""
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    ]
    return reduce(lambda acc, t: acc + t, terms)


def unrolled_weighted_sum(a: Column, weights: list[float]) -> Column:
    """dot(a, literal weight vector) — fully constant-folded."""
    terms = [
        F.element_at(a, i).cast("double") * F.lit(w)
        for i, w in enumerate(weights, start=1)
    ]
    return reduce(lambda acc, t: acc + t, terms)


def cosine(a: Column, b: Column, dim: int = EMBEDDING_DIM) -> Column:
    return unrolled_dot(a, b, dim) / (
        F.sqrt(unrolled_dot(a, a, dim)) * F.sqrt(unrolled_dot(b, b, dim))
    )


def plane_weight(plane: int, dim_index: int) -> float:
    """Python twin of the oracle's md5-derived plane component:
    (('0x'||substr(md5('plane{p}_{i}'),1,8))::BIGINT % 2001 - 1000) / 1000.0
    """
    h = int(hashlib.md5(f"plane{plane}_{dim_index}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def plane_weights(plane: int, dim: int = EMBEDDING_DIM) -> list[float]:
    return [plane_weight(plane, i) for i in range(dim)]
