"""Salted join — the manual skew-mitigation pattern for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles
most skew at runtime, but it only applies to sort-merge joins and
only splits *partitions*, not a single hot key's hash bucket when a
map-side aggregate or non-SMJ shape is in play.  Salting is the
explicit fallback: spray the skewed (fact) side across ``n_salts``
sub-keys and replicate the dimension side once per salt, turning one
hot hash bucket into ``n_salts`` even ones.

Semantics are identical to the plain join — every fact row still
meets exactly one replica of its matching dimension row (the one
sharing its salt) — verified by the equivalence test in
tests/test_salt.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_fact(
    fact: DataFrame,
    n_salts: int,
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Add a deterministic ``_salt`` column derived from row content.

    The salt MUST be recomputation-stable: on a real cluster a
    map-stage retry after a shuffle-fetch failure regenerates fact
    rows, and a nondeterministic salt (``monotonically_increasing_id``,
    ``rand``) can reassign rows to different salt buckets while some
    reducers already fetched the old output — silently duplicating or
    dropping joined rows.  ``xxhash64`` over ``spread_cols`` (default:
    every column) always reproduces the same salt for the same row.

    Caveat: byte-identical rows share a salt, so a hot key whose rows
    are full duplicates won't spread — include a distinguishing column
    in ``spread_cols`` (or dedup first) in that case.

    The default spread set skips map-typed columns (Spark cannot hash
    MapType); pass ``spread_cols`` explicitly to control the set.
    """
    from pyspark.sql.types import MapType

    if spread_cols is not None:
        cols = list(spread_cols)
    else:
        cols = [f.name for f in fact.schema.fields if not isinstance(f.dataType, MapType)]
        if not cols:
            raise ValueError(
                "salt_fact: no hashable columns to derive a salt from; "
                "pass spread_cols explicitly"
            )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    return fact.withColumn("_salt", salt)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``keys`` with the fact side salted.

    The fact side gets a deterministic content-derived salt (see
    :func:`salt_fact`); the dim side is exploded ``n_salts``× so every
    (key, salt) bucket finds its dimension row.  Dim replication cost
    is ``n_salts·|dim|`` — use only when |dim| is small relative to
    the hot key's row count.

    Fact-preserving equi-joins only: with ``right``/``full`` (or a
    right-side semi/anti), an unmatched dim row would surface once
    per salt replica, breaking plain-join equivalence — rejected.
    (``cross`` is rejected too: supplying join keys makes Spark run it
    as an inner equi-join anyway, so allowing it would mislead.)
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports fact-preserving equi-joins only, got how={how!r}: "
            "an unmatched dim row would be emitted once per salt replica"
        )
    f = salt_fact(fact, n_salts, spread_cols)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, on=[*keys, "_salt"], how=how).drop("_salt")
