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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``keys`` with the fact side salted.

    The fact side gets a deterministic per-row salt (hash of the whole
    row's key + a spread column would be ideal; a cheap uniform spray
    via ``monotonically_increasing_id`` works identically for join
    correctness); the dim side is exploded ``n_salts``× so every
    (key, salt) bucket finds its dimension row.  Dim replication cost
    is ``n_salts·|dim|`` — use only when |dim| is small relative to
    the hot key's row count.

    Fact-preserving joins only: with ``right``/``full`` (or a
    right-side semi/anti), an unmatched dim row would surface once
    per salt replica, breaking plain-join equivalence — rejected.
    """
    if how not in ("inner", "left", "left_outer", "cross"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got how={how!r}: "
            "an unmatched dim row would be emitted once per salt replica"
        )
    salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, on=[*keys, "_salt"], how=how).drop("_salt")
