"""Banded (bucketed) interval join — the scale-safe form of a range
join.

A naive range join (``l.ts <= r.ts <= l.ts + band``) has no equality
predicate, so Spark falls back to a per-key cross product (or, with
no key, BroadcastNestedLoopJoin) — quadratic in the hot key at scale.
The banded form quantizes time into ``band``-sized buckets: a right
row at bucket ``b`` can only match left rows in buckets ``b-1`` or
``b``, so duplicating the LEFT side into (b, b+1) turns the range
join into a pure equi-join on (key, bucket) followed by the exact
range filter.  Shuffle volume is 2·|L| + |R| — linear, skew-safe,
AQE-splittable — and the equality keys keep both sides
hash-co-partitioned.

This is the standard banded/binned range-join pattern (same shape
engines like Trino/Flink use for interval joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    band_us: int,
) -> DataFrame:
    """Pairs where ``0 <= right.ts - left.ts <= band_us`` and the key
    columns match.  Timestamps are compared in exact microseconds.
    Both inputs must already have distinct column names apart from
    ``keys``."""
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(band_us))
    l2 = left.withColumn("_bucket", F.explode(F.array(lb, lb + 1)))
    r2 = right.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(right_ts)) / F.lit(band_us))
    )
    joined = l2.join(r2, on=[*keys, "_bucket"])
    diff = F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))
    # A pair in the same bucket matches via BOTH exploded left rows
    # (b and b+1 never collide — a right row has one bucket), so no
    # dedup is needed: each qualifying pair appears exactly once.
    return joined.filter((diff >= 0) & (diff <= band_us)).drop("_bucket")
