"""As-of (temporal) join — an operator Spark lacks natively.

Implemented as the union+window trick, which is the scale-correct
shape: tag both sides, sort within the key partition by time, carry
the most recent right-side row forward with ``last(..., ignoreNulls)``
over an unbounded-preceding frame, keep left rows.  One shuffle on
the key — same cost as a regular window; never a range cross-product.

(The alternative — ``applyInPandas`` + ``pd.merge_asof`` per key
group — keeps per-group state in pandas; the union trick stays fully
JVM-side and is preferred.  For *range* joins, bucketize the range
key and equi-join on the bucket + filter.)

Directions (mirroring ``pd.merge_asof``):

- ``backward`` (default): greatest right ``ts <= left.ts``.
- ``forward``: smallest right ``ts >= left.ts`` — the same window
  ordered descending.
- ``nearest``: whichever of the two is closer in time; exact ties go
  backward.  Both carries run over ONE union with the same partition
  key, so Spark plans a single exchange with two sorts.

Matches at equal timestamps are inclusive in every direction (the
right row sorts before the left row at the same ts).  Right side must
be unique per (key, ts) for deterministic output — pre-reduce it if
not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIRECTIONS = ("backward", "forward", "nearest")


def _carry(unioned: DataFrame, keys, ts_col, right_value_cols, prefix, descending):
    order = [F.col(ts_col).desc() if descending else F.col(ts_col).asc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(
        f"{prefix}_ts",
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True).over(w),
    )
    for c in right_value_cols:
        out = out.withColumn(
            f"{prefix}_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"asof_{c}")), ignorenulls=True).over(w),
        )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the matching right values per
    ``direction`` (null when none).  Left columns are preserved; right
    value columns arrive as ``asof_<name>`` plus ``asof_ts``.
    """
    if direction not in DIRECTIONS:
        raise ValueError(f"direction must be one of {DIRECTIONS}, got {direction!r}")
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *keys,
        ts_col,
        *[F.col(c).alias(f"asof_{c}") for c in right_value_cols],
    ).withColumn("_side", F.lit(0))

    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction in ("backward", "forward"):
        prefix = "_c"
        carried = _carry(
            unioned, keys, ts_col, right_value_cols, prefix, direction == "forward"
        )
        return carried.filter(F.col("_side") == 1).select(
            *lcols,
            F.col(f"{prefix}_ts").alias("asof_ts"),
            *[F.col(f"{prefix}_{c}").alias(f"asof_{c}") for c in right_value_cols],
        )

    # nearest: run both carries over the same union (one exchange, two
    # sorts), then pick per row; exact ties go backward.
    both = _carry(
        _carry(unioned, keys, ts_col, right_value_cols, "_b", False),
        keys,
        ts_col,
        right_value_cols,
        "_f",
        True,
    )
    bwd_d = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_b_ts"))
    fwd_d = F.unix_micros(F.col("_f_ts")) - F.unix_micros(F.col(ts_col))
    use_bwd = F.col("_f_ts").isNull() | (F.col("_b_ts").isNotNull() & (bwd_d <= fwd_d))

    def pick(b: str, f: str):
        return F.when(use_bwd, F.col(b)).otherwise(F.col(f))

    return both.filter(F.col("_side") == 1).select(
        *lcols,
        pick("_b_ts", "_f_ts").alias("asof_ts"),
        *[pick(f"_b_{c}", f"_f_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
