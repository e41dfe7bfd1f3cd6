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

Semantics: for each left row, the right row with the greatest
``ts <= left.ts`` (ties on ts broken by the highest ``right_order``
column).  Right side must be unique per (key, ts) for deterministic
output — pre-reduce it if not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest right values with
    right.ts <= left.ts (null when none).  Left columns are preserved;
    right value columns arrive as ``asof_<name>`` plus ``asof_ts``.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *keys,
        ts_col,
        *[F.col(c).alias(f"asof_{c}") for c in right_value_cols],
    ).withColumn("_side", F.lit(0))

    unioned = l.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts (_side 0 < 1), so a
    # same-timestamp right row is visible to the left row (<= match).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"asof_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"_carried_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        "asof_ts",
        *[F.col(f"_carried_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
