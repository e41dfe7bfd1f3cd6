"""Gaps-and-islands run collapsing — the SCD2 (slowly-changing
dimension, type 2) history builder.

A per-key ordered sequence of (order, value) observations collapses
into contiguous runs of equal value: ``row_number over (key)`` minus
``row_number over (key, value)`` is constant exactly within a run
(the classic double-row_number island id).  Every window partitions
by key (or key+value) — never a single global partition — so the
operator scales with the widest key's history, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_runs(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Collapse per-key runs of equal ``value_col`` along
    ``order_col`` into one row per run.

    ``df`` must have at most one row per (key, order) — pre-reduce
    multi-observation grains (e.g. pick the dominant daily status)
    before calling.

    Returns (key_col, value_col, valid_from, valid_to, n_steps)
    where valid_from/valid_to are the run's first/last ``order_col``
    values and n_steps its row count.
    """
    w_all = Window.partitionBy(key_col).orderBy(order_col)
    w_val = Window.partitionBy(key_col, value_col).orderBy(order_col)
    runs = df.withColumn(
        "_island", F.row_number().over(w_all) - F.row_number().over(w_val)
    )
    return (
        runs.groupBy(key_col, value_col, "_island")
        .agg(
            F.min(order_col).alias("valid_from"),
            F.max(order_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_steps"),
        )
        .drop("_island")
    )
