"""Batch MERGE (upsert) for plain-parquet tables — the `MERGE INTO`
a lakehouse format provides, built from the engine's own pieces for
environments that run on bare parquet directories.

Semantics: key-matched rows are REPLACED by the newest version
(update), unmatched update rows are INSERTED, unmatched target rows
are retained — i.e. classic upsert.  "Newest" is decided by
``order_col`` descending, then source (update beats target on equal
``order_col`` — the at-least-once redelivery case), then a
deterministic ``xxhash64`` over every non-key column so even two
DISTINCT rows sharing a (key, order_col) inside one updates batch
pick the same winner on every run / retry / speculative re-execution.
Same argmax contract as the CDC compaction query
(latest_event_per_user) and the streaming merge sink
(run_streaming_upsert_latest, streaming/incremental.py) — this is
their batch twin.  (Well-behaved producers emit at most one version
per (key, order_col) per batch; the hash tie-break makes the
degenerate case deterministic rather than meaningful.)

Scale shape: ONE shuffle on the merge keys over target ∪ updates
(row_number + keep rank 1); at real table sizes you partition the
target (e.g. by key range or date), prune the union to partitions the
updates touch, and merge per partition — the helper takes any path,
so partition-wise application is the same call.  The rewrite uses the
temp-sibling + two-rename swap from operators/maintenance.py: readers
never observe a half-merged table and a crash leaves the original.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .maintenance import (
    clear_table_dir,
    parquet_table_exists,
    recover_interrupted_swap,
    swap_sibling,
)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> dict:
    """Upsert ``updates`` into the parquet table at ``target_path``.

    Update rows win over target rows with the same key when their
    ``order_col`` is greater-or-equal (ties prefer the update — the
    at-least-once redelivery case).  Returns
    ``{"n_before", "n_updates", "n_after"}``.
    """
    # heal a two-rename swap that crashed between its renames — the
    # exists probe below must never mistake the crash window for a
    # fresh table (which would silently drop every pre-merge row)
    recover_interrupted_swap(target_path)
    # recursive: partitioned tables keep parquet only in subdirs — a
    # top-level listing would misclassify them as fresh and rmtree them
    exists = parquet_table_exists(target_path)
    if exists:
        target = spark.read.parquet(target_path)
        missing = set(target.columns) ^ set(updates.columns)
        if missing:
            raise ValueError(
                f"updates schema must match target; differing columns {sorted(missing)}"
            )
        n_before = target.count()
        # _src=1 for updates so equal (order_col, key) prefers the update.
        unioned = target.withColumn("_src", F.lit(0)).unionByName(
            updates.withColumn("_src", F.lit(1))
        )
    else:
        n_before = 0
        unioned = updates.withColumn("_src", F.lit(1))

    value_cols = [c for c in unioned.columns if c not in (*keys, "_src")]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(),
        F.col("_src").desc(),
        F.xxhash64(*[F.col(c) for c in value_cols]).desc(),
    )
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    if not exists:
        # creation via the same swap-sibling rename as the merge path:
        # a crash mid-initial-write must never leave a partial table
        # that the next run's exists probe treats as authoritative,
        # and a concurrent reader must never see a half-written table
        os.makedirs(os.path.dirname(target_path.rstrip("/")) or ".", exist_ok=True)
        tmp = swap_sibling(target_path, "merge")
        merged.write.mode("overwrite").parquet(tmp)
        # data-free per the recursive probe; refuses non-marker content
        clear_table_dir(target_path)
        os.rename(tmp, target_path)
        return {
            "n_before": 0,
            "n_updates": updates.count(),
            "n_after": spark.read.parquet(target_path).count(),
        }

    tmp = swap_sibling(target_path, "merge")
    old = swap_sibling(target_path, "old")
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)
    return {
        "n_before": n_before,
        "n_updates": updates.count(),
        "n_after": spark.read.parquet(target_path).count(),
    }
