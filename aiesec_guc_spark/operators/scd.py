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


def scd2_apply(
    spark,
    target_path: str,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    ts_col: str = "ts",
    applied_marker: str | None = None,
) -> dict:
    """Incrementally apply a batch of observations to an SCD2
    dimension table on plain parquet — the type-2 twin of
    ``operators.merge.merge_upsert`` (which overwrites; this one
    VERSIONS).

    Table layout: ``(key, *value_cols, valid_from, valid_to)`` with
    the half-open convention — a row covers ``[valid_from, valid_to)``
    and ``valid_to IS NULL`` marks the current version.  Each change
    row ``(key, *value_cols, ts)`` asserts "as of ts, the entity
    looked like this":

    - a change equal to the key's current version is a NO-OP (no new
      version row — re-observations don't fragment history),
    - a differing change closes the current version at ``ts`` and
      opens a new one,
    - several changes for one key in one batch chain in ts order,
    - unknown keys insert their first version.

    Preconditions (both raise, never silently corrupt history):
    duplicate ``(key, ts)`` rows in one batch are ambiguous; a change
    at-or-before the current version's ``valid_from`` would rewrite
    CLOSED history (late data belongs in a rebuild from the event
    log — scd2_user_status_history — not an incremental apply).

    Scale shape: closed versions pass through UNTOUCHED (at 100 TB,
    partition the table by ``valid_to IS NULL`` — then this job reads
    and rewrites only the open slice plus the batch).  The apply is
    one shuffle of open∪changes on the key; windows partition per
    key.  The rewrite uses the hidden-sibling two-rename swap
    (operators/maintenance.py), so readers never observe a
    half-applied table.  Applying batches b1 then b2 equals applying
    b1∪b2 at once — differential-tested in tests/test_scd2_apply.py.

    ``applied_marker``: a dot-prefixed filename dropped INSIDE the
    table directory before the rename, making "this batch was
    applied" visible atomically with the data swap — the transactional
    handshake ``run_streaming_scd2`` uses so a crash can never land
    between apply and marker (a marker written as a separate step
    afterwards would wedge recovery: the redelivered batch would trip
    the late-data guard with no marker saying it already applied).
    Spark listings skip dot-files, so the marker is invisible to
    readers.
    """
    import os
    import shutil

    from .maintenance import (
        clear_table_dir,
        parquet_table_exists,
        recover_interrupted_swap,
        swap_sibling,
    )

    # Heal a swap that crashed between its two renames BEFORE probing
    # existence: with the table renamed away and nothing renamed in,
    # the probe would take the creation path and silently reinitialize
    # the dimension from this batch alone — losing all closed history.
    recover_interrupted_swap(target_path)

    out_cols = [key, *value_cols, "valid_from", "valid_to"]

    dup = (
        changes.groupBy(key, ts_col).count().filter(F.col("count") > 1).count()
    )
    if dup:
        raise ValueError(
            f"{dup} duplicate ({key}, {ts_col}) rows in the changes batch; "
            "one observation per key-instant — pre-reduce the batch"
        )

    # recursive: partitioned tables keep parquet only in subdirs — a
    # top-level listing would misclassify them as fresh and rmtree them
    exists = parquet_table_exists(target_path)
    if exists:
        target = spark.read.parquet(target_path)
        open_rows = target.filter(F.col("valid_to").isNull())
        closed = target.filter(F.col("valid_to").isNotNull())
        late = (
            changes.join(
                open_rows.select(key, F.col("valid_from").alias("_vf")), key
            )
            .filter(F.col(ts_col) <= F.col("_vf"))
            .count()
        )
        if late:
            raise ValueError(
                f"{late} change rows at or before their key's current "
                "valid_from — incremental SCD2 cannot rewrite closed "
                "history; rebuild from the event log instead"
            )
        seed = open_rows.select(
            key, *value_cols, F.col("valid_from").alias(ts_col)
        )
    else:
        closed = None
        seed = changes.limit(0).select(key, *value_cols, ts_col)

    stream = seed.unionByName(changes.select(key, *value_cols, ts_col))
    w = Window.partitionBy(key).orderBy(ts_col)
    val = F.struct(*[F.col(c) for c in value_cols])
    # keep only rows that CHANGE the value (the first row per key and
    # every row differing from its predecessor) — no-op observations
    # and repeated values collapse away.  eqNullSafe so a NULL inside
    # value_cols compares as a value, not as unknown (a plain !=
    # would silently drop rows whose comparison is NULL).
    changed = (
        stream.withColumn("_prev", F.lag(val).over(w))
        .filter(~val.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    segments = (
        changed.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumnRenamed(ts_col, "valid_from")
        .select(*out_cols)
    )
    result = segments if closed is None else closed.select(*out_cols).unionByName(segments)

    def _mark(tmp_dir: str) -> None:
        # inside the pre-rename sibling: marker + data become visible
        # in ONE rename — no crash window between apply and marker
        if applied_marker is not None:
            open(os.path.join(tmp_dir, applied_marker), "w").close()

    if not exists:
        # same write-then-rename as the merge path: a concurrent
        # reader must never observe a half-written initial table
        os.makedirs(os.path.dirname(target_path.rstrip("/")) or ".", exist_ok=True)
        tmp = swap_sibling(target_path, "merge")
        result.write.mode("overwrite").parquet(tmp)
        _mark(tmp)
        # data-free per the recursive probe; refuses non-marker content
        clear_table_dir(target_path)
        os.rename(tmp, target_path)
    else:
        tmp = swap_sibling(target_path, "merge")
        old = swap_sibling(target_path, "old")
        result.write.mode("overwrite").parquet(tmp)
        _mark(tmp)
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old)
    final = spark.read.parquet(target_path)
    return {
        "n_versions": final.count(),
        "n_open": final.filter(F.col("valid_to").isNull()).count(),
    }
