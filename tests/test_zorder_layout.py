"""Z-order layout rewrite (operators/maintenance.zorder_rewrite):
the clustering must be VISIBLE in parquet footer min/max stats —
files a predicate can't overlap are skippable on both interleaved
columns, which a single-column sort can only deliver for one.

The assertion reads the actual parquet footers (pyarrow), i.e. the
same statistics Spark's scan uses for row-group skipping — not a
proxy.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aiesec_guc_spark.operators.maintenance import zorder_rewrite

N = 64          # x and y each range over 0..N-1 (grid of N*N rows)
N_FILES = 16


def _overlapping_files(path: str, col: str, lo: int, hi: int) -> int:
    """#files whose footer [min, max] for ``col`` overlaps [lo, hi] —
    the files a stats-based scan planner must read."""
    hits = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cmeta = md.row_group(rg).column(ci)
                if cmeta.path_in_schema == col:
                    st = cmeta.statistics
                    fmin = st.min if fmin is None else min(fmin, st.min)
                    fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:
            pytest.fail(f"no stats for {col} in {name}")
        if fmax >= lo and fmin <= hi:
            hits += 1
    return hits


def test_zorder_rewrite_prunes_both_dimensions(spark, tmp_path):
    grid = (
        spark.range(N * N)
        .select(
            (F.col("id") % N).cast("long").alias("x"),
            (F.col("id") / N).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )

    # Baseline: single-column range layout (the "sorted by time" table).
    linear = str(tmp_path / "linear")
    grid.repartitionByRange(N_FILES, "y").sortWithinPartitions(
        "y"
    ).write.parquet(linear)

    zpath = str(tmp_path / "zorder")
    stats = zorder_rewrite(grid, zpath, "x", "y", n_files=N_FILES)
    assert stats["n_files"] >= N_FILES // 2  # range partitioner may merge a few

    # Row fidelity: the rewrite is a layout change only.
    back = spark.read.parquet(zpath)
    assert back.count() == N * N
    assert back.agg(F.sum("payload")).first()[0] == (N * N) * (N * N - 1) // 2

    # A narrow x-range predicate: the y-sorted layout cannot prune x at
    # all (every file spans all x), the z-ordered one must skip most.
    lo, hi = 8, 11
    linear_hits_x = _overlapping_files(linear, "x", lo, hi)
    z_hits_x = _overlapping_files(zpath, "x", lo, hi)
    assert linear_hits_x == len(
        [f for f in os.listdir(linear) if f.endswith(".parquet")]
    )
    assert z_hits_x <= linear_hits_x // 2

    # And the z-layout still prunes y (the dimension the baseline owns).
    z_hits_y = _overlapping_files(zpath, "y", lo, hi)
    n_z_files = len([f for f in os.listdir(zpath) if f.endswith(".parquet")])
    assert z_hits_y < n_z_files


def test_zorder_rewrite_swap_is_atomic_style(spark, tmp_path):
    # Rewriting over an existing path must leave no hidden siblings
    # behind and must not double-count rows.
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 17).alias("y")
    )
    path = str(tmp_path / "t")
    df.write.parquet(path)
    zorder_rewrite(spark.read.parquet(path), path, "x", "y", n_files=4)
    assert spark.read.parquet(path).count() == 1000
    parent = os.path.dirname(path)
    leftovers = [p for p in os.listdir(parent) if p.startswith(".t__")]
    assert leftovers == []
