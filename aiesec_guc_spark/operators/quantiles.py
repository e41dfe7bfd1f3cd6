"""Exact equal-frequency bucketing (ntile) WITHOUT a global
single-task sort — the offset-merge global rank.

The naive ``Window.orderBy`` with no partitionBy ships every row
through ONE window task — a driver-adjacent bottleneck at 100 TB.
This operator instead:

1. ``repartitionByRange`` on the strict total order — partitions hold
   disjoint, globally ordered key ranges; each ranks independently.
2. Per-partition ``row_number`` (window partitioned by the range
   partition id — every window task handles one partition's rows).
3. Per-partition counts are collected — O(#partitions) rows on the
   driver, scale-free — prefix-summed into offsets, and broadcast
   back; offset + local rank IS the exact global rank.
4. The standard ntile formula (first ``N mod k`` buckets get one
   extra row) maps rank → bucket, matching native ``ntile(k)``
   bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import materialize


def exact_ntile(df: DataFrame, order_cols: list[str], n_buckets: int) -> DataFrame:
    """Append an exact ``bucket`` column (1..n_buckets, native-ntile
    semantics over ``order_cols``) without any global sort.

    ``order_cols`` must be a STRICT total order (include a unique
    tie-break key) — equal keys across a partition boundary would
    otherwise make the range partitioning's split nondeterministic.
    """
    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = materialize(
        df.repartitionByRange(nparts, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(sizes.values())
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = F.broadcast(spark.createDataFrame(offsets, "_pid int, _offset long"))

    local_rank = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    )
    ranked = ranged.withColumn("_lrank", local_rank).join(off, "_pid")
    grank = F.col("_offset") + F.col("_lrank")

    q, rem = divmod(total, n_buckets)
    cut = rem * (q + 1)
    bucket = F.when(
        grank <= F.lit(cut),
        F.expr(f"CAST((_offset + _lrank + {q}) DIV {q + 1} AS INT)"),
    ).otherwise(
        F.expr(
            f"CAST({rem} + (_offset + _lrank - {cut} + {max(q, 1) - 1})"
            f" DIV {max(q, 1)} AS INT)"
        )
    )
    return ranked.withColumn("bucket", bucket).drop("_pid", "_lrank", "_offset")
