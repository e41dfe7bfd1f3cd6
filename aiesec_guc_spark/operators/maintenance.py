"""Table maintenance: small-file compaction — the background chore a
100 TB lake needs constantly (streaming sinks, incremental appends,
and over-parallel writes all fragment tables into files far below the
scan-efficient size, and every downstream scan then pays per-file
open/footer overhead and tiny row groups).

The reference has nothing here (its "table" is a single xlsx,
aiesec.py:185-204); this is engine-side scope that any Spark lake
deployment scripts by hand.

Design:

- ``file_stats`` is a pure-metadata walk (driver-side ``os.walk`` —
  the same listing the Spark scan itself performs; no data is read).
  On an object store this becomes one LIST call per prefix.
- ``compact_table`` rewrites the table at ``ceil(total_bytes /
  target_bytes)`` output files via ``repartition(n)`` — a full
  shuffle, deliberately: coalesce(n) would chain upstream
  parallelism to n and can skew output sizes, while a round-robin
  repartition yields near-uniform files.  For very large tables
  compact per partition-directory instead (same helper applied per
  prefix) so one job never rewrites the whole table.
- The rewrite goes to a sibling temp directory first and swaps in
  with two renames, so a reader never observes a half-written table
  and a crash mid-compaction leaves the original intact (the temp
  dir is abandoned, never the live one).  On HDFS/local the renames
  are atomic metadata ops; on S3-like stores swap via a metastore /
  table-format pointer instead (documented, not emulated here).
- Swap siblings are HIDDEN (dot-prefixed basenames).  This matters
  when the compacted path is itself a partition directory inside a
  larger table (e.g. ``base/run_date=X``): Spark's data-source file
  listing skips paths whose basename starts with ``.`` or ``_``, so
  a concurrent reader of the PARENT table never sees the in-flight
  temp or the abandoned old copy as a bogus extra partition — the
  swap stays invisible to ``base`` readers, not just to readers of
  the compacted path itself.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.formats import _check_fmt, read_table, write_table

_DATA_EXTS = {".parquet", ".orc", ".json", ".csv"}

#: Formats whose files carry their own schema — safe to compact
#: without a caller-supplied one.
_SELF_DESCRIBING = ("parquet", "orc")


def swap_sibling(path: str, tag: str) -> str:
    """A HIDDEN sibling path for the temp/old halves of a two-rename
    swap: ``parent/.name__<tag>_<hex>``.  The dot prefix keeps Spark's
    file listing from ever surfacing it — essential when ``path`` is a
    partition directory whose parent table has concurrent readers."""
    parent, name = os.path.split(path.rstrip("/"))
    return os.path.join(parent, f".{name}__{tag}_{uuid.uuid4().hex[:8]}")


def parquet_table_exists(path: str) -> bool:
    """True iff ``path`` holds parquet data ANYWHERE under it.

    The probe is recursive on purpose: a partitioned table keeps its
    .parquet files in ``col=value/`` subdirectories with none at the
    top level, and a shallow top-level listing would classify such a
    table as "not existing" — which the creation paths follow with an
    rmtree, silently replacing a real table with updates-only data."""
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def clear_table_dir(path: str) -> None:
    """Remove a directory the table-creation path is about to replace.

    Only marker/metadata content may be deleted: by the time this
    runs, ``parquet_table_exists`` has said there is no data anywhere
    under ``path``, so anything left is _SUCCESS/_committed markers or
    hidden files.  A visible non-marker file means the directory is
    NOT an abandoned table skeleton — refuse rather than destroy
    someone else's content."""
    if not os.path.isdir(path):
        return
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not (f.startswith(("_", "."))):
                raise ValueError(
                    f"refusing to clear {path!r}: contains non-table file "
                    f"{os.path.join(root, f)!r}"
                )
    shutil.rmtree(path)


def file_stats(path: str) -> dict:
    """Data-file census for a table directory: count, total bytes,
    min/max/mean file size.  Metadata only — nothing is read."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            ext = os.path.splitext(f)[1]
            if ext in _DATA_EXTS and not f.startswith(("_", ".")):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "min_bytes": 0, "max_bytes": 0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
    }


def plan_target_files(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), at least 1 — how many output files the
    compacted table should have."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    return max(1, math.ceil(total_bytes / target_bytes))


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> dict:
    """Rewrite the table at ``path`` into ~``target_bytes`` files.

    Returns {"before": stats, "after": stats, "n_target": n}.  The
    rewrite is a read → round-robin ``repartition(n)`` → write to a
    temp sibling → two-rename swap; see the module docstring for why
    each choice.  No-op (returns with after == before) when the table
    already has <= n_target files.

    CSV/JSON tables are NOT self-describing: a bare ``spark.read.csv``
    would ingest the header row as data and rewrite an all-string,
    header-less table.  Those formats therefore REQUIRE ``schema`` and
    round-trip through :func:`read_table` / :func:`write_table` (header
    + the shared timestamp pattern), so compaction is byte-faithful.
    """
    _check_fmt(fmt)
    if fmt not in _SELF_DESCRIBING and schema is None:
        raise ValueError(
            f"compacting {fmt!r} requires an explicit schema: the format is "
            "not self-describing, and re-inferring would corrupt the table "
            "(header rows as data, widened types, lost timestamps)"
        )
    recover_interrupted_swap(path)
    before = file_stats(path)
    n_target = plan_target_files(before["total_bytes"], target_bytes)
    if before["n_files"] <= n_target:
        return {"before": before, "after": before, "n_target": n_target}

    if fmt in _SELF_DESCRIBING and schema is None:
        df: DataFrame = getattr(spark.read, fmt)(path)
    else:
        df = read_table(spark, path, schema, fmt)
    tmp = swap_sibling(path, "compact")
    old = swap_sibling(path, "old")
    write_table(df.repartition(n_target), tmp, fmt)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"before": before, "after": file_stats(path), "n_target": n_target}


_SWAP_MARKERS = (
    "__compact_",
    "__merge_",
    "__old_",
    "__zorder_tmp_",
    "__zorder_old_",
)


#: The "old" half of a two-rename swap — restorable when the second
#: rename never happened (see recover_interrupted_swap).
_OLD_MARKERS = ("__old_", "__zorder_old_")


def recover_interrupted_swap(path: str) -> str | None:
    """Heal a table whose two-rename swap crashed BETWEEN the renames:
    the target was renamed away to its ``__old_`` sibling but the new
    sibling never renamed in, so the table path is missing and the
    ``__old_`` sibling is the only full copy.  Restoring it (one
    rename back) returns the table to its exact pre-swap state; the
    abandoned temp sibling is left for ``vacuum_siblings``.

    Every swap-writing operator (scd2_apply, merge_upsert,
    zorder_rewrite, compact_table callers) invokes this at entry —
    without it, the next apply's exists-probe would take the CREATION
    path and silently reinitialize the table from the current batch
    alone, losing all history.

    Returns the restored sibling path, or None if nothing needed
    healing.  No-op when the target exists (a crash after the second
    rename leaves only removable orphans).
    """
    if os.path.isdir(path.rstrip("/")):
        return None
    parent, name = os.path.split(path.rstrip("/"))
    olds = sorted(
        f
        for f in (os.listdir(parent) if os.path.isdir(parent or ".") else [])
        for m in _OLD_MARKERS
        if f.startswith((f".{name}{m}", f"{name}{m}"))
    )
    if not olds:
        return None
    if len(olds) > 1:
        raise RuntimeError(
            f"multiple __old_ siblings for missing table {path!r}: {olds} "
            "— manual inspection required (never auto-pick one)"
        )
    src = os.path.join(parent, olds[0])
    os.rename(src, path.rstrip("/"))
    return src


def vacuum_siblings(path: str, dry_run: bool = False) -> list[str]:
    """Remove orphaned swap siblings (``tbl__compact_*`` /
    ``tbl__merge_*`` / ``tbl__old_*`` / ``tbl__zorder_tmp_*`` /
    ``tbl__zorder_old_*``) left by a compaction, merge, or layout
    rewrite that crashed between write and rename.

    The swap protocol guarantees the LIVE table is never the damaged
    party — a crash abandons only temp/old siblings — so vacuuming is
    always safe on a quiesced table: nothing references these
    directories once the table path itself exists.  Safety interlock:
    when the table path is MISSING and an ``__old_`` sibling exists
    (a swap crashed between its two renames, so the sibling is the
    only full copy), this refuses to run — call
    ``recover_interrupted_swap`` first.

    Returns the removed (or, with ``dry_run``, matched) paths.
    """
    if not os.path.isdir(path.rstrip("/")):
        parent_, name_ = os.path.split(path.rstrip("/"))
        if os.path.isdir(parent_ or "."):
            stranded = [
                f
                for f in os.listdir(parent_ or ".")
                for m in _OLD_MARKERS
                if f.startswith((f".{name_}{m}", f"{name_}{m}"))
            ]
            if stranded:
                raise RuntimeError(
                    f"table {path!r} is missing and {stranded} may be its "
                    "only copy — run recover_interrupted_swap first"
                )
    parent, name = os.path.split(path.rstrip("/"))
    # both the current hidden form (.name__tag_) and the legacy
    # visible form (name__tag_) from older runs
    prefixes = [
        f"{dot}{name}{m}" for dot in ("", ".") for m in _SWAP_MARKERS
    ]
    victims = [
        os.path.join(parent, f)
        for f in os.listdir(parent or ".")
        if any(f.startswith(p) for p in prefixes)
    ]
    if not dry_run:
        for v in victims:
            shutil.rmtree(v)
    return sorted(victims)


def fs_listdir(path: str, spark=None) -> list[str] | None:
    """Sorted entry names of ``path``, or ``None`` when the listing
    backend cannot see it as a directory.

    The partition-listing seam shared by partition discovery
    (``list_partitions``) and the zero-row-write detection in
    ``snapshot.write_snapshot``.  With a ``spark`` session the listing
    goes through the Hadoop FileSystem THAT PATH RESOLVES TO — the
    same resolver Spark's writers use — so ``file://`` URIs,
    ``hdfs://``/``s3a://`` schemes, and relative paths are all seen
    exactly where Spark wrote them; this is the object-store-correct
    form and the one 100 TB callers hit.  Without a session it falls
    back to the driver-local ``os.listdir`` convention.

    ``None`` means "not visible to the listing backend" — callers MUST
    treat that as BLIND, not as "empty".  With a session, blind is
    reduced to paths whose scheme has no loadable FileSystem (e.g. a
    cloud connector missing from the classpath, which would have
    failed the write too): the resolver error degrades to ``None``
    rather than raising, because every caller already carries a safe
    blind-path branch.

    NOT a general filesystem abstraction: the compaction/atomic-swap
    machinery (``compact_table``, ``vacuum_siblings``,
    ``recover_interrupted_swap``) stays on raw local ``os`` calls BY
    DESIGN — its atomicity comes from POSIX ``rename``, which object
    stores do not offer; its documented cluster story is a different
    mechanism (see ``compact_table``), not this seam.
    """
    if spark is not None:
        try:
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(hpath) or not fs.getFileStatus(hpath).isDirectory():
                return None
            return sorted(
                st.getPath().getName() for st in fs.listStatus(hpath)
            )
        except Exception:  # noqa: BLE001 — unloadable scheme => blind
            return None
    if not os.path.isdir(path):
        return None
    return sorted(os.listdir(path))


def list_partitions(path: str, column: str, spark=None) -> list[str]:
    """Values of a single-level hive partition layout
    (``<path>/<column>=<value>``), sorted ascending; hidden/system
    entries skipped.  Pass ``spark`` to list through the Hadoop
    FileSystem the path resolves to (see ``fs_listdir``) — required
    for object-store tables; the spark-less form stays local-FS and
    is what the local compaction/retention chores use."""
    prefix = f"{column}="
    entries = fs_listdir(path, spark=spark)
    if entries is None:
        raise FileNotFoundError(path)
    return sorted(
        d[len(prefix):]
        for d in entries
        if d.startswith(prefix) and not d.startswith((".", "_"))
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    column: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    schema: "T.StructType | None" = None,
) -> dict:
    """Compact every partition directory of a hive-layout table, one
    swap per partition — the production form of compact_table: a 100 TB
    table is never rewritten in one job; each partition compacts (and
    can fail/retry) independently, and concurrent readers of the
    parent never see swap temps (hidden siblings).  Returns per-value
    results keyed by partition value."""
    results: dict[str, dict] = {}
    for value in list_partitions(path, column):
        part = os.path.join(path, f"{column}={value}")
        results[value] = compact_table(
            spark, part, target_bytes=target_bytes, fmt=fmt, schema=schema
        )
    return results


def expire_partitions(
    path: str, column: str, keep_last: int, dry_run: bool = False
) -> list[str]:
    """Retention sweep: drop all but the newest ``keep_last``
    partitions of a hive-layout table (values ordered lexically — use
    ISO dates or zero-padded ids as partition values so lexical ==
    chronological).  The lake chore behind every "keep 90 days"
    policy; deletion is per-partition directory, so a reader of a
    RETAINED partition is never disturbed.  Returns the removed (or,
    with dry_run, matched) partition values."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    values = list_partitions(path, column)
    victims = values[:-keep_last] if len(values) > keep_last else []
    if not dry_run:
        for v in victims:
            shutil.rmtree(os.path.join(path, f"{column}={v}"))
    return victims


# ---------------------------------------------------------------------------
# Z-order layout rewrite — multi-dimensional clustering for min/max
# file skipping.  A table range-partitioned on one column prunes that
# column only; interleaving the bits of two filter columns gives every
# file a tight bounding BOX in (x, y), so point/range predicates on
# EITHER column skip most files at the footer-stats level — the layout
# operation behind Delta/Iceberg OPTIMIZE ZORDER, expressed as plain
# Spark (repartitionByRange + sortWithinPartitions on the Morton key).
# ---------------------------------------------------------------------------

ZORDER_BITS = 12


def zorder_key_expr(x_col: str, y_col: str, bits: int = ZORDER_BITS) -> str:
    """Spark-SQL expression for the Morton (bit-interleaved) z-value
    of the low ``bits`` of two non-negative integer columns.  Same
    generated form as the `layout_zorder_stats` query oracle, so the
    layout the operator writes is the layout the query audits."""
    mask = (1 << bits) - 1
    x, y = f"({x_col} & {mask})", f"({y_col} & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_rewrite(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> dict:
    """Rewrite ``df`` at ``path`` as ``n_files`` parquet files
    z-order-clustered on ``(x_col, y_col)``.

    Mechanics: compute the Morton key, ``repartitionByRange`` on it
    (range partitioning = contiguous z-intervals per file → tight
    per-file (x, y) bounding boxes), ``sortWithinPartitions`` so row
    groups inside each file cluster too, then drop the key before
    writing — the layout survives in the file/row-group min/max
    stats, not as a stored column.  The write goes through the same
    hidden-sibling two-rename swap as ``compact_table`` so readers
    never see a half-written table.

    Scale: one range shuffle of the rewritten slice — the same cost
    as any compaction pass, and like ``compact_partitions`` it should
    be applied per partition-directory at 100 TB so a single job
    never rewrites the whole table.  Returns ``file_stats(path)``
    after the swap.
    """
    z = zorder_key_expr(x_col, y_col, bits)
    spark = df.sparkSession
    recover_interrupted_swap(path)
    tmp = swap_sibling(path, "zorder_tmp")
    (
        df.withColumn("_zkey", F.expr(z))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = swap_sibling(path, "zorder_old")
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return file_stats(path)
