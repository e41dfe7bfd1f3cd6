"""Presentation sinks (reference S3/S6/S7/F8) — driver-side by
nature, fed by an already-reduced (small) DataFrame.

- ``render_cards_html``: the per-row HTML card template
  (aiesec.py:188-233) computed distributed (format-string projection),
  folded to one string driver-side.
- ``write_styled_report``: the styled-Excel report (aiesec.py:148-183)
  when openpyxl is available, CSV fallback otherwise — the styling
  predicate (premium == "Yes") is the same `when()` both ways.
- ``notify_if_nonempty``: the count-guarded send (aiesec.py:236-251)
  with the transport injected (no SMTP here; the default logs).
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

CARD_TEMPLATE = (
    '<div class="card"><h3><a href="%s">%s</a></h3>'
    "<p>%s · %s · %s</p>%s</div>"
)


EMAIL_DOC_TEMPLATE = (
    "<!DOCTYPE html>\n<html>\n<head>\n"
    '  <meta charset="UTF-8">\n'
    "  <title>{title}</title>\n"
    "</head>\n<body>\n{cards}\n</body>\n</html>"
)


def render_cards_html(delta: DataFrame) -> str:
    """Fold the delta into the notification HTML body."""
    cards = delta.select(
        F.format_string(
            CARD_TEMPLATE,
            F.col("opportunity_link"),
            F.col("title"),
            F.col("organization"),
            F.col("country"),
            F.col("duration"),
            F.when(F.col("premium") == "Yes", '<span class="badge">Premium</span>')
            .otherwise(""),
        ).alias("card")
    )
    folded = cards.agg(F.concat_ws("\n", F.collect_list("card")).alias("body"))
    return folded.collect()[0]["body"] or ""


def render_email_html(delta: DataFrame, title: str = "New Opportunities") -> str:
    """Complete email HTML document (head/charset/title wrapping the
    cards), matching the reference's full-document body
    (aiesec.py:221-233) rather than bare concatenated cards.  Returns
    "" when the delta is empty so the count guard still works."""
    cards = render_cards_html(delta)
    if not cards:
        return ""
    return EMAIL_DOC_TEMPLATE.format(title=title, cards=cards)


def write_styled_report(delta: DataFrame, path: str) -> str:
    """Small-result edge sink: styled xlsx via openpyxl when
    installed, otherwise via the vendored stdlib writer
    (``sinks/xlsxlite.py``) — REAL xlsx bytes either way, with the
    same header fill / premium highlight / autofit (aiesec.py:148-183).
    An explicit ``.csv`` path still writes CSV.  Returns the path
    written."""
    pdf = delta.toPandas()
    if path.endswith(".csv"):
        pdf.to_csv(path, index=False)
        return path
    xlsx = path if path.endswith(".xlsx") else path + ".xlsx"
    try:
        import openpyxl  # noqa: F401
        from openpyxl.styles import Font, PatternFill

        pdf.to_excel(xlsx, index=False)
        wb = openpyxl.load_workbook(xlsx)
        ws = wb.active
        header_fill = PatternFill("solid", fgColor="1F4E79")
        for cell in ws[1]:
            cell.font = Font(bold=True, color="FFFFFF")
            cell.fill = header_fill
        premium_fill = PatternFill("solid", fgColor="FFFF00")
        cols = {c.value: i for i, c in enumerate(ws[1], start=1)}
        pcol = cols.get("premium")
        if pcol:
            for row in ws.iter_rows(min_row=2):
                if row[pcol - 1].value == "Yes":
                    for cell in row:
                        cell.fill = premium_fill
        # Column autofit (aiesec.py:175-181): width = longest cell + 3.
        from openpyxl.utils import get_column_letter

        for col in ws.columns:
            max_length = 0
            col_letter = get_column_letter(col[0].column)
            for cell in col:
                if cell.value:
                    max_length = max(max_length, len(str(cell.value)))
            ws.column_dimensions[col_letter].width = max_length + 3
        wb.save(xlsx)
        return xlsx
    except ImportError:
        from . import xlsxlite

        columns = list(pdf.columns)
        rows = pdf.values.tolist()
        highlight = (
            {i for i, v in enumerate(pdf["premium"]) if v == "Yes"}
            if "premium" in pdf.columns
            else set()
        )
        return xlsxlite.write_xlsx(xlsx, columns, rows, highlight_rows=highlight)


def read_snapshot_xlsx(spark, path: str, sheet_name: str = "Sheet1") -> DataFrame:
    """Excel snapshot *source* (reference S4, aiesec.py:137): load a
    written snapshot back as a DataFrame with every column string-typed
    (the reference's all-strings schema, SURVEY.md §1.2).

    Edge-format reader by design: xlsx is a small presentation
    artifact, so a driver-side ``pd.read_excel`` → ``createDataFrame``
    is the right shape; the canonical at-scale snapshot store is the
    run_date-partitioned parquet table (operators/snapshot.py).

    Mirrors ``write_styled_report``'s fallback: a ``.csv`` path (or a
    missing openpyxl) reads via ``pd.read_csv``.  ``"N/A"`` sentinels
    are kept as literal strings (``keep_default_na=False``) so a
    write→read round-trip is lossless — unlike the reference, whose
    default pandas NA coercion silently turns them into NaN.
    """
    import pandas as pd

    if path.endswith(".csv"):
        pdf = pd.read_csv(path, dtype=str, keep_default_na=False)
    else:
        try:
            pdf = pd.read_excel(
                path, sheet_name=sheet_name, keep_default_na=False
            )
        except ImportError:  # pandas needs openpyxl for xlsx
            from . import xlsxlite

            cols, rows = xlsxlite.read_xlsx(path, sheet_name=sheet_name)
            # Empty cells must read back as "" exactly like the
            # openpyxl path (keep_default_na=False) — astype(str)
            # alone would stringify None into the literal "None" and
            # the same snapshot pair would diff by environment.
            rows = [
                tuple("" if v is None else v for v in r) for r in rows
            ]
            pdf = pd.DataFrame(rows, columns=cols)
    pdf = pdf.astype(str)
    # Explicit all-strings schema: inference reads it from the DATA,
    # so a legitimately empty snapshot (count-guarded day with no
    # delta) raised CANNOT_INFER_EMPTY_SCHEMA instead of returning the
    # header-typed empty frame.
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(str(c), T.StringType(), True) for c in pdf.columns]
    )
    return spark.createDataFrame(pdf, schema=schema)


def write_snapshot_partitioned(df: DataFrame, out_dir: str) -> DataFrame:
    """Distributed presentation snapshot: one workbook PER PARTITION,
    written by executors via ``mapInPandas`` — the scale path that
    ``write_styled_report`` (driver-side collect, presentation edge)
    deliberately doesn't take.  Writes EAGERLY (this call runs the
    job) and returns the materialized manifest (file, n_rows) as a
    small local DataFrame — O(#partitions) rows, the one acceptable
    driver-side manifest collect for a file sink.

    The row data never moves to the driver: each executor writes
    ``part-{partition_id:05d}.xlsx`` for its slice into ``out_dir``
    (local dir here; a shared filesystem on a real cluster — same
    contract as every Spark file sink).  Size the partitions with
    ``df.repartition(n)`` before calling: xlsx has a hard 1,048,576-row
    sheet cap and openpyxl memory tracks sheet size, so ~100k rows per
    partition is the practical ceiling.

    Mirrors ``write_styled_report``'s format contract: styled-header
    xlsx via openpyxl when importable in the WORKER (the format probe
    runs per-task, since workers may have different environments than
    the driver), via the vendored stdlib writer (``xlsxlite``)
    otherwise — real xlsx part files either way.  The per-row premium
    highlight is skipped on purpose — it is an O(cells) driver-format
    concern for small reports, not a bulk snapshot feature.
    """
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    schema = "file string, n_rows long"
    # Internal manifest carries the attempt-unique tmp name so the
    # driver can promote exactly the WINNING attempt's file (Spark
    # keeps one attempt's output rows; a retried/speculative loser's
    # tmp would race a shared name) — stripped before returning.
    schema_internal = schema + ", tmp string"

    def _write(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        path = os.path.join(out_dir, f"part-{pid:05d}.xlsx")
        # Tasks write to an attempt-unique .tmp name; the driver
        # promotes every part only after the WHOLE job succeeds.
        # In-place writes left a partially-failed rerun as a silent
        # mixed-generation directory: tasks that finished before the
        # failure had already overwritten their same-named parts, so
        # the reader unioned today's parts 0-2 with yesterday's
        # part 3 and nothing looked wrong.
        tmp = f"{path}.{ctx.taskAttemptId()}.tmp"
        try:
            import openpyxl
            from openpyxl.styles import Font, PatternFill

            # engine is explicit: pandas infers it from the extension
            # and ".tmp" is not a recognized one
            pdf.to_excel(tmp, index=False, engine="openpyxl")
            wb = openpyxl.load_workbook(tmp)
            ws = wb.active
            header_fill = PatternFill("solid", fgColor="1F4E79")
            for cell in ws[1]:
                cell.font = Font(bold=True, color="FFFFFF")
                cell.fill = header_fill
            wb.save(tmp)
        except ImportError:
            from . import xlsxlite

            xlsxlite.write_xlsx(tmp, list(pdf.columns), pdf.values.tolist())
        yield pd.DataFrame(
            {"file": [path], "n_rows": [len(pdf)], "tmp": [tmp]}
        )

    # Write to .tmp FIRST, promote + clean stale parts only AFTER the
    # job succeeds: deleting up front tied to a lazy manifest
    # destroyed the previous snapshot the moment the manifest was
    # BUILT, with nothing replacing it until (unless) the caller ran
    # an action, and in-place overwrites left a partially-failed
    # rerun as a mixed-generation directory (see _write).  With
    # tmp-then-promote, a failed job leaves only dead .tmp files
    # beside the intact previous snapshot (read_snapshot_dir matches
    # .xlsx/.csv only), and a successful one atomically-per-file
    # renames every new part before removing the leftovers (a wider
    # previous run's extra parts, which read_snapshot_dir would
    # otherwise silently union with today's rows — same
    # REPLACE-on-rerun contract as write_snapshot's partition
    # overwrite).
    manifest = df.mapInPandas(_write, schema=schema_internal).collect()
    for r in manifest:
        os.replace(r.tmp, r.file)
    written = {os.path.basename(r.file) for r in manifest}
    for stale in os.listdir(out_dir):
        full = os.path.join(out_dir, stale)
        if stale.endswith(".tmp") and stale.startswith("part-"):
            os.remove(full)  # losers/orphans from failed attempts
        elif (
            stale.startswith("part-")
            and stale.endswith((".xlsx", ".csv"))
            and stale not in written
        ):
            os.remove(full)
    return df.sparkSession.createDataFrame(
        [(r.file, r.n_rows) for r in manifest], schema=schema
    )


def read_snapshot_dir(spark, path: str) -> DataFrame:
    """Read a ``write_snapshot_partitioned`` directory back,
    distributed: the file list parallelizes across executors and each
    file is parsed worker-side with pandas — no driver-side row
    funnel.  Handles both part formats (.xlsx/.csv); all columns come
    back string-typed (the reference's all-strings schema, same
    contract as ``read_snapshot_xlsx``), with "N/A" sentinels kept as
    literal strings."""
    import pandas as pd

    def _read_one(f: str) -> "pd.DataFrame":
        if f.endswith(".csv"):
            return pd.read_csv(f, dtype=str, keep_default_na=False)
        try:
            return pd.read_excel(f, keep_default_na=False).astype(str)
        except ImportError:  # pandas needs openpyxl for xlsx
            from . import xlsxlite

            cols, rows = xlsxlite.read_xlsx(f)
            # "" for empty cells, matching the openpyxl path (see
            # read_snapshot_xlsx) — never the stringified "None"
            rows = [
                tuple("" if v is None else v for v in r) for r in rows
            ]
            return pd.DataFrame(rows, columns=cols).astype(str)

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".xlsx", ".csv"))
    )
    if not files:
        raise FileNotFoundError(f"no .xlsx/.csv part files under {path}")
    # Columns from one file's header row (driver reads ONE header, not
    # the data); every part file shares the writer's schema.
    if files[0].endswith(".csv"):
        cols = list(pd.read_csv(files[0], dtype=str, nrows=0).columns)
    else:
        try:
            cols = list(pd.read_excel(files[0], nrows=0).columns)
        except ImportError:
            from . import xlsxlite

            cols, _ = xlsxlite.read_xlsx(files[0])
    schema = ", ".join(f"`{c}` string" for c in cols)

    def _read(batches):
        for pdf in batches:
            for f in pdf["file"]:
                yield _read_one(f)[cols]

    flist = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), 32)
    )
    return flist.mapInPandas(_read, schema=schema)


def notify_if_nonempty(
    delta: DataFrame,
    send: Callable[[str], None] | None = None,
    renderer: Callable[[DataFrame], str] | None = None,
) -> bool:
    """The reference's guarded send: render + deliver iff the delta
    has rows; returns whether a notification went out.  ``renderer``
    defaults to the bare card list; pass ``render_email_html`` for the
    reference's full-document email body."""
    body = (renderer or render_cards_html)(delta)
    if not body:
        log.info("no new opportunities found — notification skipped")
        return False
    (send or (lambda b: log.info("notification body:\n%s", b)))(body)
    return True
