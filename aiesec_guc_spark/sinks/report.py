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
    """Small-result edge sink: styled xlsx when openpyxl exists,
    plain CSV otherwise.  Returns the path written."""
    pdf = delta.toPandas()
    try:
        import openpyxl  # noqa: F401
        from openpyxl.styles import Font, PatternFill

        xlsx = path if path.endswith(".xlsx") else path + ".xlsx"
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
        csv = path if path.endswith(".csv") else path + ".csv"
        pdf.to_csv(csv, index=False)
        return csv


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
        pdf = pd.read_excel(path, sheet_name=sheet_name, keep_default_na=False)
    pdf = pdf.astype(str)
    return spark.createDataFrame(pdf)


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
