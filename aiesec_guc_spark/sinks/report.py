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
        wb.save(xlsx)
        return xlsx
    except ImportError:
        csv = path if path.endswith(".csv") else path + ".csv"
        pdf.to_csv(csv, index=False)
        return csv


def notify_if_nonempty(
    delta: DataFrame, send: Callable[[str], None] | None = None
) -> bool:
    """The reference's guarded send: render + deliver iff the delta
    has rows; returns whether a notification went out."""
    body = render_cards_html(delta)
    if not body:
        log.info("no new opportunities found — notification skipped")
        return False
    (send or (lambda b: log.info("notification body:\n%s", b)))(body)
    return True
