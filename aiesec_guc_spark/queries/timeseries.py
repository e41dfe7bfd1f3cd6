"""Time-series operators: hourly gap-fill with forward-fill carry —
the hypertable-style resample/interpolate surface a metrics user
expects from an analytics engine (SURVEY.md §2.5/§2.7 name only the
windowed aggregates; the reference has nothing here).

Scale notes (100 TB): the fact-side work is ONE grouped aggregation
(hour, event_type) with map-side combine — the spine (hours × types)
is tiny and derived from a 1-row bounds aggregate, so the left join
that materializes the gaps broadcasts the spine-side nothing-burger
against the already-aggregated hourly frame.  The forward-fill window
partitions by series key; with years-long series per key, swap to the
banded carry used by operators/asof.py (coarse time bands + per-band
carry of the last value) so no single task owns a whole series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_GAPFILL_ORACLE = """
WITH bounds AS (
    SELECT date_trunc('hour', min(ts)) AS mn,
           date_trunc('hour', max(ts)) AS mx
    FROM events
),
hours AS (
    SELECT unnest(range(mn, mx + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS hr
    FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
    SELECT date_trunc('hour', ts) AS hr,
           event_type,
           count(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS sv
    FROM events
    GROUP BY 1, 2
)
SELECT t.event_type,
       epoch_us(h.hr) AS hour_us,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       CAST(a.sv AS DOUBLE) AS total_value,
       CAST(last_value(a.sv IGNORE NULLS) OVER (
            PARTITION BY t.event_type ORDER BY h.hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS filled_value,
       CAST(CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM hours h
CROSS JOIN types t
LEFT JOIN hourly a ON a.hr = h.hr AND a.event_type = t.event_type
"""


@query("events_gapfill_hourly", oracle=_GAPFILL_ORACLE)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap-fill + forward-fill (locf): a dense
    hour × event_type spine left-joins the hourly aggregate; missing
    hours surface with n_events=0 and carry the last observed hourly
    value forward (``F.last(ignorenulls=True)``).

    The only fact-sized shuffle is the grouped hourly aggregate; the
    spine is sequence()-generated from a 1-row min/max bounds frame
    crossed with the distinct type set (both broadcast-sized by
    construction — hours × types, never rows).  Sums go through
    decimal so the carried value hash-matches DuckDB bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(types)  # |hours| × |types| — deliberately tiny
    carry = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hourly, ["hr", "event_type"], "left")
        .select(
            "event_type",
            F.unix_micros(F.col("hr")).alias("hour_us"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("sv").cast("double").alias("total_value"),
            F.last(F.col("sv"), ignorenulls=True)
            .over(carry)
            .cast("double")
            .alias("filled_value"),
            F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0))
            .cast("int")
            .alias("is_gap"),
        )
    )
