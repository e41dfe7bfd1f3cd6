"""Custom aggregation surfaces: the as-of join (temporal operator
Spark lacks), and a grouped-map ``applyInPandas`` UDAF — both still
oracle-checked.

The UDAF (per-user value trend slope) does all its arithmetic in
exact int64 numpy sums and only converts to double at the very end,
mirroring the oracle's exact-BIGINT sums → CAST AS DOUBLE division,
so even a pandas aggregation hash-matches DuckDB.  The cents
conversion is vectorized (np.round(v*100)) and property-tested
against the exact Decimal reference on the full 2-decimal domain.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from . import query

# ---------------------------------------------------------------------------
# As-of join: for every click, the latest error of the same user at
# or before the click time.  DuckDB has a native ASOF JOIN — the
# oracle uses it, pinning our union+window implementation to the real
# temporal-join semantics.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, ts, event_id AS err_id,
         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS err_value
  FROM events WHERE event_type = 'error'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT c.event_id AS event_id,
       c.user_id AS user_id,
       epoch_us(c.ts) AS ts_us,
       epoch_us(e.ts) AS asof_ts_us,
       e.err_id AS asof_err_id,
       e.err_value AS asof_err_value
FROM clicks c
ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.ts >= e.ts
"""


@query("asof_click_error", oracle=_ASOF_ORACLE)
def asof_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union+window (operators/asof.py): each click
    paired with the user's most recent error at ts <= click.ts.

    One shuffle on user_id; no range cross-product.  The oracle is
    DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    wr = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("err_id"),
            F.col("value").cast("decimal(18,2)").cast("double").alias("err_value"),
        )
    )
    joined = asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts",
        right_value_cols=["err_id", "err_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        F.col("asof_err_id"),
        F.col("asof_err_value"),
    )


# ---------------------------------------------------------------------------
# Grouped-map UDAF: per-user least-squares slope of event value over
# time.  Exact integer sums (x = seconds since the user's first
# event, y = value in cents), double conversion only at the final
# division — deterministic across pandas and DuckDB.
# ---------------------------------------------------------------------------

_SLOPE_ORACLE = """
WITH base AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - min(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id) AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM base GROUP BY user_id
)
SELECT user_id,
       n AS n_events,
       CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
         / NULLIF(CAST(CAST(n * sxx - sx * sx AS BIGINT) AS DOUBLE), 0)
         AS slope_cents_per_sec
FROM s
"""


def _cents_decimal(v: float) -> int:
    """Reference cents conversion: Decimal(str(v)) is the shortest
    round-trip representation — the same 2-decimal value DuckDB's
    double→DECIMAL(18,2) cast lands on for this corpus.  Kept as the
    ground truth the vectorized path is property-tested against
    (tests/test_pandas_apis.py)."""
    return int(Decimal(str(v)) * 100)


def _cents_vectorized(values: "np.ndarray") -> "np.ndarray":
    """Vectorized cents conversion: for any double whose shortest
    round-trip form has <= 2 fractional digits (i.e. the nearest
    double to k/100), v*100 lands within half a ULP of the integer k,
    so round() recovers k exactly.  Matches ``_cents_decimal`` on the
    whole 2-decimal domain — property-tested, not assumed."""
    return np.round(values * 100.0).astype(np.int64)


def _slope_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # int64 numpy throughout (the oracle's sums are BIGINT too) —
    # the earlier per-row Decimal fold gave identical answers but was
    # pure-Python row-at-a-time inside the Arrow batch, ~20× slower.
    xs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
    xs = xs - xs.min()
    ys = _cents_vectorized(pdf["value"].to_numpy(dtype="float64"))
    n = np.int64(len(xs))
    sx = xs.sum(dtype=np.int64)
    sy = ys.sum(dtype=np.int64)
    sxy = (xs * ys).sum(dtype=np.int64)
    sxx = (xs * xs).sum(dtype=np.int64)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    # float(int64)/float(int64): both casts are correctly rounded,
    # same as the oracle's CAST(BIGINT AS DOUBLE) division.
    slope = float(num) / float(den) if den != 0 else None
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [int(n)],
            "slope_cents_per_sec": [slope],
        }
    )


@query("udaf_user_trend_slope", oracle=_SLOPE_ORACLE)
def udaf_user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF (applyInPandas): per-user OLS slope with
    exact-integer accumulation.  The grouped shuffle is the only
    exchange; each group is one Arrow batch in pandas.

    The EXPLICIT hash repartition on user_id is load-bearing: the
    grouped-map's required distribution is satisfied by it (one
    exchange total, no second shuffle), and — unlike the implicit
    exchange applyInPandas would insert — AQE does not coalesce an
    explicit REPARTITION_BY_NUM.  Without it, this tiny-by-bytes
    shuffle collapses to ONE post-shuffle partition and every group
    funnels through a single Python worker (measured 4.1 s warm at
    sf0.1 vs 0.74 s with 32-way spread).  Python-side work is the
    scarce resource in a pandas UDAF, not shuffle bytes — exactly the
    case AQE's byte-based coalescing misjudges."""
    # NULL ts/value rows are non-observations for a regression —
    # filtered in BOTH engines (the pandas fold would otherwise cast
    # NaT/NaN into garbage int64s)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return ev.repartition(n_part, "user_id").groupBy("user_id").applyInPandas(
        _slope_group,
        schema="user_id long, n_events long, slope_cents_per_sec double",
    )


# ---------------------------------------------------------------------------
# As-of directions: forward (next error at/after the click) and
# nearest (closer of previous/next, ties backward).  DuckDB's native
# ASOF JOIN is backward-only, so the forward oracle runs it on NEGATED
# epoch time — greatest -e.ts <= -c.ts is exactly the smallest
# e.ts >= c.ts — and the nearest oracle composes the two.
# ---------------------------------------------------------------------------

_ASOF_FWD_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id, -epoch_us(ts) AS neg_us
  FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, ts, -epoch_us(ts) AS neg_us, event_id AS err_id,
         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS err_value
  FROM events WHERE event_type = 'error'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT c.event_id AS event_id,
       c.user_id AS user_id,
       epoch_us(c.ts) AS ts_us,
       epoch_us(e.ts) AS asof_ts_us,
       e.err_id AS asof_err_id,
       e.err_value AS asof_err_value
FROM clicks c
ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.neg_us >= e.neg_us
"""


def _asof_inputs(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    wr = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("err_id"),
            F.col("value").cast("decimal(18,2)").cast("double").alias("err_value"),
        )
    )
    return clicks, errors


def _asof_output(joined: DataFrame) -> DataFrame:
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        F.col("asof_err_id"),
        F.col("asof_err_value"),
    )


@query("asof_click_error_forward", oracle=_ASOF_FWD_ORACLE)
def asof_click_error_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click paired with the user's NEXT error at
    ts >= click.ts — the same union+window as backward, ordered
    descending.  Oracle: DuckDB backward ASOF on negated epoch time."""
    clicks, errors = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts",
        right_value_cols=["err_id", "err_value"], direction="forward",
    )
    return _asof_output(joined)


_ASOF_NEAREST_ORACLE = f"""
WITH bwd AS ({_ASOF_ORACLE}),
fwd AS ({_ASOF_FWD_ORACLE})
SELECT b.event_id, b.user_id, b.ts_us,
       CASE WHEN f.asof_ts_us IS NULL THEN b.asof_ts_us
            WHEN b.asof_ts_us IS NULL THEN f.asof_ts_us
            WHEN b.ts_us - b.asof_ts_us <= f.asof_ts_us - f.ts_us
              THEN b.asof_ts_us ELSE f.asof_ts_us END AS asof_ts_us,
       CASE WHEN f.asof_ts_us IS NULL THEN b.asof_err_id
            WHEN b.asof_ts_us IS NULL THEN f.asof_err_id
            WHEN b.ts_us - b.asof_ts_us <= f.asof_ts_us - f.ts_us
              THEN b.asof_err_id ELSE f.asof_err_id END AS asof_err_id,
       CASE WHEN f.asof_ts_us IS NULL THEN b.asof_err_value
            WHEN b.asof_ts_us IS NULL THEN f.asof_err_value
            WHEN b.ts_us - b.asof_ts_us <= f.asof_ts_us - f.ts_us
              THEN b.asof_err_value ELSE f.asof_err_value END AS asof_err_value
FROM bwd b JOIN fwd f ON b.event_id = f.event_id
"""


@query("asof_click_error_nearest", oracle=_ASOF_NEAREST_ORACLE)
def asof_click_error_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each click paired with whichever same-user error
    is closer in time (previous vs next; exact ties go backward).
    Both carries run over one union — a single exchange, two sorts."""
    clicks, errors = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts",
        right_value_cols=["err_id", "err_value"], direction="nearest",
    )
    return _asof_output(joined)


# ---------------------------------------------------------------------------
# Last-touch attribution — the as-of join applied to revenue credit.
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH purchases AS (
    SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
    FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, ts FROM events WHERE event_type = 'click'
),
att AS (
    SELECT p.user_id, p.ts, p.v, c.ts AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(*) AS n_purchases,
       CAST(SUM(CASE WHEN click_ts IS NOT NULL
                      AND ts - click_ts <= INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN click_ts IS NOT NULL
                      AND ts - click_ts <= INTERVAL 1 HOUR
                     THEN v ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS attributed_revenue,
       CAST(SUM(CASE WHEN click_ts IS NOT NULL
                      AND ts - click_ts <= INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
           AS attribution_rate
FROM att
GROUP BY 1
"""


@query("purchase_click_attribution", oracle=_ATTRIBUTION_ORACLE)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 1-hour lookback; daily totals report the
    attribution rate and the exactly-summed attributed revenue — the
    marketing-analytics capstone of the as-of join operator (the
    DuckDB oracle uses its native ASOF LEFT JOIN; the Spark side is
    operators/asof.py's union+window carry, one shuffle).

    Inclusive-at-equality semantics match on both sides (the carry
    orders the right side first at equal timestamps; ASOF's >= is
    inclusive).  Ties between same-instant clicks are harmless —
    only the click timestamp is surfaced.
    """
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("v")
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    att = asof_join(purchases, clicks, ["user_id"], "ts", [])
    within = F.col("asof_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("asof_ts") <= 3600 * 1_000_000
    )
    dec0 = F.lit(0).cast("decimal(18,2)")
    return att.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(within, 1).otherwise(0)).cast("bigint").alias("n_attributed"),
        F.sum(F.when(within, F.col("v")).otherwise(dec0))
        .cast("double")
        .alias("attributed_revenue"),
        (
            F.sum(F.when(within, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("attribution_rate"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — position-weighted credit split with
# INTEGER-exact proportional allocation (no float credit sums).
# ---------------------------------------------------------------------------

_MULTITOUCH_ORACLE = """
WITH purchases AS (
    SELECT user_id, event_id AS p_id, ts AS p_ts,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, event_id AS c_id, ts AS c_ts
    FROM events WHERE event_type = 'click'
),
touches AS (
    SELECT p.p_id, p.cents, c.c_id, c.c_ts,
           row_number() OVER (
               PARTITION BY p.p_id ORDER BY c.c_ts, c.c_id
           ) AS i,
           count(*) OVER (PARTITION BY p.p_id) AS n
    FROM purchases p
    JOIN clicks c
      ON c.user_id = p.user_id
     AND c.c_ts <= p.p_ts
     AND c.c_ts > p.p_ts - INTERVAL 1 HOUR
)
SELECT CAST(CAST(c_ts AS DATE) AS VARCHAR) AS day,
       count(*) AS n_touches,
       count(DISTINCT p_id) AS n_purchases,
       CAST(SUM(cents * i * 1000000 // (n * (n + 1) // 2)) AS DOUBLE)
           / 100000000 AS credited_dollars
FROM touches
GROUP BY 1
"""


@query("purchase_multitouch_attribution", oracle=_MULTITOUCH_ORACLE)
def purchase_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: every click in the 1-hour lookback
    shares a purchase's revenue, weighted linearly by recency rank
    (position i of n gets i/(n(n+1)/2) — later touches earn more),
    credited to the click's day.

    The determinism trick is the allocation arithmetic: per-touch
    credit is ``(cents · i · 10^6) div (n(n+1)/2)`` — all BIGINT, so
    the daily roll-up is an exact integer sum with ONE final double
    division.  A float weight (value·i/denom) would make daily totals
    depend on summation order.  Floor division under-credits each
    purchase by < n micro-cents, deterministically on both engines
    (documented, not hidden).  Headroom: cents·i·10^6 stays under
    2^63 for purchases ≤ $10 M with ≤ 9000 touches.

    Scale shape: the touch join is user-keyed equi with the lookback
    range as a probe residual (per-user fan-out bounded by activity;
    the banded interval join of operators/interval.py is the swap for
    heavy-tailed users); both position windows share one p_id sort on
    the already-joined touch frame; the daily roll-up is
    #touch-days-sized.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    touches = purchases.join(clicks, on="user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
            < 3600 * 1_000_000
        )
    )
    w = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    wn = Window.partitionBy("p_id")
    ranked = touches.select(
        "p_id",
        "cents",
        "c_ts",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy(F.to_date("c_ts").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("p_id").alias("n_purchases"),
            (
                F.sum(
                    F.expr("cents * i * 1000000 div (n * (n + 1) div 2)")
                ).cast("double")
                / 100_000_000
            ).alias("credited_dollars"),
        )
    )
