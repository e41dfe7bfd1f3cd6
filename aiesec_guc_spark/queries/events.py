"""Event-table queries: snapshot delta (reference parity J1/E2),
change detection (E8), tumbling windows (E7), sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.snapshot import changed_rows, day_snapshots, snapshot_delta
from . import query

#: Session gap threshold shared by every sessionizing query: a new
#: session starts after >30 min of inactivity, compared in exact
#: microseconds (``ts.cast('long')`` would truncate sub-second
#: precision and could classify a gap within ~1 s of the boundary
#: differently from the oracles' INTERVAL comparison).
_SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_flags(ev: DataFrame) -> DataFrame:
    """Add ``new_session`` (1 at each >30-min gap, else 0) over one
    user-keyed shuffle.  Tie-break on (ts, event_id) so same-timestamp
    events order identically in both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return ev.withColumn(
        "new_session",
        F.when(gap <= _SESSION_GAP_US, F.lit(0)).otherwise(F.lit(1)),
    )


def _sessionize(ev: DataFrame) -> DataFrame:
    """The shared 30-min-gap sessionizer: ``new_session`` plus
    ``session_id`` (the per-user running count).  Both windows order
    by (ts, event_id) and partition by user, so they reuse a single
    user-keyed sort — the one shuffle every sessionized query pays."""
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return _session_flags(ev).withColumn(
        "session_id", F.sum("new_session").over(wrun)
    )

# ---------------------------------------------------------------------------
# Flagship: the reference's one analytics query (aiesec.py:137-145)
# re-expressed on the events table — today's rows whose key (user_id)
# was absent from yesterday's snapshot.  Insert-only, duplicates kept.
# ---------------------------------------------------------------------------

_DELTA_EVENTS_ORACLE = """
WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
today AS (
  SELECT e.* FROM events e, maxd WHERE CAST(e.ts AS DATE) = maxd.d
),
yest_users AS (
  SELECT DISTINCT user_id FROM events e, maxd
  WHERE CAST(e.ts AS DATE) = maxd.d - 1
)
SELECT t.event_id  AS event_id,
       t.user_id   AS user_id,
       t.event_type AS event_type,
       CAST(CAST(t.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
       epoch_us(t.ts) AS ts_us
FROM today t
ANTI JOIN yest_users y ON t.user_id = y.user_id
"""


@query("snapshot_delta_events", oracle=_DELTA_EVENTS_ORACLE)
def snapshot_delta_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/E2 parity: today's event rows for users not seen yesterday.

    Left-anti join on the snapshot key — Catalyst broadcasts the
    pruned yesterday key set (BroadcastHashJoin LeftAnti), the exact
    hash-set probe of the reference's ``isin`` (aiesec.py:143).
    """
    today, yesterday = day_snapshots(load_table(spark, sf_dir, "events"))
    delta = snapshot_delta(today, yesterday, keys=["user_id"])
    return delta.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("value"),
        F.unix_micros("ts").alias("ts_us"),
    )


_DELTA_USERS_ORACLE = """
WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
today AS (
  SELECT e.* FROM events e, maxd WHERE CAST(e.ts AS DATE) = maxd.d
),
yest_users AS (
  SELECT DISTINCT user_id FROM events e, maxd
  WHERE CAST(e.ts AS DATE) = maxd.d - 1
)
SELECT t.user_id AS user_id,
       count(*)  AS n_events,
       CAST(SUM(CAST(t.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       epoch_us(min(t.ts)) AS first_ts_us
FROM today t
ANTI JOIN yest_users y ON t.user_id = y.user_id
GROUP BY t.user_id
"""


@query("snapshot_delta_users", oracle=_DELTA_USERS_ORACLE)
def snapshot_delta_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped flagship: per new-today user, activity summary.

    Same anti-join core as ``snapshot_delta_events`` plus a map-side
    combinable aggregation (sum over exact decimals).
    """
    today, yesterday = day_snapshots(load_table(spark, sf_dir, "events"))
    delta = snapshot_delta(today, yesterday, keys=["user_id"])
    return delta.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
    )


# ---------------------------------------------------------------------------
# E8 — change detection with attribute diff: the thing the reference
# silently misses (same key, changed value between snapshots).
# ---------------------------------------------------------------------------

_CHANGED_ORACLE = """
WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
ranked AS (
  SELECT e.user_id, e.event_type, e.value, e.ts,
         CAST(e.ts AS DATE) = maxd.d AS is_today,
         row_number() OVER (
           PARTITION BY e.user_id, CAST(e.ts AS DATE)
           ORDER BY e.ts DESC, e.event_id DESC
         ) AS rn
  FROM events e, maxd
  WHERE CAST(e.ts AS DATE) IN (maxd.d, maxd.d - 1)
),
today AS (SELECT * FROM ranked WHERE is_today AND rn = 1),
yest  AS (SELECT * FROM ranked WHERE NOT is_today AND rn = 1)
SELECT t.user_id AS user_id,
       y.event_type AS old_event_type,
       t.event_type AS new_event_type,
       CAST(CAST(y.value AS DECIMAL(18,2)) AS DOUBLE) AS old_value,
       CAST(CAST(t.value AS DECIMAL(18,2)) AS DOUBLE) AS new_value
FROM today t JOIN yest y ON t.user_id = y.user_id
WHERE t.event_type IS DISTINCT FROM y.event_type
   OR t.value IS DISTINCT FROM y.value
"""


@query("snapshot_changed_users", oracle=_CHANGED_ORACLE)
def snapshot_changed_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: users present in both snapshots whose latest event differs.

    Each snapshot is reduced to one row per key (latest event,
    deterministic tie-break on event_id) with a window, then the
    generic ``changed_rows`` operator inner-joins and diffs null-safely.
    """
    today, yesterday = day_snapshots(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "event_type",
                F.col("value").cast("decimal(18,2)").cast("double").alias("value"),
            )
        )

    diff = changed_rows(
        latest(today), latest(yesterday), keys=["user_id"], compare=["event_type", "value"]
    )
    return diff.select(
        "user_id", "old_event_type", "new_event_type", "old_value", "new_value"
    )


# ---------------------------------------------------------------------------
# E7 — tumbling-window aggregation (batch form of the streaming window).
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       event_type,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("events_hourly_tumbling", oracle=_HOURLY_ORACLE)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: 1-hour tumbling window × event_type aggregate.

    Batch equivalent of ``groupBy(window(ts, '1 hour'))`` — expressed
    with date_trunc so the window start is a plain column (and the
    oracle is exact).  Partial aggregation (map-side combine) applies;
    the only shuffle is on (hour, event_type).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Sessionization — gap-based sessions via lag + running sum (a classic
# large-scale pattern; one shuffle on user_id, everything else within
# the window).
# ---------------------------------------------------------------------------

_SESSIONS_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM gaps
)
SELECT user_id,
       CAST(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM sessions
GROUP BY user_id
"""


@query("events_sessionize", oracle=_SESSIONS_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): sessions and events per user.

    lag(ts) over (user_id, ts) marks session starts; a running sum
    assigns session ids.  Single hash-partition shuffle on user_id —
    both window functions share it.

    The gap is computed in microseconds (``unix_micros``), not
    seconds: ``ts.cast('long')`` truncates sub-second precision, so a
    gap within ~1 s of the 1800 s boundary could classify differently
    from the oracle's exact INTERVAL comparison.
    """
    sessions = _sessionize(load_table(spark, sf_dir, "events"))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Sliding windows — 1-hour windows every 15 minutes (each event lands
# in 4 overlapping windows).  F.window works identically in batch and
# streaming; the oracle replicates each event into its 4 windows via
# the epoch-aligned slide grid.
# ---------------------------------------------------------------------------

_SLIDE_US = 15 * 60 * 1_000_000

_SLIDING_ORACLE = f"""
WITH w AS (
  SELECT event_type,
         CAST(value AS DECIMAL(18,2)) AS val,
         (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} - i * {_SLIDE_US} AS win_start_us
  FROM events, unnest(generate_series(0, 3)) AS t(i)
)
SELECT win_start_us, event_type,
       count(*) AS n_events,
       CAST(SUM(val) AS DOUBLE) AS total_value
FROM w GROUP BY 1, 2
"""


@query("events_sliding_windows", oracle=_SLIDING_ORACLE)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1 h windows sliding every 15 min.

    Spark expands each event into its window/slide overlapping
    windows map-side (a 4× row fan-out before the shuffle — the
    inherent cost of sliding windows; the shuffle still carries only
    group keys after partial aggregation).  Windows are epoch-aligned,
    which is what lets the oracle recompute the grid exactly."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "1 hour", "15 minutes"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"),
        "event_type",
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# Range (interval) join — click → purchase within 5 minutes, banded
# into an equi-join so no per-user cross product exists at scale
# (operators/interval.py).
# ---------------------------------------------------------------------------

_CLICK_PURCHASE_ORACLE = """
SELECT c.user_id   AS user_id,
       c.event_id  AS click_id,
       p.event_id  AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS latency_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND epoch_us(p.ts) - epoch_us(c.ts) <= 300000000
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


@query("events_click_purchase_window", oracle=_CLICK_PURCHASE_ORACLE)
def events_click_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 5 min after a click by the same
    user.  The oracle states the naive range join; the Spark plan is
    the banded equi-join (quantized time buckets, left side duplicated
    into two buckets) — linear shuffle instead of a per-user cross
    product, identical semantics."""
    from ..operators.interval import banded_interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = banded_interval_join(
        clicks, purchases, ["user_id"], "click_ts", "purchase_ts", 300_000_000
    )
    return j.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("latency_us"),
    )


# ---------------------------------------------------------------------------
# Sequential funnel — view → click → purchase in strict time order:
# per-user min-timestamp chaining (three conditional aggregates, one
# shuffle), then stage counts.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH f AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'view' THEN e.ts END) AS t1
  FROM events e GROUP BY e.user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE e.event_type = 'click' AND e.ts > f.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM f WHERE t1 IS NOT NULL) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
"""


@query("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: users whose first view precedes a click
    that precedes a purchase.

    Three grouped min-aggregations chained by time predicates — each
    stage shuffles on user_id only (and reuses the same partitioning);
    no window over raw events, no self-join explosion."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = t1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    n2 = t2.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_click"))
    n3 = t3.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_click_purchase"))
    return n1.crossJoin(n2).crossJoin(n3)


# ---------------------------------------------------------------------------
# Rolling time-range window — each event's average value over the
# same user's preceding hour (RANGE frame over event time).
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
       CAST(count(*) OVER w AS BIGINT) AS hour_n
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


@query("events_rolling_hour", oracle=_ROLLING_ORACLE)
def events_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, the same user's value sum and
    event count over the trailing hour (inclusive).  The frame is
    defined on epoch microseconds, so both engines bound it
    identically; one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("hour_n"),
    )


# ---------------------------------------------------------------------------
# E7 (streaming form) — the same tumbling-window aggregation run as a
# Structured Streaming job (readStream → watermark → window →
# writeStream, drained with availableNow) and checked against the
# same batch oracle: streaming and batch must agree exactly.
# ---------------------------------------------------------------------------

_STREAM_HOURLY_ORACLE = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("streaming_sessionize_stateful", oracle=_SESSIONS_ORACLE)
def streaming_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user gap sessionization
    via ``applyInPandasWithState`` (Arrow-batched group fold over
    persisted state), drained with availableNow.  The oracle is the
    SAME SQL as the batch ``events_sessionize`` — streaming and batch
    must agree exactly."""
    from ..streaming.stateful import run_streaming_sessionize

    return run_streaming_sessionize(spark, sf_dir)


@query("streaming_hourly_tumbling", oracle=_STREAM_HOURLY_ORACLE)
def streaming_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 streaming: windowed agg over a parquet stream, drained to
    completion with trigger(availableNow) — results must equal the
    batch plan (the oracle is the batch SQL)."""
    from ..streaming.incremental import run_streaming_hourly

    return run_streaming_hourly(spark, sf_dir)


_STREAM_DEDUP_ORACLE = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
FROM events
"""


@query("streaming_dedup_exact", oracle=_STREAM_DEDUP_ORACLE)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the event stream replayed twice
    (simulated at-least-once delivery) collapses back to exactly-once
    via watermark-bounded ``dropDuplicates`` state.  The oracle is the
    batch identity — every original event exactly once."""
    from ..streaming.incremental import run_streaming_dedup

    return run_streaming_dedup(spark, sf_dir)


_SESSION_WINDOW_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w < INTERVAL 30 MINUTE THEN 0 ELSE 1 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM gaps
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS last_event_us,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@query("streaming_session_window", oracle=_SESSION_WINDOW_ORACLE)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` streaming aggregation (native
    merging-session state), the stock-operator twin of the custom
    ``applyInPandasWithState`` sessionizer.  Note the STRICT gap
    semantics (an event exactly at the previous window's end opens a
    new session) — the oracle's lag comparison uses ``<``, not
    ``<=``, to match."""
    from ..streaming.incremental import run_streaming_session_window

    return run_streaming_session_window(spark, sf_dir)


_UPSERT_ORACLE = """
WITH ranked AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
FROM ranked WHERE rn = 1
"""


@query("streaming_upsert_latest", oracle=_UPSERT_ORACLE)
def streaming_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-upsert materialized view: latest event per
    user, maintained per micro-batch as union(state, batch) →
    argmax(ts, event_id).  The idempotent per-batch merge is what
    makes checkpoint recovery exactly-once at the table level; the
    oracle is the batch argmax over all events."""
    from ..streaming.incremental import run_streaming_upsert_latest

    return run_streaming_upsert_latest(spark, sf_dir)


_STREAM_ENRICH_ORACLE = """
WITH dim AS (
    SELECT user_id,
           CAST(CAST(min(ts) AS DATE) AS VARCHAR) AS first_seen,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS n_clicks
    FROM events
    GROUP BY user_id
)
SELECT e.event_id, e.user_id, d.first_seen, d.n_clicks, e.value
FROM events e
JOIN dim d USING (user_id)
WHERE e.event_type = 'purchase'
"""


@query("streaming_static_enrich", oracle=_STREAM_ENRICH_ORACLE)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the purchase stream enriched with a
    batch-computed per-user dimension — stateless (no join state, the
    static side is re-planned and broadcast per micro-batch).  The
    oracle is the identical batch join."""
    from ..streaming.incremental import run_stream_static_enrich

    return run_stream_static_enrich(spark, sf_dir)


@query("streaming_dedup_within_watermark", oracle=_STREAM_DEDUP_ORACLE)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on the bare business key via
    ``dropDuplicatesWithinWatermark`` — state still evicted past the
    watermark even though event time is NOT part of the key (the
    right tool when replays of a key carry jittered timestamps).
    Oracle: batch identity, every original event exactly once."""
    from ..streaming.incremental import run_streaming_dedup_within_watermark

    return run_streaming_dedup_within_watermark(spark, sf_dir)


@query("streaming_click_purchase_join", oracle=_CLICK_PURCHASE_ORACLE)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 streaming: stream-stream interval join (click → purchase
    within 5 min) with watermarks on both sides bounding the join
    state.  The oracle is the SAME SQL as the batch
    ``events_click_purchase_window`` — streaming and batch must agree
    exactly."""
    from ..streaming.incremental import run_streaming_interval_join

    return run_streaming_interval_join(spark, sf_dir)



# ---------------------------------------------------------------------------
# Full-outer snapshot compare — the two-sided completion of the delta
# family: anti-join shows additions only (E2), the change detector
# shows updates (E8); FULL OUTER keeps added, removed, AND retained
# users in one pass with per-side activity counts.
# ---------------------------------------------------------------------------

_FULL_COMPARE_ORACLE = """
WITH maxd AS (SELECT CAST(max(ts) AS DATE) AS d FROM events),
t AS (
  SELECT user_id, count(*) AS n_today
  FROM events, maxd WHERE CAST(ts AS DATE) = maxd.d GROUP BY user_id
),
y AS (
  SELECT user_id, count(*) AS n_yesterday
  FROM events, maxd WHERE CAST(ts AS DATE) = maxd.d - INTERVAL 1 DAY
  GROUP BY user_id
)
SELECT COALESCE(t.user_id, y.user_id) AS user_id,
       CAST(COALESCE(t.n_today, 0) AS BIGINT) AS n_today,
       CAST(COALESCE(y.n_yesterday, 0) AS BIGINT) AS n_yesterday,
       CASE WHEN y.user_id IS NULL THEN 'added'
            WHEN t.user_id IS NULL THEN 'removed'
            ELSE 'retained' END AS status
FROM t FULL OUTER JOIN y ON t.user_id = y.user_id
"""


@query("snapshot_full_compare", oracle=_FULL_COMPARE_ORACLE)
def snapshot_full_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER snapshot comparison: today's vs yesterday's active
    users with added / removed / retained status — the two-sided view
    the reference's insert-only delta silently discards (SURVEY §1.1:
    deletions never surface in New.xlsx).

    Both sides pre-aggregate to one row per user BEFORE the full
    outer join, so the join carries |users|, not |events|, and the
    null-side coalesce gives exact per-side counts.  One shuffle per
    side on user_id, reused by the join.
    """
    from ..operators.snapshot import day_snapshots

    ev = load_table(spark, sf_dir, "events")
    today, yesterday = day_snapshots(ev)
    t = today.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_today"))
    y = yesterday.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_yesterday"))
    joined = t.withColumnRenamed("user_id", "t_user").join(
        y.withColumnRenamed("user_id", "y_user"),
        F.col("t_user") == F.col("y_user"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("t_user", "y_user").alias("user_id"),
        F.coalesce("n_today", F.lit(0)).cast("bigint").alias("n_today"),
        F.coalesce("n_yesterday", F.lit(0)).cast("bigint").alias("n_yesterday"),
        F.when(F.col("y_user").isNull(), "added")
        .when(F.col("t_user").isNull(), "removed")
        .otherwise("retained")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Daily ops mart — the events-side flagship composite (the documents
# side's twin is curate_training_corpus): one day-grain table joining
# activity, sessionization, monetization, and rolling-actives signals.
# ---------------------------------------------------------------------------

_OPS_MART_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_active_users,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS purchase_value
    FROM events GROUP BY 1
),
gaps AS (
    SELECT CAST(ts AS DATE) AS day,
           CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
    FROM events
),
starts AS (
    SELECT day, CAST(SUM(new_session) AS BIGINT) AS n_sessions_started
    FROM gaps GROUP BY 1
),
days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
bounds AS (
    SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
),
spread AS (
    SELECT CAST(unnest(range(d, d + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE)
               AS day,
           user_id
    FROM days
),
wau AS (
    SELECT s.day, count(DISTINCT s.user_id) AS wau
    FROM spread s, bounds b
    WHERE s.day BETWEEN b.mn AND b.mx
    GROUP BY 1
)
SELECT CAST(d.day AS VARCHAR) AS day,
       d.n_events, d.n_active_users, d.n_purchases, d.purchase_value,
       s.n_sessions_started,
       w.wau
FROM daily d
JOIN starts s ON s.day = d.day
JOIN wau w ON w.day = d.day
"""


@query("events_daily_ops_mart", oracle=_OPS_MART_ORACLE)
def events_daily_ops_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-side flagship composite: the day-grain ops mart a
    product team reads every morning — activity volume, distinct
    actives, purchases and exact-decimal revenue, sessions STARTED
    (the gap-sessionizer's start flags folded by start day), and the
    trailing-7-day actives from the rolling operator, one row per day.

    Scale: three fact passes total — the conditional daily aggregate
    (one map-side-combined shuffle computes four metrics at once),
    the sessionizer window (user-partitioned), and the (user, day)
    dedup feeding WAU — then day-keyed joins of day-count-sized
    frames, which AQE broadcasts.  Each stage is a component query's
    documented shape (events_hourly_tumbling, events_sessionize,
    weekly_active_users) composed without changing its physics.
    """
    from ..operators.rolling import rolling_distinct_count

    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    dec0 = F.lit(0).cast("decimal(18,2)")
    daily = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active_users"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(dec0)
        )
        .cast("double")
        .alias("purchase_value"),
    )
    starts = (
        _session_flags(e)
        .groupBy(day.alias("day"))
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions_started"))
    )
    days = e.select("user_id", day.alias("d")).distinct()
    # rolling_distinct_count materializes `days` internally, so the
    # dedup pass over the fact runs once despite its two consumers.
    wau = rolling_distinct_count(days, "user_id", "d", 7).select(
        "day", F.col("n_distinct").alias("wau")
    )
    return (
        daily.join(starts, "day")
        .join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_events",
            "n_active_users",
            "n_purchases",
            "purchase_value",
            "n_sessions_started",
            "wau",
        )
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix — the Markov base-rate table.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type,
       CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM counts
"""


@query("events_transition_matrix", oracle=_TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the base-rate table
    behind next-event prediction and anomaly scoring.

    The lag window shares the sessionizer's (user_id; ts, event_id)
    sort; the transition count is two-phase on a ≤#types² key space,
    and the row-normalizing window runs over that tiny counted frame
    — one double division per row, exact integers everywhere else.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(wnorm).cast("double")).alias(
            "p"
        ),
    )


# ---------------------------------------------------------------------------
# Streaming sliding-window approx distinct — streaming WAU.
# ---------------------------------------------------------------------------

_STREAM_WAU_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
bounds AS (
    SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
),
spread AS (
    SELECT user_id,
           CAST(unnest(range(d, d + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE)
               AS day
    FROM days
)
SELECT CAST(s.day AS VARCHAR) AS day,
       count(DISTINCT s.user_id) AS wau_exact,
       TRUE AS within_tol
FROM spread s, bounds b
WHERE s.day BETWEEN b.mn AND b.mx
GROUP BY 1
"""


@query("streaming_wau_approx", oracle=_STREAM_WAU_ORACLE)
def streaming_wau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trailing-7-day actives via sliding windows +
    approx_count_distinct, checked within 5% of the exact batch
    rolling operator (the sketch estimate itself is not
    cross-engine-reproducible, so the gate surface is exact WAU + the
    tolerance flag — hll_mergeable_distinct's convention).
    """
    from ..streaming.incremental import run_streaming_wau_approx

    return run_streaming_wau_approx(spark, sf_dir)


# ---------------------------------------------------------------------------
# Session path mining — the top click-paths table.
# ---------------------------------------------------------------------------

_PATHS_TOPK = 10

_PATHS_ORACLE = f"""
WITH gaps AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM gaps
),
paths AS (
    SELECT user_id, session_id,
           array_to_string(
               (array_agg(event_type ORDER BY ts, event_id))[1:3], '>'
           ) AS path
    FROM sessions GROUP BY user_id, session_id
),
counts AS (
    SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
    FROM counts
) x
WHERE rk <= {_PATHS_TOPK}
"""


@query("session_path_mining", oracle=_PATHS_ORACLE)
def session_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining: the {k} most common session-opening
    paths (first 3 event types per gap-session) — transition
    matrices' (E73) longer-range sibling, the table behind funnel
    design and bot detection.

    Per-session ordering is pinned by sorting the collected
    (ts_us, event_id, type) structs — collect_list order is
    execution-dependent, array_sort makes it exact (the oracle's
    ordered array_agg is the same contract).  The sessionizer windows
    partition by user; the path count is two-phase on a tiny key
    space; the final ranking window sees distinct paths only.
    """
    sess = _sessionize(load_table(spark, sf_dir, "events"))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("t"),
                                F.col("event_id").alias("e"),
                                F.col("event_type").alias("y"),
                            )
                        )
                    ),
                    1,
                    3,
                ),
                lambda x: x.y,
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counts.withColumn("rk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rk") <= _PATHS_TOPK)
        .select("path", "n_sessions", "rk")
    )


# ---------------------------------------------------------------------------
# Session bounce rate per day — single-event sessions over the gap
# sessionizer, the engagement-health ratio next to DAU/WAU.
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM gaps
),
per_session AS (
  SELECT user_id, session_id,
         CAST(min(ts) AS DATE) AS day,
         count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT CAST(day AS VARCHAR) AS day,
       count(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
            // count(*) AS DOUBLE) / 100 AS bounce_pct
FROM per_session
GROUP BY day
"""


@query("session_bounce_rate", oracle=_BOUNCE_ORACLE)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per day: the share of gap-sessions (30 min, same
    sessionizer as events_sessionize) containing exactly ONE event,
    keyed by the session's start day — the engagement-health ratio a
    product dashboard shows beside DAU/WAU.

    Scale shape: ONE user-keyed shuffle runs both session windows
    (lag + running sum share the sort); the per-session reduction is
    a grouped aggregate on (user, session); the daily roll-up runs on
    the #sessions frame.  The percentage is basis-point integer
    truncation then one division — no float ratio at the boundary.
    The running-sum tie-break includes event_id (same-timestamp
    events would otherwise order nondeterministically between
    engines).
    """
    sessions = _sessionize(load_table(spark, sf_dir, "events"))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_session.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            (
                F.expr("n_bounces * 10000 div n_sessions").cast("double") / 100
            ).alias("bounce_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Session-duration histogram — how long do 30-min-gap sessions
# actually run?  Log2-bucketed over whole seconds so the histogram is
# O(log max_duration) rows at any corpus size; the capacity/engagement
# readout that complements session counts (events_sessionize) and
# bounce share (session_bounce_rate).
# ---------------------------------------------------------------------------

_SESSION_DURATION_HIST_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM gaps
),
per_session AS (
  SELECT user_id, session_id,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT CASE WHEN dur_s = 0 THEN -1
            ELSE CAST(length(bin(dur_s)) - 1 AS INT) END AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM per_session
GROUP BY 1
"""


@query("session_duration_histogram", oracle=_SESSION_DURATION_HIST_ORACLE)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of 30-min-gap session durations in log2(seconds)
    buckets (bucket −1 = sub-second/single-event sessions): per
    bucket, session and event counts.  The engagement-depth readout
    that a mean session length hides (the histogram separates a
    bimodal bounce/binge mix).

    Determinism: duration is exact integer microseconds floored to
    whole seconds (µs div 10⁶ — both engines integer-divide), and the
    bucket is length(bin(s))−1, exact in both engines; the ambiguous
    0-second case gets its own sentinel bucket rather than sharing
    bucket 0 with 1-second sessions.

    Scale shape: the sessionizer is the shared single user-keyed
    shuffle (both windows reuse it); per-session collapse is a
    combinable aggregate on (user, session), and the histogram fold
    ends at O(log max_duration) rows.  Nothing global, nothing
    corpus-sized after the first shuffle.
    """
    sessions = _sessionize(load_table(spark, sf_dir, "events"))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.expr(
            "CAST((max(unix_micros(ts)) - min(unix_micros(ts))) div 1000000"
            " AS BIGINT)"
        ).alias("dur_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return per_session.groupBy(
        F.when(F.col("dur_s") == 0, F.lit(-1))
        .otherwise((F.length(F.bin("dur_s")) - 1).cast("int"))
        .cast("int")
        .alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


# Interpolate build-time constants into docstrings (a plain docstring
# cannot be an f-string; mutating __doc__ after definition keeps the
# auto-generated QUERIES.md index free of raw {placeholders}).
session_path_mining.__doc__ = session_path_mining.__doc__.format(k=_PATHS_TOPK)
