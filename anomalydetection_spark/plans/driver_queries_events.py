"""Driver-contract queries, batch 8: event-stream analytics shapes.

The reference's events are log lines with embedded timestamps it never
treats temporally (drain.py:27 keeps Timestamp as a raw string); a
validation engine over event streams needs the standard temporal shapes:
ordered funnels, overlapping (hopping) windows, and dense calendar
gap-fill. All three are expressed as hash aggregates + broadcast joins —
no partition-less windows, no per-row Python — and every value crossing
the oracle boundary is an integer, a date, or a timestamp.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# sequential funnel: signup → view → purchase, strictly ordered
# ---------------------------------------------------------------------------


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-stage funnel over the events table: a user
    converts stage 2 only with a 'view' AFTER their first 'signup', and
    stage 3 only with a 'purchase' AFTER that first qualifying view.

    Shape: three per-user hash aggregates chained by equi-joins on
    user_id — every join hashes on the same key, so AQE reuses one
    exchange layout; no window functions and nothing wider than
    (user_id, 2 timestamps) crosses a shuffle. At 10^12 events the
    event-type filters push to the scan and each stage's aggregate is
    partial-aggregated map-side. Output: one row per funnel stage with
    the distinct-user count and the stage's conversion share of stage 1
    (exact integer division, rounded to 6)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    s2 = (
        s1.join(views, (F.col("user_id") == F.col("vu")) & (F.col("vts") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("vts").alias("t_view"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    s3 = (
        s2.join(buys, (F.col("user_id") == F.col("pu")) & (F.col("pts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("pts").alias("t_buy"))
    )
    n1 = s1.agg(F.count("*").alias("n")).select(
        F.lit(1).alias("stage"), F.lit("signup").alias("stage_name"), "n"
    )
    n2 = s2.agg(F.count("*").alias("n")).select(
        F.lit(2).alias("stage"), F.lit("signup>view").alias("stage_name"), "n"
    )
    n3 = s3.agg(F.count("*").alias("n")).select(
        F.lit(3).alias("stage"), F.lit("signup>view>purchase").alias("stage_name"), "n"
    )
    stages = n1.unionByName(n2).unionByName(n3)
    base = s1.agg(F.count("*").alias("n_base"))
    return stages.crossJoin(F.broadcast(base)).select(
        "stage",
        "stage_name",
        F.col("n").cast("long").alias("n_users"),
        F.round(F.col("n") / F.col("n_base"), 6).alias("share_of_stage1"),
    )


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t_view
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t_signup
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t_buy
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_view
  GROUP BY e.user_id),
counts AS (
  SELECT 1 AS stage, 'signup' AS stage_name, count(*)::bigint AS n_users FROM s1
  UNION ALL
  SELECT 2, 'signup>view', count(*)::bigint FROM s2
  UNION ALL
  SELECT 3, 'signup>view>purchase', count(*)::bigint FROM s3)
SELECT stage, stage_name, n_users,
       round(n_users / (SELECT count(*) FROM s1), 6) AS share_of_stage1
FROM counts
"""

# ---------------------------------------------------------------------------
# hopping (sliding) windows: 1-hour windows every 30 minutes
# ---------------------------------------------------------------------------


def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event and distinct-user counts in 1-hour windows hopping every 30
    minutes (each event lands in exactly 2 overlapping windows) over one
    fixture day. ``F.window(ts, '1 hour', '30 minutes')`` expands the
    assignment JVM-side (an Expand/explode, never a self-join or range
    join); the aggregate is one hash agg on window_start. The DuckDB twin
    derives both containing window starts arithmetically — pinning
    Spark's window-assignment semantics (start-inclusive, end-exclusive,
    epoch-aligned) against an independent construction."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        (F.col("ts") >= "2024-01-02") & (F.col("ts") < "2024-01-03")
    )
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


HOPPING_SQL = """
WITH ev AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'),
assigned AS (
  SELECT user_id,
    unnest([time_bucket(INTERVAL '30 minutes', ts),
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
      AS window_start
  FROM ev)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
       count(*)::bigint AS n_events,
       count(DISTINCT user_id)::bigint AS n_users
FROM assigned
GROUP BY window_start
"""

# ---------------------------------------------------------------------------
# calendar gap-fill: dense user-activity-by-day grid
# ---------------------------------------------------------------------------


def gapfill_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day active vs idle user counts over the DENSE calendar — days
    and users with zero events still produce rows (the densification /
    gap-fill shape BI resampling needs; an outer aggregate alone silently
    skips empty cells). The day dimension comes from one scalar agg
    (min/max date) exploded via ``sequence()``; the user dimension is the
    distinct-user aggregate; their crossJoin is dimension-sized
    (|days| x |users|, both broadcast-small after aggregation) and the
    fact table joins it pre-aggregated per (day, user) — the grid never
    touches raw events. 'error' events are excluded so idle cells
    actually occur."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") != "error"
    ).select(F.to_date("ts").alias("day"), "user_id")
    span = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(F.explode(F.sequence("d0", "d1")).alias("day"))
    users = ev.select("user_id").distinct()
    grid = F.broadcast(span).crossJoin(users)
    per_cell = ev.groupBy("day", "user_id").agg(F.count("*").alias("n"))
    dense = grid.join(per_cell, ["day", "user_id"], "left")
    return dense.groupBy("day").agg(
        F.sum((F.col("n").isNotNull()).cast("long")).alias("n_active_users"),
        F.sum((F.col("n").isNull()).cast("long")).alias("n_idle_users"),
        F.sum(F.coalesce("n", F.lit(0))).alias("n_events"),
    )


GAPFILL_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id FROM events
  WHERE event_type <> 'error'),
span AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL '1 day'))::DATE
    AS day FROM ev),
users AS (SELECT DISTINCT user_id FROM ev),
per_cell AS (SELECT day, user_id, count(*)::bigint AS n FROM ev GROUP BY 1, 2),
dense AS (
  SELECT s.day, u.user_id, c.n
  FROM span s CROSS JOIN users u
  LEFT JOIN per_cell c ON c.day = s.day AND c.user_id = u.user_id)
SELECT day,
  sum(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_active_users,
  sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END)::bigint AS n_idle_users,
  sum(coalesce(n, 0))::bigint AS n_events
FROM dense
GROUP BY day
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "funnel_stages": funnel_stages,
    "hopping_window_counts": hopping_window_counts,
    "gapfill_daily_activity": gapfill_daily_activity,
}

ORACLE_SQL: dict[str, str] = {
    "funnel_stages": FUNNEL_SQL,
    "hopping_window_counts": HOPPING_SQL,
    "gapfill_daily_activity": GAPFILL_SQL,
}

# ---------------------------------------------------------------------------
# unpivot (melt): wide metric columns → long (entity, metric, value)
# ---------------------------------------------------------------------------


def unpivot_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide metrics (event count, distinct types, fixed-point
    value total) melted to long (user_id, metric, value) rows — the
    UNPIVOT/melt complement of `pivot_event_counts`, the shape feature
    stores and metric warehouses need for columnar→EAV conversion.

    Spark's `unpivot` (SQL `stack`) expands JVM-side in the projection —
    an Expand node, never a UNION of per-metric scans: the wide aggregate
    is computed once and melted for free. All values are bigints (the
    value total is cents-fixed-point) so the long rows hash cross-engine."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") % 10 == 3
    )
    wide = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("value_fp"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_events", "n_types", "value_fp"],
        variableColumnName="metric",
        valueColumnName="value",
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT user_id, count(*)::bigint AS n_events,
         count(DISTINCT event_type)::bigint AS n_types,
         sum(cast(round(value * 100.0, 0) AS bigint))::bigint AS value_fp
  FROM events WHERE user_id % 10 = 3 GROUP BY user_id)
SELECT user_id, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_events, n_types, value_fp))
"""

QUERIES["unpivot_user_metrics"] = unpivot_user_metrics
ORACLE_SQL["unpivot_user_metrics"] = UNPIVOT_SQL

# ---------------------------------------------------------------------------
# metric-history anomaly flags: daily event counts per type
# ---------------------------------------------------------------------------


def anomaly_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online-normal + rate-of-change anomaly flags over the per-type daily
    event-count series — the Deequ-AnomalyDetection shape the engine also
    runs over its own validation-run ledger (ResumableValidator
    .metric_anomalies). Each day's count is judged ONLY against the days
    strictly before it in its own series (causal flags: extending the
    history never rewrites a past flag).

    Cross-engine determinism: the online-normal test never materializes
    μ/σ — |v−μ| > 3σ is cross-multiplied to the integer inequality
    (n·v−S)²·(n−1) > 9·n·(n·SS−S²) over bigint history sums, so Spark and
    DuckDB flag identical days (operators/metrics_anomaly.py). Windows
    partition by event_type (series-sized, never partition-less); the
    daily rollup is one hash aggregate off the pruned (ts, event_type)
    scan."""
    from anomalydetection_spark.operators.metrics_anomaly import (
        AnomalyThresholds,
        flag_anomalies,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    return flag_anomalies(
        daily,
        key_cols=["event_type"],
        order_col="day",
        value_col="n_events",
        thresholds=AnomalyThresholds(
            k_num=3, k_den=1, min_history=3, max_pct_increase=50, max_pct_decrease=50
        ),
    )


ANOMALY_DAILY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n_events
  FROM events GROUP BY 1, 2),
hist AS (
  SELECT event_type, day, n_events,
         count(*) OVER w AS hist_n,
         coalesce(sum(n_events) OVER w, 0)::hugeint AS s,
         coalesce(sum(n_events * n_events) OVER w, 0)::hugeint AS ss,
         lag(n_events) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_type, day, n_events, hist_n::bigint AS hist_n,
       (hist_n >= 3 AND
        (hist_n * n_events - s) * (hist_n * n_events - s) * (hist_n - 1)
          > 9 * hist_n * (hist_n * ss - s * s)) AS normal_anomaly,
       (prev_n IS NOT NULL AND
        (100 * n_events > 150 * prev_n OR 100 * n_events < 50 * prev_n))
         AS change_anomaly
FROM hist
"""

QUERIES["anomaly_daily_event_counts"] = anomaly_daily_event_counts
ORACLE_SQL["anomaly_daily_event_counts"] = ANOMALY_DAILY_SQL


# ---------------------------------------------------------------------------
# freshness audit: per-group event-time recency facts (operators/freshness)
# ---------------------------------------------------------------------------

# staleness is measured against an EXPLICIT instant, never wall-clock, so
# the same input always yields the same verdicts (operators/freshness.py)
FRESHNESS_AS_OF = "2024-01-31 00:00:00"
FRESHNESS_MAX_LAG_S = 1800


def freshness_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness constraint core (operators/freshness.staleness) audited per
    event_type: newest-event lag vs an explicit as_of in exact integer
    microseconds, one map-side-combinable hash aggregate, no joins/windows.
    The reference has no freshness notion (it reads one static CSV dump,
    end_to_end_prediction.py:618); a continuously-ingested table needs the
    Deequ-style recency check."""
    from anomalydetection_spark.operators.freshness import staleness

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    facts = staleness(e, "ts", FRESHNESS_AS_OF, group_col="event_type")
    return facts.select(
        "event_type",
        "n_rows",
        "n_null_ts",
        "max_ts_us",
        "staleness_s",
        (
            F.col("staleness_s").isNotNull()
            & (F.col("staleness_s") <= F.lit(FRESHNESS_MAX_LAG_S))
        ).alias("fresh"),
    )


FRESHNESS_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       cast(coalesce(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END), 0) AS bigint)
         AS n_null_ts,
       max(epoch_us(ts)) AS max_ts_us,
       cast(floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                   - max(epoch_us(ts))) / 1000000) AS bigint) AS staleness_s,
       (max(ts) IS NOT NULL
        AND floor((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                   - max(epoch_us(ts))) / 1000000) <= 1800) AS fresh
FROM events GROUP BY event_type
"""

QUERIES["freshness_events_by_type"] = freshness_events_by_type
ORACLE_SQL["freshness_events_by_type"] = FRESHNESS_SQL


# ---------------------------------------------------------------------------
# heavy-hitter rank drift
# ---------------------------------------------------------------------------


def topk_rank_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical rank drift (operators/freqitems.topk_rank_drift): each
    event_type's top-10 users by event count vs the global top-10 —
    membership churn (n_common/n_new), order churn (rank_displacement),
    and an exact integer Jaccard in ppm. The global baseline is a
    TakeOrdered top-k + broadcast beats-join, never a partition-less
    rank window."""
    from anomalydetection_spark.operators.freqitems import topk_rank_drift

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return topk_rank_drift(e, "event_type", "user_id", k=10)


TOPK_RANK_DRIFT_SQL = """
WITH counts AS (
  SELECT event_type, user_id, count(*)::bigint AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
cur AS (
  SELECT event_type, user_id, rk_cur FROM (
    SELECT event_type, user_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n DESC, user_id ASC) AS rk_cur
    FROM counts) WHERE rk_cur <= 10),
base AS (SELECT user_id, sum(n) AS n FROM counts GROUP BY 1),
base_topk AS (
  SELECT user_id,
         row_number() OVER (ORDER BY n DESC, user_id ASC) AS rk_base
  FROM base QUALIFY rk_base <= 10),
bk AS (SELECT count(*)::bigint AS base_k FROM base_topk),
j AS (
  SELECT c.event_type, c.rk_cur, b.rk_base
  FROM cur c LEFT JOIN base_topk b USING (user_id))
SELECT event_type,
  sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_common,
  (count(*) - sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END))::bigint AS n_new,
  sum(CASE WHEN rk_base IS NOT NULL THEN abs(rk_cur - rk_base) ELSE 0 END)::bigint
    AS rank_displacement,
  ((sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
   // (count(*) + (SELECT base_k FROM bk)
       - sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END)))::bigint AS jaccard_ppm
FROM j GROUP BY event_type
"""

QUERIES["topk_rank_drift_events"] = topk_rank_drift_events
ORACLE_SQL["topk_rank_drift_events"] = TOPK_RANK_DRIFT_SQL
