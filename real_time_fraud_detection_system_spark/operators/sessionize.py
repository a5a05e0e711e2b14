"""Sessionization: gap-based session assignment over the events stream.

Batch twin of streaming ``session_window(ts, gap)``: per user, a new
session starts when the gap from the previous event exceeds the threshold.
Classic lag + cumulative-sum-of-boundaries pattern -- two window functions
over the same (user_id, ts) partitioning, so Catalyst plans ONE shuffle and
one sort, reused by both windows (check with .explain: a single Exchange).

At 100 TB: the shuffle is keyed by user_id (high cardinality, well spread);
skewed power-users are handled by AQE skew-split. No state is held beyond
the sort buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.money import exact_sum

GAP_MINUTES = 30


def assign_sessions(ev: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Gap-rule session assignment over any (user_id, ts, event_id)
    frame: adds session_seq (1-based per user)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > gap_us)
    ).cast("bigint")
    return ev.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids (user_id, session_seq starting at 1)."""
    return assign_sessions(load_table(spark, sf_dir, "events"))


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level rollup: events per session, duration, value sum."""
    return (
        sessionized(spark, sf_dir)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
            # order-independent fixed-point sum (money.py rationale)
            F.expr(exact_sum("value", 4)).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


USER_SESSIONS_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_MINUTES * 60 * 1000000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       CAST(sum(CAST(round((value) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats -- the 'how many sessions, how long' report.

    The averages are over exact INTEGERS (event counts, microsecond
    durations), so they stay in integer space end-to-end: sum them as
    BIGINT, scale by 1e6, and round half-up with integer division.
    ``round(avg(bigint), 6)`` was one of the two sf0.1 cross-engine
    mismatches this suite ever produced -- Spark's round reads the
    double's SHORTEST decimal repr while DuckDB rounds the exact binary
    value, and a quotient landing on a ...5 boundary in the shortest
    repr splits them (86545889.4920635 -> .492064 vs .492063). Integer
    half-up division has no such boundary to disagree on."""

    def avg6(col: str) -> F.Column:
        return F.expr(
            f"CAST((sum({col}) * 2000000 + count(*))"
            " DIV (2 * count(*)) AS DOUBLE) / 1000000"
        )

    return (
        user_sessions(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            avg6("n_events").alias("avg_events_per_session"),
            avg6("duration_us").alias("avg_duration_us"),
        )
        .orderBy("user_id")
    )


SESSION_SUMMARY_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_MINUTES * 60 * 1000000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
),
per_session AS (
  SELECT user_id, session_seq,
         count(*) AS n_events,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST((sum(n_events) * 2000000 + count(*))
            // (2 * count(*)) AS DOUBLE) / 1000000 AS avg_events_per_session,
       CAST((sum(duration_us) * 2000000 + count(*))
            // (2 * count(*)) AS DOUBLE) / 1000000 AS avg_duration_us
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Ordered conversion funnel: signup -> click -> purchase, stages count
# only when they happen in order (first signup before first subsequent
# click before first subsequent purchase). One groupBy(user) with
# conditional min aggregates -- no joins, one shuffle.
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_signup = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).alias("t_signup")
    per_user = ev.groupBy("user_id").agg(
        first_signup,
        F.collect_list(
            F.when(
                F.col("event_type").isin("click", "purchase"),
                F.struct("ts", "event_type"),
            )
        ).alias("evs"),
    )
    # first click AFTER signup / first purchase AFTER that click, via
    # array_min over filtered higher-order expressions (no re-shuffle)
    staged = per_user.selectExpr(
        "user_id",
        "t_signup",
        "evs",
        "array_min(transform(filter(evs, e -> e.event_type = 'click'"
        " AND e.ts > t_signup), e -> e.ts)) AS t_click",
    ).selectExpr(
        "user_id",
        "t_signup",
        "t_click",
        "array_min(transform(filter(evs, e -> e.event_type = 'purchase'"
        " AND e.ts > t_click), e -> e.ts)) AS t_purchase",
    )
    return staged.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signed_up"),
        F.count("t_click").alias("n_clicked_after"),
        F.count("t_purchase").alias("n_purchased_after"),
    )


CONVERSION_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
  FROM events GROUP BY 1
),
clicks AS (
  SELECT p.user_id, min(e.ts) AS t_click
  FROM per_user p JOIN events e
    ON e.user_id = p.user_id AND e.event_type = 'click'
   AND e.ts > p.t_signup
  GROUP BY 1
),
purchases AS (
  SELECT c.user_id, min(e.ts) AS t_purchase
  FROM clicks c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts > c.t_click
  GROUP BY 1
)
SELECT count(*) AS n_users,
       count(t_signup) AS n_signed_up,
       count(t_click) AS n_clicked_after,
       count(t_purchase) AS n_purchased_after
FROM per_user
LEFT JOIN clicks USING (user_id)
LEFT JOIN purchases USING (user_id)
"""


# --------------------------------------------------------------------------
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, retention
    = share of the cohort active again k weeks later -- the canonical
    product-analytics rollup (the reference's Grafana time-series slot,
    generalized to per-cohort curves).

    Shape: one (user, week) distinct pass, a per-user min-week
    aggregate reusing the same user_id partitioning, one broadcast-size
    join back, and a (cohort_week, offset) count agg -- output is
    O(weeks^2) rows regardless of corpus size. date_trunc('week')
    truncates to Monday in both engines."""
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cohort_sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    joined = weeks.join(cohorts, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.col("week"), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
        "user_id",
    )
    active = joined.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("active_users")
    )
    return (
        active.join(cohort_sizes, "cohort_week")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
            "cohort_users",
            "active_users",
            F.round(
                F.col("active_users") / F.col("cohort_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


WEEKLY_RETENTION_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_users FROM cohorts GROUP BY 1
),
active AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INT)
           AS week_offset,
         count(*) AS active_users
  FROM weeks w JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(a.cohort_week AS DATE) AS cohort_week, a.week_offset,
       s.cohort_users, a.active_users,
       round(a.active_users / s.cohort_users, 6) AS retention
FROM active a JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


QUERIES = {
    "user_sessions": user_sessions,
    "session_summary": session_summary,
    "conversion_funnel": conversion_funnel,
    "weekly_retention_cohorts": weekly_retention_cohorts,
}

ORACLE = {
    "user_sessions": USER_SESSIONS_SQL,
    "session_summary": SESSION_SUMMARY_SQL,
    "conversion_funnel": CONVERSION_FUNNEL_SQL,
    "weekly_retention_cohorts": WEEKLY_RETENTION_SQL,
}
