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
    # cache() the (user, week) distinct frame: cohorts, cohort_sizes
    # and the join-back each re-ran the events scan + distinct under
    # it (three full corpus passes; round-13 optimization, guide §2.4)
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct().cache()
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


# --------------------------------------------------------------------------
# Kaplan-Meier weekly survival of user activity lifetimes.
_WEEK_US = 86_400_000_000  # one day of microseconds (day-split constant)
# peak_concurrency's hierarchical sweep: per-day boundary points
# sub-partition by hour so sweep parallelism is 24x the calendar-day
# count (which is what capped the flat sweep's task count).
_SWEEP_SUB_US = _WEEK_US // 24


def survival_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Kaplan-Meier survival curve of user lifetimes in weeks
    -- the churn question behind the reference's per-day metrics
    (dags/compute-daily-metrics.py:19-37): of the users first seen t
    weeks ago, what share is still active? Users whose last activity
    falls in the corpus' final week are right-CENSORED (they may still
    be alive); everyone else 'dies' at their last active week.

    Per offset t: n_at_risk = users with lifetime >= t, deaths = users
    last seen at offset t (uncensored), hazard = d/n, and the KM
    product S(t) = prod_{i<=t} (1 - d_i/n_i).

    Exactness + scale: week indexes are Monday-aligned integer epoch-day
    arithmetic ((days+3) DIV 7 -- never the engines' divergent
    date_trunc('week') locale rules); the curve is computed entirely in
    integer fixed-point, with the KM product a left fold of
    ``acc * (n-d) DIV n`` from 1,000,000 -- bit-identical across
    engines (the oracle replays the same fold as a recursive CTE). The
    corpus collapses in two keyed aggregates (user -> (first, last
    week) -> a <= weeks^2-row histogram); the curve itself is computed
    by higher-order functions on ONE collected histogram row, so no
    global window ever touches row-scale data."""
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.selectExpr(
            "user_id",
            "(unix_date(CAST(ts AS DATE)) + 3) DIV 7 AS w",
        )
        .groupBy("user_id")
        .agg(F.min("w").alias("fw"), F.max("w").alias("lw"))
    )
    hist = users.selectExpr("lw - fw AS dur", "lw").groupBy(
        "dur", "lw"
    ).agg(F.count("*").alias("cnt"))
    one = hist.agg(
        F.max("lw").alias("gmax"),
        F.collect_list(F.struct("dur", "lw", "cnt")).alias("hs"),
    )
    return (
        one.selectExpr(
            "gmax",
            "hs",
            "explode(sequence(0, aggregate(hs, 0L,"
            " (a, x) -> greatest(a, x.dur)))) AS week_offset",
        )
        .selectExpr(
            "week_offset",
            "aggregate(filter(hs, x -> x.dur >= week_offset), 0L,"
            " (a, x) -> a + x.cnt) AS n_at_risk",
            "aggregate(filter(hs, x -> x.dur = week_offset"
            " AND x.lw < gmax), 0L, (a, x) -> a + x.cnt) AS deaths",
            "aggregate(filter(hs, x -> x.dur = week_offset"
            " AND x.lw = gmax), 0L, (a, x) -> a + x.cnt) AS censored",
            "aggregate(sequence(0, week_offset), 1000000L, (acc, i) ->"
            " (acc * (aggregate(filter(hs, x -> x.dur >= i), 0L,"
            "           (a, x) -> a + x.cnt)"
            "         - aggregate(filter(hs, x -> x.dur = i"
            "             AND x.lw < gmax), 0L, (a, x) -> a + x.cnt)))"
            " DIV aggregate(filter(hs, x -> x.dur >= i), 0L,"
            "       (a, x) -> a + x.cnt)) AS survival_ppm",
        )
        .selectExpr(
            "week_offset",
            "n_at_risk",
            "deaths",
            "censored",
            "deaths * 1000000 DIV n_at_risk AS hazard_ppm",
            "survival_ppm",
        )
        .orderBy("week_offset")
    )


SURVIVAL_WEEKLY_SQL = """
WITH RECURSIVE users AS (
  SELECT user_id,
         min((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) + 3) // 7)
           AS fw,
         max((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) + 3) // 7)
           AS lw
  FROM events GROUP BY 1
), g AS (
  SELECT max(lw) AS gmax FROM users
), durs AS (
  SELECT lw - fw AS dur,
         CAST(sum(CASE WHEN lw < g.gmax THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN lw = g.gmax THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM users, g GROUP BY 1
), per AS (
  SELECT t.t AS week_offset,
         (SELECT CAST(coalesce(sum(d + c), 0) AS BIGINT) FROM durs
          WHERE dur >= t.t) AS n_at_risk,
         coalesce((SELECT d FROM durs WHERE dur = t.t), 0) AS deaths,
         coalesce((SELECT c FROM durs WHERE dur = t.t), 0) AS censored
  FROM (SELECT unnest(range(0, (SELECT max(dur) + 1 FROM durs))) AS t) t
), surv AS (
  SELECT week_offset, n_at_risk, deaths, censored,
         (n_at_risk - deaths) * 1000000 // n_at_risk AS survival_ppm
  FROM per WHERE week_offset = 0
  UNION ALL
  SELECT p.week_offset, p.n_at_risk, p.deaths, p.censored,
         s.survival_ppm * (p.n_at_risk - p.deaths) // p.n_at_risk
  FROM surv s JOIN per p ON p.week_offset = s.week_offset + 1
)
SELECT week_offset, n_at_risk, deaths, censored,
       CAST(deaths * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm,
       CAST(survival_ppm AS BIGINT) AS survival_ppm
FROM surv ORDER BY week_offset
"""


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions via an interval sweep-line --
    the capacity question ('how many users were on AT ONCE, and when?')
    that no per-hour count answers, because sessions straddle bucket
    edges. Sessions are the gap-rule intervals [first event, last
    event]; a session spanning midnight is SPLIT at the day boundary so
    each calendar day sees exactly its own overlap.

    Sweep-line as dataframes: each interval emits (+1 at start, -1 at
    end + 1us); the running sum ordered by (time, delta, user, seq) is
    the exact concurrency at every boundary instant (-1 sorts first, so
    back-to-back sessions at the same microsecond never double-count).
    The order key is a unique total order, so both engines walk the
    identical sequence. busiest_us is the FIRST instant the day hits
    its peak.

    Scale: the sweep is HIERARCHICAL (round-14, guide §2.2): boundary
    points partition by (day, hour-of-day) -- 24x the parallelism of
    the per-day sweep, whose task count was capped at the number of
    calendar days (measured: 30 tasks on 32 cores at the 100x replica,
    the whole residual cost of the query) -- each sub-bucket computes
    its own running sum, and an O(days x 24) prefix over per-bucket
    delta totals restores the day-global concurrency exactly:
    conc(row) = in-bucket running sum + exclusive prefix of prior
    buckets' net delta, since buckets tile the day in time order.
    Peak and first-peak-instant fold per bucket first (max struct),
    then across buckets with the same lexicographic trick, so every
    per-row quantity the flat sweep computed is reproduced bit-exact
    (row-identical at sf0.01/sf0.1/100x; 8.3 -> 4.7 s both-orders
    best-of-2 at 100x). At 100 TB a hot day degrades to 24 sorted
    sub-partitions instead of one."""
    sess = (
        sessionized(spark, sf_dir)
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    seg = sess.selectExpr(
        "user_id",
        "session_seq",
        f"explode(sequence(s_us DIV {_WEEK_US}, e_us DIV {_WEEK_US}))"
        " AS d",
        "s_us",
        "e_us",
    ).selectExpr(
        "user_id",
        "session_seq",
        "d",
        f"greatest(s_us, d * {_WEEK_US}) AS b_us",
        f"least(e_us, (d + 1) * {_WEEK_US} - 1) AS f_us",
    )
    # Both sweep boundary points come off ONE row via explode, not a
    # unionAll of two projections of `seg`: a union's legs are separate
    # plan subtrees, so the whole events scan -> sessionize window ->
    # span rollup pipeline above executed TWICE (plan-verified: two
    # full Scan->Exchange->Sort->Window->HashAggregate chains under the
    # Union; round-13 optimization, guide §2.4 "remove shuffles/passes
    # outright" -- 13.5 -> 10.0 s best-of-2 at the 100x scale test;
    # the residual cost is the per-day sweep sort itself).
    pts = seg.selectExpr(
        "d",
        "explode(array("
        "named_struct('t_us', b_us, 'delta', 1),"
        "named_struct('t_us', f_us + 1, 'delta', -1))) AS p",
        "user_id",
        "session_seq",
    ).selectExpr(
        "d", "p.t_us AS t_us", "p.delta AS delta", "user_id", "session_seq",
        # sub-bucket key: the global hour index is monotone in t_us and
        # constant across t_us ties, so concatenating (d, g) groups in
        # g order replays the day's boundary sequence exactly.  (The
        # -1 point at t = (d+1)*day lands in the NEXT day's first hour
        # index -- harmless: it still carries this row's d, and only
        # the within-d ORDER of g matters.)
        f"p.t_us DIV {_SWEEP_SUB_US} AS g",
    )
    wsub = (
        Window.partitionBy("d", "g")
        .orderBy("t_us", "delta", "user_id", "session_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Per-sub-bucket running sum; the day-global concurrency of every
    # row is rs + (net delta of all PRIOR buckets that day), restored
    # below by an exclusive prefix over the O(days x 24) rollup.
    run = pts.withColumn("rs", F.sum("delta").over(wsub))
    # The busiest instant needs only ONE aggregate pass, not a
    # whole-partition max() window feeding a conc = peak filter:
    # max(struct(rs, -t_us)) is lexicographically (max rs, then min
    # t_us among rows at that rs) -- within a bucket conc = rs + const,
    # so this IS the first instant the bucket hits its own peak
    # (round-13 optimization, guide §2.4; the window version
    # re-buffered every day's points just to stamp a constant on each
    # row). This groupBy rides the (d, g) window partitioning -- no
    # extra exchange.
    bkt = run.groupBy("d", "g").agg(
        F.sum("delta").alias("s"),
        F.expr("sum(CASE WHEN delta = 1 THEN 1L ELSE 0L END)").alias(
            "n_starts"
        ),
        F.max(F.struct(F.col("rs"), (-F.col("t_us")).alias("neg_t")))
        .alias("mx"),
    )
    wpre = (
        Window.partitionBy("d")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Day rollup over <= 25 bucket rows per day: bucket peak + prefix
    # offset is the day-global conc at that bucket's peak instant; the
    # same max(struct(conc, -t)) trick then picks the day peak and,
    # across tied buckets (disjoint, time-ordered), its earliest
    # instant -- bit-exact vs the flat per-day sweep.
    return (
        bkt.withColumn("p", F.coalesce(F.sum("s").over(wpre), F.lit(0)))
        .groupBy("d")
        .agg(
            F.sum("n_starts").alias("n_intervals"),
            F.max(
                F.struct(
                    (F.col("mx.rs") + F.col("p")).alias("conc"),
                    F.col("mx.neg_t").alias("neg_t"),
                )
            ).alias("mx"),
        )
        .selectExpr(
            "d",
            "n_intervals",
            "mx.conc AS peak_concurrency",
            "-mx.neg_t AS busiest_us",
        )
        .selectExpr(
            "date_add(DATE '1970-01-01', CAST(d AS INT)) AS day",
            "n_intervals",
            "peak_concurrency",
            "busiest_us",
        )
        .orderBy("day")
    )


PEAK_CONCURRENCY_SQL = f"""
WITH sess AS (
  SELECT user_id, ts,
         sum(CASE WHEN prev_us IS NULL
                  OR us - prev_us > {GAP_MINUTES * 60 * 1000000}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events)
), spans AS (
  SELECT user_id, session_seq,
         min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
  FROM sess GROUP BY 1, 2
), seg AS (
  SELECT user_id, session_seq,
         unnest(range(s_us // {_WEEK_US}, e_us // {_WEEK_US} + 1)) AS d,
         s_us, e_us
  FROM spans
), seg2 AS (
  SELECT user_id, session_seq, d,
         greatest(s_us, d * {_WEEK_US}) AS b_us,
         least(e_us, (d + 1) * {_WEEK_US} - 1) AS f_us
  FROM seg
), pts AS (
  SELECT d, b_us AS t_us, 1 AS delta, user_id, session_seq FROM seg2
  UNION ALL
  SELECT d, f_us + 1, -1, user_id, session_seq FROM seg2
), run AS (
  SELECT d, t_us, delta,
         sum(delta) OVER (PARTITION BY d
                          ORDER BY t_us, delta, user_id, session_seq
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
), run2 AS (
  SELECT *, max(conc) OVER (PARTITION BY d) AS peak FROM run
)
SELECT DATE '1970-01-01' + CAST(d AS INT) AS day,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_intervals,
       CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(min(CASE WHEN conc = peak THEN t_us END) AS BIGINT)
         AS busiest_us
FROM run2 GROUP BY d ORDER BY day
"""


# --------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences.
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev event type -> next event type) transition counts and
    probabilities over each user's time-ordered event sequence -- the
    sequence model behind 'is this ORDER of actions normal?', which the
    reference's per-event independence assumption (services/
    fraud_service/app/main.py:100-104 scores each message alone) cannot
    ask: a purchase right after a signup and a purchase after a long
    click trail carry identical features there.

    Exactness: the sequence order is the unique total key (ts,
    event_id), so both engines pair identical neighbors; counts and the
    floor-ppm row-conditional probabilities are integer end to end.
    Scale: ONE user-keyed shuffle (the lag window); everything after is
    an O(|types|^2) aggregate with map-side partials and an O(|types|)
    broadcast join for the row totals -- no global window, no second
    corpus shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .selectExpr(
            "prev_type",
            "next_type",
            "n_trans",
            "n_from",
            "n_trans * 1000000 DIV n_from AS prob_ppm",
        )
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITION_SQL = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), c AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_from
  FROM c GROUP BY 1
)
SELECT c.prev_type, c.next_type, c.n_trans, t.n_from,
       CAST(c.n_trans * 1000000 // t.n_from AS BIGINT) AS prob_ppm
FROM c JOIN t USING (prev_type)
ORDER BY c.prev_type, c.next_type
"""


# --------------------------------------------------------------------------
# Funnel stage latency distribution (order-of-magnitude histogram).
def conversion_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How LONG each funnel stage takes, as an order-of-magnitude
    histogram -- the companion to conversion_funnel's pure counts: per
    user, the first click after signup and the first purchase after
    that click (identical stage semantics), then the two stage
    latencies bucketed by their decimal digit count in whole seconds
    (1 = under 10 s, ..., 7 = megaseconds). Conversion RATES without
    latency hide a stalled funnel; digit buckets keep the output
    bounded at any scale.

    Exactness: latencies are floor-integer seconds from microsecond
    arithmetic (strictly positive by the stage definition, so floor ==
    truncation in both engines) and the bucket is the BIGINT's decimal
    image length; min/max/sum per bucket are integer-exact. Scale: the
    same single user-keyed aggregate as conversion_funnel (higher-order
    array expressions, no re-shuffle), then an O(stages x 7) rollup."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("t_signup"),
        F.collect_list(
            F.when(
                F.col("event_type").isin("click", "purchase"),
                F.struct("ts", "event_type"),
            )
        ).alias("evs"),
    )
    staged = per_user.selectExpr(
        "t_signup",
        "evs",
        "array_min(transform(filter(evs, e -> e.event_type = 'click'"
        " AND e.ts > t_signup), e -> e.ts)) AS t_click",
    ).selectExpr(
        "t_signup",
        "t_click",
        "array_min(transform(filter(evs, e -> e.event_type = 'purchase'"
        " AND e.ts > t_click), e -> e.ts)) AS t_purchase",
    )
    lats = staged.selectExpr(
        "stack(2,"
        " 'signup_to_click',"
        " (unix_micros(t_click) - unix_micros(t_signup)) DIV 1000000,"
        " 'click_to_purchase',"
        " (unix_micros(t_purchase) - unix_micros(t_click)) DIV 1000000"
        ") AS (stage, lat_s)"
    ).filter(F.col("lat_s").isNotNull())
    return (
        lats.groupBy(
            "stage",
            F.expr("length(CAST(lat_s AS STRING))").alias("digits"),
        )
        .agg(
            F.count("*").alias("n_users"),
            F.min("lat_s").alias("min_s"),
            F.max("lat_s").alias("max_s"),
            F.sum("lat_s").alias("sum_s"),
        )
        .orderBy("stage", "digits")
    )


CONVERSION_LATENCY_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         list(CASE WHEN event_type IN ('click', 'purchase')
                   THEN {'ts': ts, 'event_type': event_type} END)
           AS evs
  FROM events GROUP BY 1
), s1 AS (
  SELECT t_signup, evs,
         list_min(list_transform(list_filter(evs,
             e -> e IS NOT NULL AND e.event_type = 'click'
                  AND e.ts > t_signup), e -> e.ts)) AS t_click
  FROM per_user
), s2 AS (
  SELECT t_signup, t_click,
         list_min(list_transform(list_filter(evs,
             e -> e IS NOT NULL AND e.event_type = 'purchase'
                  AND e.ts > t_click), e -> e.ts)) AS t_purchase
  FROM s1
), lats AS (
  SELECT 'signup_to_click' AS stage,
         (epoch_us(t_click) - epoch_us(t_signup)) // 1000000 AS lat_s
  FROM s2
  UNION ALL
  SELECT 'click_to_purchase',
         (epoch_us(t_purchase) - epoch_us(t_click)) // 1000000
  FROM s2
)
SELECT stage,
       CAST(length(CAST(lat_s AS VARCHAR)) AS INT) AS digits,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(lat_s) AS BIGINT) AS min_s,
       CAST(max(lat_s) AS BIGINT) AS max_s,
       CAST(sum(lat_s) AS BIGINT) AS sum_s
FROM lats WHERE lat_s IS NOT NULL
GROUP BY 1, 2 ORDER BY stage, digits
"""


# --------------------------------------------------------------------------
SAX_SEGMENTS = 6
SAX_SEG_DAYS = 5
# share-of-activity breakpoints (ppm of the user's total, 4 symbols):
# uniform share is 1/6 ~ 166,667 ppm; a=quiet, b=below-par, c=par,
# d=burst. Fixed constants so both engines symbolize identically.
SAX_BREAKS = (100_000, 166_667, 250_000)


def _sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series SHAPE similarity words (SAX-style symbolization --
    the indexable form of time-series similarity search): each user's
    event stream becomes a 30-day activity vector, PAA-compressed into
    SAX_SEGMENTS 5-day segment shares (integer ppm of the user's own
    total, so shape is scale-free without float z-normalization), each
    share symbolized by fixed breakpoints into a/b/c/d, and the
    concatenated word is the user's shape signature. Users sharing a
    word are each other's similarity CANDIDATES -- the same
    bucket-then-verify economics as MinHash banding, for behavior
    shapes instead of text. Output: the shape-bucket census (word,
    users, total events) -- bucket sizes ARE the candidate-set costs a
    verify stage would pay.

    Scale shape: one (user, segment) keyed count does the corpus-sized
    work; the dense 6-segment frame comes from a broadcast VALUES cross
    join against the O(users) totals (the threshold_sweep pattern);
    symbolization and the word build are fixed-width conditional
    aggregates. All integer math -- both engines bucket identically."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min(F.to_date("ts")).alias("_d0"))
    seg_counts = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.expr(
                f"CAST(datediff(to_date(ts), _d0) DIV {SAX_SEG_DAYS}"
                " AS INT)"
            ).alias("seg"),
        )
        .filter(F.col("seg") < SAX_SEGMENTS)
        .groupBy("user_id", "seg")
        .agg(F.count("*").alias("c"))
        # cache(): totals and the dense grid's left join both consume
        # this O(users x segments) frame, and uncached each re-ran the
        # events scan + anchor subquery + keyed count under it (the
        # plan scanned events four times; round-13 optimization, guide
        # §2.4) -- every _sax_words consumer (buckets / matches /
        # recall) rides this
        .cache()
    )
    totals = seg_counts.groupBy("user_id").agg(
        F.sum("c").alias("total")
    )
    segs = spark.range(SAX_SEGMENTS).select(
        F.col("id").cast("int").alias("seg")
    )
    dense = (
        totals.crossJoin(F.broadcast(segs))
        .join(seg_counts, ["user_id", "seg"], "left")
        .select(
            "user_id",
            "seg",
            "total",
            (F.coalesce(F.col("c"), F.lit(0)) * 1_000_000)
            .cast("bigint").alias("share_num"),
        )
        .selectExpr(
            "user_id",
            "seg",
            "total",
            "share_num DIV total AS share_ppm",
        )
    )
    b1, b2, b3 = SAX_BREAKS
    sym = (
        F.when(F.col("share_ppm") < b1, F.lit("a"))
        .when(F.col("share_ppm") < b2, F.lit("b"))
        .when(F.col("share_ppm") < b3, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    words = (
        dense.withColumn("sym", sym)
        .groupBy("user_id", "total")
        .agg(
            *[
                F.max(F.when(F.col("seg") == i, F.col("sym")))
                .alias(f"s{i}")
                for i in range(SAX_SEGMENTS)
            ],
            *[
                F.max(
                    F.when(F.col("seg") == i, F.col("share_ppm"))
                ).alias(f"p{i}")
                for i in range(SAX_SEGMENTS)
            ],
        )
        .select(
            "user_id",
            "total",
            F.concat(*[F.col(f"s{i}") for i in range(SAX_SEGMENTS)])
            .alias("sax_word"),
            *[F.col(f"p{i}") for i in range(SAX_SEGMENTS)],
        )
    )
    return words


def activity_shape_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shape-bucket census over _sax_words (see module constants):
    word, users, total events, example user."""
    words = _sax_words(spark, sf_dir)
    return (
        words.groupBy("sax_word")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("total").alias("n_events"),
            F.min("user_id").alias("example_user"),
        )
        .orderBy(F.col("n_users").desc(), F.col("sax_word"))
    )


SAX_NEIGHBORHOOD = 8


def activity_shape_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of SAX bucket-then-verify: within each shape
    bucket, each user's L1-nearest partner over the 6 PAA shares
    (integer ppm; ties break on the smaller partner id so both engines
    pick identically), with candidates confined to the SORTED
    NEIGHBORHOOD -- the +/-SAX_NEIGHBORHOOD adjacent users under the
    bucket's (p0..p5, user_id) lexicographic sort (classic
    sorted-neighborhood blocking). All-pairs within buckets measured
    64 s at the 100x scale test (the top bucket holds 2% of all users,
    so sum(n^2) ~ 162M pairs and grows quadratically with users);
    the sorted neighborhood is O(n log n) sort + O(n * 2W) exact L1
    comparisons -- linear in users at ANY scale -- and finds the true
    nearest neighbor whenever it is adjacent in shape order (the same
    measured-recall honesty as the LSH banding stages).

    Output: one row per user with >= 1 bucket-mate (user_id, its
    nearest sorted-neighborhood partner, the shared word, l1_ppm)."""
    return _shape_matches_frame(_sax_words(spark, sf_dir))


def _shape_matches_frame(words: DataFrame) -> DataFrame:
    """``activity_shape_matches`` body over a caller-supplied words
    frame -- split out so shape_match_recall can share ONE cached
    _sax_words evaluation across its truth and match legs instead of
    re-deriving the words subtree (a full events pass) per leg."""
    from pyspark.sql.window import Window
    order_cols = [F.col(f"p{i}") for i in range(SAX_SEGMENTS)] + [
        F.col("user_id")
    ]
    w_sort = (
        Window.partitionBy("sax_word")
        .orderBy(*order_cols)
        .rowsBetween(-SAX_NEIGHBORHOOD, SAX_NEIGHBORHOOD)
    )
    cand_struct = F.struct(
        F.col("user_id").alias("u"),
        *[F.col(f"p{i}").alias(f"q{i}") for i in range(SAX_SEGMENTS)],
    )
    ex = (
        words.withColumn("cs", F.collect_list(cand_struct).over(w_sort))
        .select(
            "user_id", "sax_word",
            *[F.col(f"p{i}") for i in range(SAX_SEGMENTS)],
            F.explode("cs").alias("c"),
        )
        .filter(F.col("c.u") != F.col("user_id"))
    )
    l1 = sum(
        F.abs(F.col(f"p{i}") - F.col(f"c.q{i}"))
        for i in range(SAX_SEGMENTS)
    )
    pairs = ex.select(
        "user_id", "sax_word",
        F.col("c.u").alias("user_b"),
        l1.cast("bigint").alias("l1_ppm"),
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("l1_ppm").asc(), F.col("user_b").asc()
    )
    return (
        pairs.withColumn("_r", F.row_number().over(w_pick))
        .filter(F.col("_r") == 1)
        .select(
            "user_id",
            F.col("user_b").alias("nearest_user"),
            "sax_word",
            "l1_ppm",
        )
        .orderBy("user_id")
    )


SAX_SAMPLE_MOD = 16


def shape_match_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the sorted-neighborhood match: for a
    deterministic md5 sample (~1/SAX_SAMPLE_MOD) of users, the true
    bucket nearest-neighbor distance comes from an all-pairs pass of
    the SAMPLED users against their buckets (bounded: sample_size x
    max bucket, fixed fraction of users regardless of corpus size),
    and the operator's sorted-neighborhood distance is compared to it.
    One row: sampled users with mates, how many the neighborhood got
    exactly right (same L1), recall ppm, and the mean excess distance
    ppm when it missed -- the quality number next to the 10x speed
    number (64 -> 6.2 s per 100x run), same contract as
    ann_recall_eval / minhash_lsh_recall."""
    # ONE cached _sax_words evaluation (O(users) rows) feeds the truth
    # join's both sides AND the sorted-neighborhood leg -- uncached,
    # the words subtree (a full events pass + segment pivot) appeared
    # THREE times in the plan (guide 2.4 duplicate subtrees).
    words = _sax_words(spark, sf_dir).cache()
    sampled = words.filter(
        F.expr(
            "CAST(conv(substr(md5(concat('smp:', CAST(user_id AS STRING)))"
            f", 1, 6), 16, 10) AS BIGINT) % {SAX_SAMPLE_MOD} = 0"
        )
    )
    a = sampled.select(
        F.col("sax_word"),
        F.col("user_id").alias("ua"),
        *[F.col(f"p{i}").alias(f"a{i}") for i in range(SAX_SEGMENTS)],
    )
    b = words.select(
        F.col("sax_word"),
        F.col("user_id").alias("ub"),
        *[F.col(f"p{i}").alias(f"b{i}") for i in range(SAX_SEGMENTS)],
    )
    l1 = sum(
        F.abs(F.col(f"a{i}") - F.col(f"b{i}"))
        for i in range(SAX_SEGMENTS)
    )
    truth = (
        a.join(b, "sax_word")
        .filter(F.col("ua") != F.col("ub"))
        .groupBy(F.col("ua").alias("user_id"))
        .agg(F.min(l1.cast("bigint")).alias("true_l1"))
    )
    sn = _shape_matches_frame(words).select(
        "user_id", F.col("l1_ppm").alias("sn_l1")
    )
    return (
        truth.join(sn, "user_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(
                F.when(F.col("sn_l1") == F.col("true_l1"), 1).otherwise(0)
            ).alias("n_exact"),
            F.sum(F.col("sn_l1") - F.col("true_l1")).alias("_excess"),
        )
        .selectExpr(
            "CAST(n_sampled AS BIGINT) AS n_sampled",
            "CAST(n_exact AS BIGINT) AS n_exact",
            "CAST(n_exact * 1000000 DIV n_sampled AS BIGINT) AS recall_ppm",
            "CAST(_excess DIV n_sampled AS BIGINT) AS avg_excess_ppm",
        )
    )


ACTIVITY_SHAPE_SQL = f"""
WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
seg_counts AS (
  SELECT user_id,
         CAST(datediff('day', (SELECT d0 FROM anchor),
                       CAST(ts AS DATE)) // {SAX_SEG_DAYS} AS INT) AS seg,
         count(*) AS c
  FROM events
  WHERE CAST(datediff('day', (SELECT d0 FROM anchor),
                      CAST(ts AS DATE)) // {SAX_SEG_DAYS} AS INT)
        < {SAX_SEGMENTS}
  GROUP BY 1, 2
),
totals AS (SELECT user_id, sum(c) AS total FROM seg_counts GROUP BY 1),
dense AS (
  SELECT t.user_id, s.seg, t.total,
         CAST(COALESCE(sc.c, 0) * 1000000 AS BIGINT) // t.total
           AS share_ppm
  FROM totals t
  CROSS JOIN (SELECT unnest(range({SAX_SEGMENTS})) AS seg) s
  LEFT JOIN seg_counts sc
    ON sc.user_id = t.user_id AND sc.seg = s.seg
),
syms AS (
  SELECT user_id, seg, total,
         CASE WHEN share_ppm < {SAX_BREAKS[0]} THEN 'a'
              WHEN share_ppm < {SAX_BREAKS[1]} THEN 'b'
              WHEN share_ppm < {SAX_BREAKS[2]} THEN 'c'
              ELSE 'd' END AS sym
  FROM dense
),
words AS (
  SELECT user_id, total,
         {" || ".join(f"max(CASE WHEN seg = {i} THEN sym END)" for i in range(6))}
           AS sax_word
  FROM syms GROUP BY user_id, total
)
SELECT sax_word,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(total) AS BIGINT) AS n_events,
       min(user_id) AS example_user
FROM words
GROUP BY 1
ORDER BY n_users DESC, sax_word
"""


ACTIVITY_MATCHES_SQL = f"""
WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
seg_counts AS (
  SELECT user_id,
         CAST(datediff('day', (SELECT d0 FROM anchor),
                       CAST(ts AS DATE)) // 5 AS INT) AS seg,
         count(*) AS c
  FROM events
  WHERE CAST(datediff('day', (SELECT d0 FROM anchor),
                      CAST(ts AS DATE)) // 5 AS INT) < 6
  GROUP BY 1, 2
),
totals AS (SELECT user_id, sum(c) AS total FROM seg_counts GROUP BY 1),
dense AS (
  SELECT t.user_id, s.seg, t.total,
         CAST(COALESCE(sc.c, 0) * 1000000 AS BIGINT) // t.total
           AS share_ppm
  FROM totals t
  CROSS JOIN (SELECT unnest(range(6)) AS seg) s
  LEFT JOIN seg_counts sc
    ON sc.user_id = t.user_id AND sc.seg = s.seg
),
syms AS (
  SELECT user_id, seg, share_ppm,
         CASE WHEN share_ppm < {SAX_BREAKS[0]} THEN 'a'
              WHEN share_ppm < {SAX_BREAKS[1]} THEN 'b'
              WHEN share_ppm < {SAX_BREAKS[2]} THEN 'c'
              ELSE 'd' END AS sym
  FROM dense
),
words AS (
  SELECT user_id,
         max(CASE WHEN seg = 0 THEN sym END) || max(CASE WHEN seg = 1 THEN sym END) || max(CASE WHEN seg = 2 THEN sym END) || max(CASE WHEN seg = 3 THEN sym END) || max(CASE WHEN seg = 4 THEN sym END) || max(CASE WHEN seg = 5 THEN sym END) AS sax_word,
         max(CASE WHEN seg = 0 THEN share_ppm END) AS p0,
         max(CASE WHEN seg = 1 THEN share_ppm END) AS p1,
         max(CASE WHEN seg = 2 THEN share_ppm END) AS p2,
         max(CASE WHEN seg = 3 THEN share_ppm END) AS p3,
         max(CASE WHEN seg = 4 THEN share_ppm END) AS p4,
         max(CASE WHEN seg = 5 THEN share_ppm END) AS p5
  FROM syms GROUP BY user_id
),
cands AS (
  SELECT user_id, sax_word, p0, p1, p2, p3, p4, p5,
         array_agg(struct_pack(u := user_id, q0 := p0, q1 := p1, q2 := p2, q3 := p3, q4 := p4, q5 := p5))
           OVER (PARTITION BY sax_word ORDER BY p0, p1, p2, p3, p4, p5, user_id
                 ROWS BETWEEN {SAX_NEIGHBORHOOD} PRECEDING
                          AND {SAX_NEIGHBORHOOD} FOLLOWING) AS cs
  FROM words
),
ex AS (
  SELECT user_id, sax_word, p0, p1, p2, p3, p4, p5, unnest(cs) AS c FROM cands
),
pairs AS (
  SELECT w.user_id, w.sax_word, w.c.u AS user_b,
         CAST(abs(w.p0 - w.c.q0) + abs(w.p1 - w.c.q1) + abs(w.p2 - w.c.q2) + abs(w.p3 - w.c.q3) + abs(w.p4 - w.c.q4) + abs(w.p5 - w.c.q5) AS BIGINT) AS l1_ppm
  FROM ex w WHERE w.c.u <> w.user_id
),
ranked AS (
  SELECT user_id, user_b, sax_word, l1_ppm,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY l1_ppm ASC, user_b ASC) AS r
  FROM pairs
)
SELECT user_id, user_b AS nearest_user, sax_word, l1_ppm
FROM ranked WHERE r = 1
ORDER BY user_id
"""


SHAPE_MATCH_RECALL_SQL = f"""
WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
seg_counts AS (
  SELECT user_id,
         CAST(datediff('day', (SELECT d0 FROM anchor),
                       CAST(ts AS DATE)) // 5 AS INT) AS seg,
         count(*) AS c
  FROM events
  WHERE CAST(datediff('day', (SELECT d0 FROM anchor),
                      CAST(ts AS DATE)) // 5 AS INT) < 6
  GROUP BY 1, 2
),
totals AS (SELECT user_id, sum(c) AS total FROM seg_counts GROUP BY 1),
dense AS (
  SELECT t.user_id, s.seg, t.total,
         CAST(COALESCE(sc.c, 0) * 1000000 AS BIGINT) // t.total
           AS share_ppm
  FROM totals t
  CROSS JOIN (SELECT unnest(range(6)) AS seg) s
  LEFT JOIN seg_counts sc
    ON sc.user_id = t.user_id AND sc.seg = s.seg
),
syms AS (
  SELECT user_id, seg, share_ppm,
         CASE WHEN share_ppm < {SAX_BREAKS[0]} THEN 'a'
              WHEN share_ppm < {SAX_BREAKS[1]} THEN 'b'
              WHEN share_ppm < {SAX_BREAKS[2]} THEN 'c'
              ELSE 'd' END AS sym
  FROM dense
),
words AS (
  SELECT user_id,
         max(CASE WHEN seg = 0 THEN sym END) || max(CASE WHEN seg = 1 THEN sym END) || max(CASE WHEN seg = 2 THEN sym END) || max(CASE WHEN seg = 3 THEN sym END) || max(CASE WHEN seg = 4 THEN sym END) || max(CASE WHEN seg = 5 THEN sym END) AS sax_word,
         max(CASE WHEN seg = 0 THEN share_ppm END) AS p0,
         max(CASE WHEN seg = 1 THEN share_ppm END) AS p1,
         max(CASE WHEN seg = 2 THEN share_ppm END) AS p2,
         max(CASE WHEN seg = 3 THEN share_ppm END) AS p3,
         max(CASE WHEN seg = 4 THEN share_ppm END) AS p4,
         max(CASE WHEN seg = 5 THEN share_ppm END) AS p5
  FROM syms GROUP BY user_id
),
cands AS (
  SELECT user_id, sax_word, p0, p1, p2, p3, p4, p5,
         array_agg(struct_pack(u := user_id, q0 := p0, q1 := p1, q2 := p2, q3 := p3, q4 := p4, q5 := p5))
           OVER (PARTITION BY sax_word ORDER BY p0, p1, p2, p3, p4, p5, user_id
                 ROWS BETWEEN {SAX_NEIGHBORHOOD} PRECEDING
                          AND {SAX_NEIGHBORHOOD} FOLLOWING) AS cs
  FROM words
),
ex AS (
  SELECT user_id, sax_word, p0, p1, p2, p3, p4, p5, unnest(cs) AS c FROM cands
),
pairs AS (
  SELECT w.user_id, w.sax_word, w.c.u AS user_b,
         CAST(abs(w.p0 - w.c.q0) + abs(w.p1 - w.c.q1) + abs(w.p2 - w.c.q2) + abs(w.p3 - w.c.q3) + abs(w.p4 - w.c.q4) + abs(w.p5 - w.c.q5) AS BIGINT) AS l1_ppm
  FROM ex w WHERE w.c.u <> w.user_id
),
ranked AS (
  SELECT user_id, user_b, l1_ppm,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY l1_ppm ASC, user_b ASC) AS r
  FROM pairs
),
sn AS (SELECT user_id, l1_ppm AS sn_l1 FROM ranked WHERE r = 1),
sample AS (
  SELECT user_id FROM words
  WHERE CAST('0x' || substr(md5('smp:' || CAST(user_id AS VARCHAR)), 1, 6)
             AS BIGINT) % {SAX_SAMPLE_MOD} = 0
),
truth AS (
  SELECT a.user_id AS user_id,
         min(CAST(abs(a.p0 - b.p0) + abs(a.p1 - b.p1) + abs(a.p2 - b.p2) + abs(a.p3 - b.p3) + abs(a.p4 - b.p4) + abs(a.p5 - b.p5) AS BIGINT)) AS true_l1
  FROM words a JOIN words b
    ON a.sax_word = b.sax_word AND a.user_id <> b.user_id
  WHERE a.user_id IN (SELECT user_id FROM sample)
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN sn.sn_l1 = t.true_l1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN sn.sn_l1 = t.true_l1 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS recall_ppm,
       CAST(sum(sn.sn_l1 - t.true_l1) // count(*) AS BIGINT)
         AS avg_excess_ppm
FROM truth t JOIN sn ON sn.user_id = t.user_id
"""


# --------------------------------------------------------------------------
PATH_MAX_STEPS = 5  # sessions compare by their OPENING path
PATH_TOPK = 15


def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the {PATH_TOPK} most common within-session
    event-type sequences (each session keyed by its OPENING path --
    the first {PATH_MAX_STEPS} steps in (ts, event_id) order, joined
    with '>'), with session counts and integer-ppm share of all
    sessions. event_transition_matrix answers 'what follows a click'
    one hop at a time; this answers 'what do whole journeys look
    like' -- the product-analytics view that finds dead-end and
    looping flows.

    Determinism: step order is (ts, event_id) exactly like the
    sessionizer itself, so equal-timestamp events replay identically;
    counts and the floor-ppm share are pure integers. Scale shape: the
    session assignment's ONE user-keyed window, then a per-session
    collect bounded at {PATH_MAX_STEPS} steps after an in-aggregate
    sort of the session's own events (per-session frames are
    gap-bounded), one path-keyed count, and a TakeOrdered top-k; the
    total-sessions scalar rides a window over the O(distinct paths)
    rollup, never a second scan."""
    from pyspark.sql.window import Window as W

    sess = sessionized(spark, sf_dir).filter(F.col("user_id").isNotNull())
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.expr(
                "array_join(transform(slice(sort_array("
                "collect_list(struct(ts, event_id, event_type))),"
                f" 1, {PATH_MAX_STEPS}), s -> s.event_type), '>')"
            ).alias("path")
        )
    )
    rolled = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    total = W.partitionBy()
    return (
        rolled.withColumn(
            "share_ppm",
            F.expr(
                "CAST(n_sessions * 1000000 DIV"
                " sum(n_sessions) OVER () AS BIGINT)"
            ),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOPK)
    )


TOP_SESSION_PATHS_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {GAP_MINUTES * 60 * 1000000}
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM marked
),
paths AS (
  SELECT array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{PATH_MAX_STEPS}],
           '>') AS path
  FROM sessions
  GROUP BY user_id, session_seq
),
rolled AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_sessions * 1000000 // sum(n_sessions) OVER () AS BIGINT)
         AS share_ppm
FROM rolled
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOPK}
"""

QUERIES = {
    "top_session_paths": top_session_paths,
    "user_sessions": user_sessions,
    "session_summary": session_summary,
    "conversion_funnel": conversion_funnel,
    "weekly_retention_cohorts": weekly_retention_cohorts,
    "survival_weekly": survival_weekly,
    "peak_concurrency": peak_concurrency,
    "event_transition_matrix": event_transition_matrix,
    "conversion_latency_buckets": conversion_latency_buckets,
    "activity_shape_buckets": activity_shape_buckets,
    "activity_shape_matches": activity_shape_matches,
    "shape_match_recall": shape_match_recall,
}

ORACLE = {
    "top_session_paths": TOP_SESSION_PATHS_SQL,
    "user_sessions": USER_SESSIONS_SQL,
    "session_summary": SESSION_SUMMARY_SQL,
    "conversion_funnel": CONVERSION_FUNNEL_SQL,
    "weekly_retention_cohorts": WEEKLY_RETENTION_SQL,
    "survival_weekly": SURVIVAL_WEEKLY_SQL,
    "peak_concurrency": PEAK_CONCURRENCY_SQL,
    "event_transition_matrix": EVENT_TRANSITION_SQL,
    "conversion_latency_buckets": CONVERSION_LATENCY_SQL,
    "activity_shape_buckets": ACTIVITY_SHAPE_SQL,
    "activity_shape_matches": ACTIVITY_MATCHES_SQL,
    "shape_match_recall": SHAPE_MATCH_RECALL_SQL,
}
