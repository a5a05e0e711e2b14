"""Exact distributional statistics: grouped median without
interpolation drift, Pearson co-movement with exact integer moments,
and gaps-and-islands streak census.

Why these are engine work and not "just SQL":

* ``exact_median_by_type`` -- the exact companion to the GK-sketch
  ``approx_value_quantiles`` (temporal.py): per-group median as the
  average of the middle ranks, computed wholly in integer cents so
  Spark and DuckDB cannot disagree on interpolation. The corpus-sized
  work is ONE keyed hash aggregate into a (group, cents) histogram --
  bounded by the value DOMAIN, not the row count -- and the rank walk
  is a cumulative sum over that histogram; exactness costs one extra
  shuffle vs the sketch, never a per-group row sort.

* ``event_comovement_corr`` -- "do error days co-move with click
  days": Pearson r over the dense per-day count grid for every
  unordered pair of event types. All five moment sums (n, Sx, Sy,
  Sxy, Sxx, Syy) are exact BIGINTs; the only floating step is the
  final  num / sqrt(d1 * d2)  where casts, multiply, divide and sqrt
  are all IEEE-754 correctly-rounded operations, so both engines
  produce the identical double and the floor-ppm output matches
  bit-for-bit. The corpus-sized work is ONE (day, type) keyed count;
  everything after runs on the O(days x types) grid.

* ``activity_islands`` -- gaps-and-islands: per-user runs of
  consecutive active days via the rank-difference trick (island id =
  epoch_day - dense_rank), then a streak-length census. Distinct
  user-days collapse first (keyed agg), the window partitions by
  user (keyed shuffle, bounded per-user frames), and the output is
  O(max streak length) rows.

The same exact-integer discipline extends to the rest of the module:
``daily_value_percentiles`` (nearest-rank, ceil in integer math),
``daily_trend_slopes`` (OLS entirely in BIGINT floor division),
``last_touch_attribution`` (as-of credit in one keyed window, exact
cents), and ``time_weighted_value`` (LOCF microsecond weights summed
as DECIMAL(38,0)/HUGEINT).

The reference's schema keeps only a flat predictions table
(services/db/init.sql:1-31) and its one scheduled rollup is a daily
GROUP BY (dags/compute-daily-metrics.py:19-37); these are the
distributional questions the same store gets asked next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

CORR_PPM = 1_000_000


# --------------------------------------------------------------------------
def exact_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type median of ``value``, tie-free by
    construction: values move to integer cents and collapse to a
    (type, cents) count histogram; each bucket covers the rank range
    (lo, hi] from a cumulative sum, and the median is the mean of the
    buckets holding the middle one (odd n) or two (even n) ranks --
    kept in integer space and emitted as ``mx2 / 200.0`` (exact int ->
    double cast, one correctly-rounded division; no round() boundary
    anywhere)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    # histogram-of-cents form: the per-row sort a naive ranked window
    # needs would funnel each event type into ONE task (measured 32 s
    # at the 100x scale test); collapsing to (type, cents) counts
    # first makes the corpus work a keyed hash aggregate and the rank
    # walk a window over the bounded VALUE-DOMAIN histogram
    hist = (
        ev.selectExpr(
            "event_type",
            "CAST(round(value * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("c"))
    )
    wo = Window.partitionBy("event_type").orderBy("cents")
    ranked = hist.select(
        "event_type",
        "cents",
        (F.sum("c").over(wo) - F.col("c")).alias("lo"),  # ranks (lo, hi]
        F.sum("c").over(wo).alias("hi"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    # middle ranks via integer floor division, NOT cast-of-quotient:
    # CAST(1003.5 AS BIGINT) truncates in Spark but rounds in DuckDB
    mid = ranked.filter(
        (
            (F.expr("(n + 1) div 2") > F.col("lo"))
            & (F.expr("(n + 1) div 2") <= F.col("hi"))
        )
        | (
            (F.expr("(n + 2) div 2") > F.col("lo"))
            & (F.expr("(n + 2) div 2") <= F.col("hi"))
        )
    )
    return (
        mid.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            # both middle ranks in one cents bucket -> 2x it; split
            # across two buckets -> their sum
            F.expr(
                "CAST(sum(cents) * (3 - count(*)) AS BIGINT)"
            ).alias("mx2"),
        )
        .selectExpr(
            "event_type",
            "n_events",
            "CAST(mx2 AS DOUBLE) / 200 AS median_value",
        )
        .orderBy("event_type")
    )


EXACT_MEDIAN_SQL = """
WITH hist AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, cents,
         sum(c) OVER (PARTITION BY event_type ORDER BY cents) - c AS lo,
         sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS hi,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM hist
),
mid AS (
  SELECT * FROM ranked
  WHERE ((n + 1) // 2 > lo AND (n + 1) // 2 <= hi)
     OR ((n + 2) // 2 > lo AND (n + 2) // 2 <= hi)
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(CAST(sum(cents) * (3 - count(*)) AS BIGINT) AS DOUBLE) / 200
         AS median_value
FROM mid GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
def event_comovement_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of the per-day event counts for every
    unordered pair of event types, over the dense day grid (absent
    (day, type) cells count 0 -- without the zero fill the pair rows
    would silently misalign).

    r_ppm = floor( (num / sqrt(d1 * d2)) * 1e6 ) with
    num = n*Sxy - Sx*Sy, d1 = n*Sxx - Sx^2, d2 = n*Syy - Sy^2, all
    exact BIGINTs; the double steps (cast, *, /, sqrt, floor) are each
    IEEE-754 correctly rounded, hence bit-identical across engines.
    Constant pairs (d1*d2 = 0) emit NULL."""
    ev = load_table(spark, sf_dir, "events")
    # cache() the two BOUNDED frames (days x types rows -- the day grid
    # grows with the calendar, not the corpus): `daily` fed three
    # consumers (days, types, the grid left join) and `grid` two (both
    # pair legs), and uncached every reference re-ran the full events
    # scan + aggregate underneath -- the plan scanned events SIX times
    # (round-13 optimization, guide §2.4/§5 bounded-cache pattern).
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n")).cache()
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
        .cache()
    )
    a = grid.selectExpr("day", "event_type AS ta", "n AS x")
    b = grid.selectExpr("day", "event_type AS tb", "n AS y")
    pairs = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    return (
        pairs.groupBy("ta", "tb")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("y * y")).alias("syy"),
        )
        .selectExpr(
            "ta AS type_a",
            "tb AS type_b",
            "n_days",
            "CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num",
            f"""CASE WHEN (n_days * sxx - sx * sx) * CAST(n_days * syy - sy * sy AS DOUBLE) > 0
                 THEN CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                      / sqrt((n_days * sxx - sx * sx)
                             * CAST(n_days * syy - sy * sy AS DOUBLE))
                      * {CORR_PPM}) AS BIGINT)
                 ELSE NULL END AS r_ppm""",
        )
        .orderBy("type_a", "type_b")
    )


COMOVEMENT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, t.event_type, coalesce(daily.n, 0) AS n
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
  LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type
),
pairs AS (
  SELECT a.ta, b.tb, a.x, b.y FROM
    (SELECT day, event_type AS ta, n AS x FROM grid) a
  JOIN
    (SELECT day, event_type AS tb, n AS y FROM grid) b
  USING (day)
  WHERE a.ta < b.tb
),
m AS (
  SELECT ta, tb, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, n_days,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num,
       CASE WHEN (n_days * sxx - sx * sx) * CAST(n_days * syy - sy * sy AS DOUBLE) > 0
            THEN CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / sqrt((n_days * sxx - sx * sx)
                        * CAST(n_days * syy - sy * sy AS DOUBLE))
                 * {CORR_PPM}) AS BIGINT)
            ELSE NULL END AS r_ppm
FROM m ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
def activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of consecutive-active-day streaks: for every user, runs
    of calendar days with at least one event (rank-difference islands:
    epoch_day - dense rank is constant within a run), then one row per
    streak length with how many streaks and how many distinct users
    reached it -- the engagement-depth table a retention model trains
    on."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    user_days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        )
        .distinct()
    )
    islands = user_days.select(
        "user_id",
        (
            F.col("d")
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("d")
            )
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_days")
    )
    return (
        streaks.groupBy("streak_days")
        .agg(
            F.count("*").alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("streak_days")
    )


ACTIVITY_ISLANDS_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events WHERE user_id IS NOT NULL
),
islands AS (
  SELECT user_id,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM user_days
),
streaks AS (
  SELECT user_id, island, count(*) AS streak_days
  FROM islands GROUP BY 1, 2
)
SELECT streak_days, count(*) AS n_streaks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks GROUP BY 1 ORDER BY streak_days
"""


# --------------------------------------------------------------------------
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits its full
    value to the event type of the same user's most recent PRIOR
    non-purchase event ('direct' when there is none). One keyed window
    does the whole as-of -- the carried-forward last(ignorenulls) trick
    of asof_click_before_purchase (temporal.py:49) generalized from one
    channel to all of them, still zero joins and ONE shuffle keyed on
    user_id.

    Determinism: equal-timestamp events order non-purchase-first (so
    a same-instant touch is credited, inclusive as-of) and break
    remaining ties by event_id (largest wins, both engines replay the
    identical ordering). Revenue folds as exact integer cents."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    tagged = ev.selectExpr(
        "user_id",
        "ts",
        "event_id",
        "CAST(event_type = 'purchase' AS INT) AS is_p",
        "event_type",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = tagged.select(
        "is_p",
        "cents",
        F.last(
            F.when(F.col("is_p") == 0, F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("touch"),
    )
    return (
        touched.filter(F.col("is_p") == 1)
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.expr("CAST(sum(cents) AS DOUBLE) / 100").alias("revenue"),
        )
        .orderBy("touch_type")
    )


LAST_TOUCH_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CAST(event_type = 'purchase' AS INT) AS is_p,
         event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
),
touched AS (
  SELECT is_p, cents,
         last_value(CASE WHEN is_p = 0 THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch
  FROM tagged
)
SELECT coalesce(touch, 'direct') AS touch_type,
       count(*) AS n_purchases,
       CAST(sum(cents) AS DOUBLE) / 100 AS revenue
FROM touched WHERE is_p = 1
GROUP BY 1 ORDER BY touch_type
"""


# --------------------------------------------------------------------------
_POS_SHARE = """CASE
  WHEN m = 1 THEN 1000000
  WHEN m = 2 THEN 500000
  WHEN pos = 1 OR pos = m THEN 400000
  ELSE 200000 DIV (m - 2)
       + CASE WHEN pos - 1 <= 200000 % (m - 2) THEN 1 ELSE 0 END
END"""


def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch revenue attribution --
    the multi-touch generalization of last_touch_attribution: each
    purchase's value splits 40% to the journey's FIRST touch, 40% to
    its LAST, 20% evenly across the middle (1 touch takes 100%, 2
    take 50/50, none credits 'direct'). A journey is the user's
    non-purchase events since their previous purchase, so every touch
    is credited at most once and every purchase's credit sums to
    exactly its value.

    Exactness: shares are integer ppm; the even middle split uses
    floor DIV with the remainder ppm going to the EARLIEST middle
    touches one-by-one (a deterministic rule both engines replay), so
    sum(share_ppm) == 1,000,000 per purchase by construction and
    credited cents fold as exact integers. Equal-timestamp events
    order non-purchase-first then by event_id -- the
    last_touch_attribution convention.

    Scale shape: journey ids are ONE user-keyed running sum of prior
    purchases (the same single shuffle the last-touch form pays);
    journey length and purchase value attach via (user, journey)
    keyed joins whose key space is purchases, and the rollup is
    O(event types)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    tagged = ev.selectExpr(
        "user_id",
        "ts",
        "event_id",
        "CAST(event_type = 'purchase' AS INT) AS is_p",
        "event_type",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "is_p", "event_id")
    jid = (
        tagged.withColumn(
            "jid",
            F.sum("is_p").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn("jid", F.coalesce("jid", F.lit(0)))
    )
    touches = (
        jid.filter("is_p = 0")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("user_id", "jid").orderBy(
                    "ts", "event_id"
                )
            ),
        )
        .withColumn(
            "m",
            F.count("*").over(Window.partitionBy("user_id", "jid")),
        )
        .select("user_id", "jid", "event_type", "pos", "m")
    )
    purchases = jid.filter("is_p = 1").select("user_id", "jid", "cents")
    credited = (
        purchases.join(touches, ["user_id", "jid"], "left")
        .selectExpr(
            "coalesce(event_type, 'direct') AS touch_type",
            f"cents * (CASE WHEN event_type IS NULL THEN 1000000"
            f" ELSE {_POS_SHARE} END) AS credit_fp",
        )
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.expr(
                "CAST(sum(credit_fp) DIV 1000000 AS BIGINT)"
            ).alias("credited_cents"),
        )
        .orderBy("touch_type")
    )


POSITION_ATTRIBUTION_SQL = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CAST(event_type = 'purchase' AS INT) AS is_p,
         event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
),
jid AS (
  SELECT *,
         coalesce(sum(is_p) OVER (PARTITION BY user_id
                                  ORDER BY ts, is_p, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS jid
  FROM tagged
),
touches AS (
  SELECT user_id, jid, event_type,
         row_number() OVER (PARTITION BY user_id, jid
                            ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id, jid) AS m
  FROM jid WHERE is_p = 0
),
credited AS (
  SELECT coalesce(t.event_type, 'direct') AS touch_type,
         p.cents * (CASE WHEN t.event_type IS NULL THEN 1000000
                    ELSE {_POS_SHARE.replace("DIV", "//")} END) AS credit_fp
  FROM (SELECT user_id, jid, cents FROM jid WHERE is_p = 1) p
  LEFT JOIN touches t USING (user_id, jid)
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit_fp) // 1000000 AS BIGINT) AS credited_cents
FROM credited
GROUP BY touch_type
ORDER BY touch_type
"""


# --------------------------------------------------------------------------
def daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank (type-1) p10/p50/p90 of ``value`` per day:
    rank_q = ceil(q * n / 100) in pure integer math, values in integer
    cents -- no interpolation, so no room for cross-engine drift. The
    window partitions by day (keyed shuffle, bounded per-day frames);
    the three ranks filter before the final per-day rollup."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    ranked = ev.selectExpr(
        "CAST(ts AS DATE) AS day",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    ).select(
        "day",
        "cents",
        F.row_number()
        .over(Window.partitionBy("day").orderBy("cents"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("day")).alias("n"),
    )
    picks = ranked.filter(
        (F.col("rn") == F.expr("(10 * n + 99) div 100"))
        | (F.col("rn") == F.expr("(50 * n + 99) div 100"))
        | (F.col("rn") == F.expr("(90 * n + 99) div 100"))
    )
    return (
        picks.groupBy("day")
        .agg(
            F.max("n").alias("n_events"),
            F.expr(
                "CAST(max(CASE WHEN rn = (10 * n + 99) div 100"
                " THEN cents END) AS DOUBLE) / 100"
            ).alias("p10"),
            F.expr(
                "CAST(max(CASE WHEN rn = (50 * n + 99) div 100"
                " THEN cents END) AS DOUBLE) / 100"
            ).alias("p50"),
            F.expr(
                "CAST(max(CASE WHEN rn = (90 * n + 99) div 100"
                " THEN cents END) AS DOUBLE) / 100"
            ).alias("p90"),
        )
        .orderBy("day")
    )


DAILY_PCTL_SQL = """
WITH ranked AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY CAST(ts AS DATE)
                            ORDER BY CAST(round(value * 100, 0) AS BIGINT))
           AS rn,
         count(*) OVER (PARTITION BY CAST(ts AS DATE)) AS n
  FROM events WHERE value IS NOT NULL
),
picks AS (
  SELECT * FROM ranked
  WHERE rn = (10 * n + 99) // 100
     OR rn = (50 * n + 99) // 100
     OR rn = (90 * n + 99) // 100
)
SELECT day, max(n) AS n_events,
       CAST(max(CASE WHEN rn = (10 * n + 99) // 100 THEN cents END)
            AS DOUBLE) / 100 AS p10,
       CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END)
            AS DOUBLE) / 100 AS p50,
       CAST(max(CASE WHEN rn = (90 * n + 99) // 100 THEN cents END)
            AS DOUBLE) / 100 AS p90
FROM picks GROUP BY day ORDER BY day
"""


# --------------------------------------------------------------------------
def daily_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend of the daily event count per event
    type, ENTIRELY in integer math: x = epoch day, y = count,
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) emitted as integer ppm via
    BIGINT division -- no doubles anywhere, so both engines compute the
    identical fixpoint. NOTE: Spark's DIV and DuckDB's // both TRUNCATE
    toward zero (DuckDB: -7 // 2 = -3), so negative slopes quantize by
    truncation, not floor; the engines agree, which is what the oracle
    gate needs (the 'is this event type growing'
    screen next to cusum_changepoints' level-shift detector).

    The corpus-sized work is ONE (day, type) keyed count; moments fold
    over the O(calendar x types) frame. Day indexes are re-based to
    the per-type minimum before squaring so Sxx stays far from BIGINT
    range at any calendar span."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        "event_type",
    ).agg(F.count("*").alias("y"))
    based = daily.select(
        "event_type",
        (
            F.col("d")
            - F.min("d").over(Window.partitionBy("event_type"))
        ).alias("x"),
        "y",
    )
    return (
        based.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
        )
        .filter(F.expr("n_days * sxx - sx * sx > 0"))
        .selectExpr(
            "event_type",
            "n_days",
            "CAST(sy AS BIGINT) AS total_events",
            "CAST((n_days * sxy - sx * sy) * 1000000 div"
            " (n_days * sxx - sx * sx) AS BIGINT) AS slope_ppm_per_day",
        )
        .orderBy("event_type")
    )


DAILY_TREND_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         event_type, count(*) AS y
  FROM events GROUP BY 1, 2
),
based AS (
  SELECT event_type,
         d - min(d) OVER (PARTITION BY event_type) AS x, y
  FROM daily
),
m AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM based GROUP BY 1
)
SELECT event_type, n_days, sy AS total_events,
       CAST((n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx)
            AS BIGINT) AS slope_ppm_per_day
FROM m WHERE n_days * sxx - sx * sx > 0
ORDER BY event_type
"""


# --------------------------------------------------------------------------
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of ``value`` per user (the
    time_weight('locf') continuous-aggregate semantic): each event's
    value holds until the user's next event, weights are EXACT
    microsecond durations, and the average is integer floor division
    of exact sums -- segment products accumulate as DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) because cents x microseconds x events
    overflows int64, and the per-user quotient lands back in BIGINT
    cents. Users with a single event (no held segment) drop.

    Why TWA and not plain avg: a user polling every minute at value 10
    then idling a day at value 1000 averages ~10 by row count but
    ~1000 by time -- billing/exposure metrics need the latter. One
    keyed window (lead over user timelines) + one keyed aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.selectExpr(
        "user_id",
        "ts",
        "event_id",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
        "unix_micros(ts) AS t_us",
    ).withColumn("dur_us", F.lead("t_us").over(w) - F.col("t_us"))
    return (
        seg.filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dur_us").alias("span_us"),
            F.sum(
                F.expr("CAST(cents AS DECIMAL(38, 0)) * dur_us")
            ).alias("vd"),
        )
        .filter(F.col("span_us") > 0)
        .selectExpr(
            "user_id",
            "n_segments",
            "span_us",
            "CAST(vd div span_us AS BIGINT) AS twa_cents",
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_SQL = """
WITH seg AS (
  SELECT user_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS dur_us
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
)
SELECT user_id,
       count(*) AS n_segments,
       CAST(sum(dur_us) AS BIGINT) AS span_us,
       CAST(sum(CAST(cents AS HUGEINT) * dur_us) // sum(dur_us)
            AS BIGINT) AS twa_cents
FROM seg WHERE dur_us IS NOT NULL
GROUP BY user_id HAVING sum(dur_us) > 0
ORDER BY user_id
"""


QUERIES = {
    "exact_median_by_type": exact_median_by_type,
    "time_weighted_value": time_weighted_value,
    "last_touch_attribution": last_touch_attribution,
    "position_attribution": position_attribution,
    "daily_value_percentiles": daily_value_percentiles,
    "daily_trend_slopes": daily_trend_slopes,
    "event_comovement_corr": event_comovement_corr,
    "activity_islands": activity_islands,
}
ORACLE = {
    "exact_median_by_type": EXACT_MEDIAN_SQL,
    "last_touch_attribution": LAST_TOUCH_SQL,
    "position_attribution": POSITION_ATTRIBUTION_SQL,
    "daily_value_percentiles": DAILY_PCTL_SQL,
    "daily_trend_slopes": DAILY_TREND_SQL,
    "time_weighted_value": TIME_WEIGHTED_SQL,
    "event_comovement_corr": COMOVEMENT_SQL,
    "activity_islands": ACTIVITY_ISLANDS_SQL,
}
