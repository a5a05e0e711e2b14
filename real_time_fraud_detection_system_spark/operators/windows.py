"""Advanced relational surface: window-function variety, pivot/unpivot,
cube/grouping sets, exact percentiles, set ops, correlated subqueries,
and the JSON wire-format round-trip.

The reference has no window/OVER usage (SURVEY.md section 2.3 note); this
module is the engine's declaration that the full Spark SQL surface the
DuckDB-oracle harness exercises is supported, each query oracle-checked.

Several queries go through ``spark.sql`` over temp views on purpose:
that is the Phase-2 'engine.sql' surface (SURVEY.md section 7) and shows
Catalyst handling decorrelation / grouping-set expansion natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.money import exact_sum


# --------------------------------------------------------------------------
# Moving averages + lag/lead over daily revenue (time-series frame ops).
def moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.expr(exact_sum("o_totalprice")).alias("revenue"))
    # unpartitioned window is deliberate: input is day-grain aggregates,
    # bounded by calendar days (thousands of rows at ANY corpus size)
    w = Window.orderBy("day")
    wavg = w.rowsBetween(-6, 0)
    return (
        daily.withColumn("ma7", F.round(F.avg("revenue").over(wavg), 4))
        .withColumn("prev_rev", F.lag("revenue").over(w))
        .withColumn("next_rev", F.lead("revenue").over(w))
        .withColumn(
            "delta", F.round(F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.lit(0.0)), 2)
        )
        .orderBy("day")
    )


MOVING_AVG_SQL = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(floor((sum(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS revenue
  FROM orders GROUP BY 1
)
SELECT day, revenue,
       round(avg(revenue) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
       lag(revenue) OVER (ORDER BY day) AS prev_rev,
       lead(revenue) OVER (ORDER BY day) AS next_rev,
       round(revenue - coalesce(lag(revenue) OVER (ORDER BY day), 0.0), 2)
         AS delta
FROM daily
ORDER BY day
"""


# --------------------------------------------------------------------------
# Ranking family with real ties (p_size is an int): rank vs dense_rank vs
# ntile vs percent_rank.
def part_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    tie_w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    full_w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_size"), F.asc("p_partkey")
    )
    return (
        part.select(
            "p_partkey",
            "p_brand",
            "p_size",
            F.rank().over(tie_w).alias("rnk"),
            F.dense_rank().over(tie_w).alias("drnk"),
            F.round(F.percent_rank().over(tie_w), 6).alias("prnk"),
            F.ntile(4).over(full_w).alias("quartile"),
        )
        .orderBy("p_brand", F.desc("p_size"), "p_partkey")
    )


PART_RANKINGS_SQL = """
SELECT p_partkey, p_brand, p_size,
       rank() OVER w_tie AS rnk,
       dense_rank() OVER w_tie AS drnk,
       round(percent_rank() OVER w_tie, 6) AS prnk,
       ntile(4) OVER w_full AS quartile
FROM part
WINDOW w_tie AS (PARTITION BY p_brand ORDER BY p_size DESC),
       w_full AS (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey ASC)
ORDER BY p_brand, p_size DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Pivot: order counts + revenue by priority x status. The oracle uses
# FILTER aggregation with identical output columns.
def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("O").alias("n_open"),
            F.col("F").alias("n_filled"),
            F.col("P").alias("n_partial"),
        )
        .orderBy("o_orderpriority")
    )


ORDERS_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Unpivot (stack): daily metrics long format.
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.round(F.count("*").cast("double"), 2).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return (
        daily.selectExpr(
            "day",
            "stack(2, 'n_events', n_events, 'sum_value', sum_value)"
            " AS (metric, value)",
        )
        .orderBy("day", "metric")
    )


UNPIVOT_SQL = """
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         round(CAST(count(*) AS DOUBLE), 2) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1
)
SELECT day, metric, value FROM (
  SELECT day, 'n_events' AS metric, n_events AS value FROM daily
  UNION ALL
  SELECT day, 'sum_value' AS metric, sum_value AS value FROM daily
)
ORDER BY day, metric
"""


# --------------------------------------------------------------------------
# Cube with grouping() flags so NULL group keys are distinguishable.
def cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.cube("r_name", "c_mktsegment")
        .agg(
            F.grouping("r_name").alias("g_region"),
            F.grouping("c_mktsegment").alias("g_segment"),
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT r_name, c_mktsegment,
       CAST(grouping(r_name) AS TINYINT) AS g_region,
       CAST(grouping(c_mktsegment) AS TINYINT) AS g_segment,
       count(*) AS n,
       round(avg(c_acctbal), 4) AS avg_bal
FROM customer, nation, region
WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY CUBE (r_name, c_mktsegment)
ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Exact percentiles (interpolated) per group.
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Set difference: customers with no 1998+ orders via EXCEPT (the anti-join
# twin of customers_without_orders, exercising the set-op path).
def lapsed_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") >= 1998
    ).select(F.col("o_custkey").alias("custkey"))
    return cust.exceptAll(recent.distinct()).orderBy("custkey")


LAPSED_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE year(o_orderdate) >= 1998
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# Correlated scalar subquery (Catalyst decorrelates to a join): parts
# priced above their brand's average.
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand,
               round(p_retailprice, 2) AS p_retailprice
        FROM part p
        WHERE p_retailprice > (
          SELECT avg(p_retailprice) FROM part q WHERE q.p_brand = p.p_brand
        )
        ORDER BY p_partkey
        """
    )


PARTS_ABOVE_BRAND_AVG_SQL = """
SELECT p_partkey, p_brand,
       round(p_retailprice, 2) AS p_retailprice
FROM part p
WHERE p_retailprice > (
  SELECT avg(p_retailprice) FROM part q WHERE q.p_brand = p.p_brand
)
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# Grouping sets via SQL (distinct from rollup/cube expansion).
def grouping_sets_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(floor((sum(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       CAST(floor((sum(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST,
         o_orderpriority ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# P1/P2 wire-format round-trip: serialize a typed struct to JSON and
# parse it back; proves byte-identical JSON across engines for the
# int/string subset the hot path carries.
def wire_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wire = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("type"),
                F.col("user_id").alias("uid"),
            )
        ).alias("wire_json"),
    )
    # ONE parse for both fields (round-13 optimization, guide §4.1):
    # two get_json_object calls re-parsed every row's JSON twice;
    # from_json parses once into a struct and both fields project off
    # it (value-equal on the fixtures incl. the null-uid rows, where
    # to_json omits the field and both paths yield NULL; 13.3 ->
    # 6.1 s at the 100x scale test, 10.0 -> 5.7 in a same-session A/B
    # (json_tuple measured 8.0 -- still one parse but a generator
    # node); the residual is to_json + the declared full-table
    # ORDER BY).
    parsed = F.from_json("wire_json", "id BIGINT, type STRING, uid BIGINT")
    return wire.select(
        "event_id",
        "wire_json",
        parsed.alias("p"),
    ).select(
        "event_id",
        "wire_json",
        F.col("p.type").alias("parsed_type"),
        F.col("p.uid").alias("parsed_uid"),
    ).orderBy("event_id")


WIRE_FORMAT_SQL = """
WITH wire AS (
  SELECT event_id,
         to_json(struct_pack(id := event_id, type := event_type,
                             uid := user_id)) AS wire_json
  FROM events
)
SELECT event_id, wire_json,
       json_extract_string(wire_json, '$.type') AS parsed_type,
       CAST(json_extract_string(wire_json, '$.uid') AS BIGINT) AS parsed_uid
FROM wire
ORDER BY event_id
"""


QUERIES = {
    "moving_avg_revenue": moving_avg_revenue,
    "part_rankings": part_rankings,
    "orders_pivot_status": orders_pivot_status,
    "unpivot_daily_metrics": unpivot_daily_metrics,
    "cube_region_segment": cube_region_segment,
    "value_percentiles": value_percentiles,
    "lapsed_customers_except": lapsed_customers_except,
    "parts_above_brand_avg": parts_above_brand_avg,
    "grouping_sets_summary": grouping_sets_summary,
    "wire_format_roundtrip": wire_format_roundtrip,
}

ORACLE = {
    "moving_avg_revenue": MOVING_AVG_SQL,
    "part_rankings": PART_RANKINGS_SQL,
    "orders_pivot_status": ORDERS_PIVOT_SQL,
    "unpivot_daily_metrics": UNPIVOT_SQL,
    "cube_region_segment": CUBE_SQL,
    "value_percentiles": PERCENTILES_SQL,
    "lapsed_customers_except": LAPSED_EXCEPT_SQL,
    "parts_above_brand_avg": PARTS_ABOVE_BRAND_AVG_SQL,
    "grouping_sets_summary": GROUPING_SETS_SQL,
    "wire_format_roundtrip": WIRE_FORMAT_SQL,
}
