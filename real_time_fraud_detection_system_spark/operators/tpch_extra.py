"""Join-heavy analytical queries (TPC-H Q7/Q8/Q9/Q14/Q15/Q17/Q18/Q19
shapes, adapted to the driver's star schema -- no partsupp/l_shipmode/
p_container columns exist, so the classic predicates are restated over
the columns that do).

This module is where Catalyst's join planning earns its keep; each query
is written declaratively and the physical plan is what we tune:

  * dimension sides (region, nation; supplier/part where sf-small) get
    explicit ``broadcast()`` or are left to AQE's threshold;
  * multi-way fact joins shuffle on their keys once -- the DataFrame
    trees are shaped so join keys chain (orderkey -> custkey/suppkey)
    instead of re-shuffling;
  * correlated-subquery shapes (Q17) are expressed as a pre-aggregated
    self-join, the standard decorrelation Spark's optimizer would emit.

The reference itself has zero joins (SURVEY.md section 2.4); this is the
relational surface the DuckDB-oracle harness grades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..catalog import load_table
from ..functions.money import cents_sql, exact_ratio, exact_sum


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q7 volume shipping: revenue between two nations by direction and year.
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sn = F.broadcast(nation).alias("sn")
    cn = F.broadcast(nation).alias("cn")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .filter(
            ((F.col("sn.n_name") == n1) & (F.col("cn.n_name") == n2))
            | ((F.col("sn.n_name") == n2) & (F.col("cn.n_name") == n1))
        )
    )
    return (
        joined.groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.expr(exact_sum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 market share: NATION_3's share of ECONOMY-part order volume in ASIA.
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sn = F.broadcast(nation).alias("sn")
    cn = F.broadcast(nation).alias("cn")
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(
            F.broadcast(region),
            F.col("cn.n_regionkey") == F.col("r_regionkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.expr(exact_ratio("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", "volume")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CAST(round((CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000, 0) AS BIGINT)) AS DOUBLE) / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY 1
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9 shape (no ps_supplycost column): revenue of STANDARD parts by
# supplier nation and order year.
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.expr(exact_sum("l_extendedprice * (1 - l_discount)")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q14 promo revenue share over one shipping year.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr("round(100.0 * CAST(sum(CAST(round((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000, 0) AS BIGINT)) AS DOUBLE) / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)), 6)").alias("promo_revenue")
        )
    )


Q14_SQL = """
SELECT round(100.0 * CAST(sum(CAST(round((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000, 0) AS BIGINT)) AS DOUBLE) / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Q15 top supplier(s) by quarterly revenue (window max instead of the
# classic CREATE VIEW + scalar subquery).
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(exact_sum("l_extendedprice * (1 - l_discount)")).alias("total_revenue")
    )
    # scalar max + broadcast join, NOT a global (unpartitioned) window:
    # rank() over an empty partitioning pulls every supplier into one
    # task, which dies at real supplier cardinalities
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("max_rev")
    ).drop("max_rev")
    return (
        top.join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q17 small-quantity-order revenue: lineitems under half the part's mean
# quantity, restricted to one brand. Correlated subquery decorrelated to
# a pre-aggregated broadcast join.
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#2"
    )
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.expr("round(CAST(sum(CAST(round((l_extendedprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000 / 7.0, 2)").alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT round(CAST(sum(CAST(round((l_extendedprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000 / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# --------------------------------------------------------------------------
# Q18 large-volume customers: orders whose total quantity exceeds 250.
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q19 disjunctive predicate revenue (brand x size x quantity bands).
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.expr(exact_sum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
    )


Q19_SQL = """
SELECT CAST(floor((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) / 100) AS DOUBLE) / 100 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q13 customer order-count distribution: LEFT OUTER join (zero-order
# customers must appear), then a second aggregation over the first.
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q4 shape: EXISTS correlated subquery -> left-semi join with a
# cross-side predicate. No l_commitdate/l_receiptdate in this schema, so
# "late" = shipped more than LATE_DAYS after the order date.
LATE_DAYS = 60


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q12 shape: two-way conditional routing counts. No l_shipmode column;
# lines route into slow/fast classes by shipping delay instead.
def q12_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delay_class",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"),
                "slow",
            ).otherwise("fast"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


Q12_SQL = f"""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
            THEN 'slow' ELSE 'fast' END AS delay_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY delay_class
"""


# --------------------------------------------------------------------------
# Q21 shape: multi-EXISTS / NOT-EXISTS decorrelated into one per-order
# aggregate pass -- suppliers who were the SOLE late shipper on a
# finished multi-supplier order. The classic plan is two correlated
# subqueries; one groupBy(orderkey) computing (n suppliers, n late
# suppliers, the late supplier when unique) replaces both, which is the
# decorrelation that survives 100 TB (one keyed shuffle).
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    ).cast("int")
    # SHUFFLE_HASH, not the planner's broadcast: AQE broadcasts the
    # status-F orders side (~half of orders -- far too big to broadcast
    # on a real cluster), and a broadcast join leaves lineitem in scan
    # partitioning, so the countDistinct aggregate below pays a full
    # exchange of the EXPANDED join output. The shuffled hash join
    # distributes both sides by l_orderkey once and the aggregate
    # reuses that partitioning shuffle-free (guide 3.1/2.4). Measured
    # at the 100x replica, best-of-2: 24.9 s -> 9.3 s.
    per_order = (
        li.join(orders.hint("SHUFFLE_HASH"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late", late)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).alias("n_late_supp"),
            F.max(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(
            F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


Q21_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                  + INTERVAL {LATE_DAYS} DAY
                             THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q22 shape: scalar subquery threshold + NOT EXISTS anti-join. No
# c_phone/cntrycode; market segments stand in as the grouping, and the
# threshold is the average positive account balance (1-row broadcast --
# the allowlisted constant-size NLJ pattern). The threshold is computed
# in INTEGER fixed-point (floor of the mean in 10^-4 units): a double
# avg differs between engines in the last ulp, and a customer balance
# within that ulp of the threshold would flip the > filter (the
# functions/money.py failure class, applied to a predicate).
DORMANT_SINCE = "2000-01-01"


def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(DORMANT_SINCE).cast("timestamp")
    )
    thresh = cust.filter(F.col("c_acctbal") > 0).agg(
        F.expr(
            f"sum({cents_sql('c_acctbal')}) div count(*)"
        ).alias("avg_cents")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.expr(cents_sql("c_acctbal")) > F.col("avg_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(exact_sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
SELECT c_mktsegment,
       count(*) AS numcust,
       {exact_sum("c_acctbal")} AS totacctbal
FROM customer
WHERE {cents_sql("c_acctbal")} >
      (SELECT sum({cents_sql("c_acctbal")}) // count(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{DORMANT_SINCE} 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ==========================================================================
# Derived partsupp + the four partsupp-centric TPC-H queries (Q2 / Q11 /
# Q16 / Q20), completing the 22-query surface. The driver's testdata
# ships no partsupp table, so partsupp is DERIVED deterministically from
# the tables that do exist: PS_PER_PART supplier slots per part, the
# supplier chosen by dbgen's stride rule restated over 0-based keys
# (suppkey_i = (partkey + i*stride) % n_supp, stride = n_supp//4 + 1 --
# the four slots land in distinct quarters of the supplier space), and
# availqty / supplycost drawn from md5 of the (partkey, slot) pair.
# Everything is computable IDENTICALLY in Spark and DuckDB, so the
# oracle builds the same partsupp in a WITH block and the value gate
# checks the queries end-to-end, derivation included.
#
# Scale shape: partsupp is generated MAP-SIDE from the part scan (a
# 4-way explode, no shuffle, no materialization); at 100 TB where
# partsupp is a real stored table, every query below reads it the same
# way -- the derivation is a stand-in for the scan, not part of the
# query cost.

PS_PER_PART = 4


def _h6_spark(s_expr: str) -> str:
    """First 24 bits of md5 as INT (Spark dialect)."""
    return f"CAST(conv(substr(md5({s_expr}), 1, 6), 16, 10) AS INT)"


def _h6_duck(s_expr: str) -> str:
    return f"CAST('0x' || substr(md5({s_expr}), 1, 6) AS INT)"


def _ps_key(tag: str, partkey_col: str) -> str:
    """Dialect-shared md5 input for a partsupp attribute."""
    return (
        f"concat('{tag}:', CAST({partkey_col} AS STRING),"
        " ':', CAST(i AS STRING))"
    )


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    n_supp = load_table(spark, sf_dir, "supplier").count()
    stride = n_supp // PS_PER_PART + 1
    return (
        part.selectExpr("p_partkey AS ps_partkey")
        .selectExpr(
            "ps_partkey", f"explode(sequence(0, {PS_PER_PART - 1})) AS i"
        )
        .selectExpr(
            "ps_partkey",
            f"(ps_partkey + i * {stride}) % {n_supp} AS ps_suppkey",
            f"{_h6_spark(_ps_key('av', 'ps_partkey'))} % 9999 + 1"
            " AS ps_availqty",
            f"({_h6_spark(_ps_key('sc', 'ps_partkey'))} % 90000 + 10000)"
            " / CAST(100 AS DOUBLE) AS ps_supplycost",
        )
    )


_PS_DUCK = f"""
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * ((SELECT count(*) FROM supplier) // {PS_PER_PART} + 1))
             % (SELECT count(*) FROM supplier) AS ps_suppkey,
         {_h6_duck(_ps_key('av', 'p_partkey'))} % 9999 + 1 AS ps_availqty,
         ({_h6_duck(_ps_key('sc', 'p_partkey'))} % 90000 + 10000)
             / CAST(100 AS DOUBLE) AS ps_supplycost
  FROM part, generate_series(0, {PS_PER_PART - 1}) AS t(i)
)"""


# --------------------------------------------------------------------------
# Q2 minimum-cost supplier: per qualifying part, the cheapest supplier
# within a region; classic correlated-min subquery, decorrelated into a
# per-part window min over the already-filtered candidate set (ONE
# shuffle keyed ps_partkey; the dimension joins are all broadcasts).
Q2_SIZE = 15
Q2_REGION = "EUROPE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ps = derived_partsupp(spark, sf_dir)
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == Q2_SIZE)
        .select("p_partkey", "p_brand")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(
        F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey")
    ).join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("ps_supplycost", 2).alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH {_PS_DUCK},
cand AS (
  SELECT ps.*, p.p_brand, s.s_name, s.s_acctbal, n.n_name
  FROM partsupp ps
  JOIN part p ON ps.ps_partkey = p.p_partkey
   AND p.p_size = {Q2_SIZE}
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
   AND r.r_name = '{Q2_REGION}'
),
mins AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost
  FROM cand GROUP BY 1
)
SELECT round(c.s_acctbal, 2) AS s_acctbal, c.s_name, c.n_name,
       c.ps_partkey AS p_partkey, c.p_brand,
       round(c.ps_supplycost, 2) AS ps_supplycost
FROM cand c JOIN mins m
  ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost = m.min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q11 important stock: per-part inventory value within one nation vs a
# fraction of that nation's total. The threshold compare runs in exact
# integer cents (sum_cents * DENOM > total_cents) -- no float-fraction
# boundary for the two engines to disagree on. The scalar total is the
# broadcast-anchor pattern (q22).
Q11_NATION = "NATION_3"
Q11_DENOM = 250  # "important" = value share > 1/250 of the nation total
_Q11_VALUE = "ps_supplycost * ps_availqty"


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    nat_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == Q11_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nat_ps = ps.join(
        F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.expr(f"sum({cents_sql(_Q11_VALUE)})").alias("v_cents")
    )
    total = nat_ps.agg(
        F.expr(f"sum({cents_sql(_Q11_VALUE)})").alias("total_cents")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("v_cents") * Q11_DENOM > F.col("total_cents"))
        .select(
            "ps_partkey",
            F.expr(
                "CAST(floor((v_cents + 50) / 100) AS DOUBLE) / 100"
            ).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


Q11_SQL = f"""
WITH {_PS_DUCK},
nat_ps AS (
  SELECT ps.* FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
   AND n.n_name = '{Q11_NATION}'
)
SELECT ps_partkey,
       CAST(floor((sum({cents_sql(_Q11_VALUE)}) + 50) / 100) AS DOUBLE) / 100
           AS stock_value
FROM nat_ps
GROUP BY 1
HAVING sum({cents_sql(_Q11_VALUE)}) * {Q11_DENOM} >
       (SELECT sum({cents_sql(_Q11_VALUE)}) FROM nat_ps)
ORDER BY stock_value DESC, ps_partkey
"""


# --------------------------------------------------------------------------
# Q16 parts/supplier relationship: distinct-supplier counts per
# (brand, type, size) bucket, excluding one brand and a deterministic
# "complaints" supplier subset (md5 stand-in for the spec's comment
# LIKE '%Customer%Complaints%'); NOT-IN becomes a broadcast anti-join.
Q16_EXCL_BRAND = "Brand#2"
Q16_SIZES = (1, 5, 11, 15, 21, 28, 36, 49)


def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    cmp_key = "concat('cmp:', s_name)"
    complainers = load_table(spark, sf_dir, "supplier").filter(
        F.expr(f"{_h6_spark(cmp_key)} % 10 = 0")
    )
    return (
        ps.join(F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complainers),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
WITH {_PS_DUCK}
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_size IN {Q16_SIZES}
  AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier
      WHERE {_h6_duck("concat('cmp:', s_name)")} % 10 = 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q20 potential part promotion: suppliers holding excess stock
# (availqty > half the quantity they shipped of that part over a date
# window) of parts with a given name prefix. The correlated quantity
# subquery decorrelates into one (partkey, suppkey)-keyed lineitem
# aggregate; pairs with NO shipments drop out via the inner join --
# the spec's NULL-comparison semantics. Adaptation: the spec's 1/25
# nation filter empties the result at small SF, so the nation join is
# kept only for the output column.
Q20_NAME_PREFIX = "red"
Q20_FROM, Q20_TO = "1996-01-01", "1998-01-01"


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    # The name-prefix filter keeps ~1/25 of parts, so semi-join lineitem
    # against the broadcast part set BEFORE the (partkey, suppkey)
    # aggregate: the keyed agg then runs over ~4% of the date-filtered
    # rows. The inner join with red_parts below already discards
    # non-matching parts, so the result is identical.
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp"))
        )
        .join(
            F.broadcast(red_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = (
        ps.join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {_PS_DUCK},
qty AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q20_TO} 00:00:00'
  GROUP BY 1, 2
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT ps.ps_suppkey
  FROM partsupp ps
  JOIN part p ON ps.ps_partkey = p.p_partkey
   AND p.p_name LIKE '{Q20_NAME_PREFIX}%'
  JOIN qty q ON ps.ps_partkey = q.l_partkey
            AND ps.ps_suppkey = q.l_suppkey
  WHERE ps.ps_availqty > 0.5 * q.qty)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Iterative graph analytics: fixed-iteration PageRank over the
# customer <-> supplier trade graph. The representative of the
# iterative-algorithm family (connected components being the other):
# a fixed unrolled depth, ENTIRELY integer arithmetic (scores in ppb,
# floor division everywhere), so every engine computes bit-identical
# scores with no summation-order or rounding concerns at all --
# the same philosophy as functions/money.py applied to an iterative
# fixpoint.
PR_SCALE = 1_000_000_000  # scores in parts-per-billion of total mass
PR_ITERS = 4
PR_TOPK = 50
# Broadcast dispatch for the per-iteration scores frame (O(nodes) rows
# of two BIGINTs): under this node count each PageRank round is a
# BroadcastHashJoin against the dst-partitioned cached edge table and
# the per-round dst aggregate REUSES that partitioning -- zero
# exchanges per iteration (guide 3.1 + 2.4). 4M nodes is ~64 MB of raw
# key/score pairs, a few hundred MB as the built hash relation --
# comfortably inside executor memory and far under the 8 GB / 512M-row
# broadcast cap. Above it (hundreds of millions of nodes at the 100 TB
# posture) rounds fall back to the sort-merge form over the
# src-partitioned cache, whose only per-round exchanges are the
# O(nodes) scores shuffle and the aggregate -- never the edge table.
# Data-adaptive (keyed on the measured node count, not host cores).
PR_BCAST_MAX_NODES = 4_000_000


def _order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (l_orderkey, l_partkey) basket items, memoized to
    parquet (operators/_memo.py): the shared first stage of the
    co-purchase analytics (part_triangles' pair self-join and
    part_cooccurrence_topk's basket counts both start here), so the
    lineitem scan + distinct shuffle runs once per data snapshot."""
    from ._memo import code_token, memo_parquet, table_fingerprint

    return memo_parquet(
        spark,
        table_fingerprint(sf_dir, "lineitem", "orderitems",
                          code_token(_order_items)),
        "orderitems",
        lambda: load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct(),
    )


def _trade_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted trade edge list (2*custkey -> 2*suppkey+1,
    w = lineitem count), memoized to parquet (operators/_memo.py --
    keyed on BOTH source tables' identities). The orders-x-lineitem
    join + pair aggregate is the dominant cost of every trade-graph
    query (~20-40 s of supplier_pagerank's and supplier_bfs_hops'
    100x runtime); one build per data snapshot serves both. Rows are
    pure BIGINTs -- exact through the roundtrip."""
    import hashlib

    from ._memo import code_token, memo_parquet, table_fingerprint

    fo = table_fingerprint(sf_dir, "orders")
    fl = table_fingerprint(sf_dir, "lineitem")
    ct = code_token(_trade_fwd)
    fp = (
        hashlib.md5(f"{fo}|{fl}|trade|{ct}".encode()).hexdigest()
        if fo and fl
        else None
    )

    def build() -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        cs = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        return cs.groupBy(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst")
        ).agg(F.count("*").alias("w"))

    return memo_parquet(spark, fp, "tradew", build)


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {PR_ITERS} unrolled iterations) over the
    UNDIRECTED bipartite trade graph: customer c -- supplier s with
    edge weight = number of lineitems c bought from s. Node ids encode
    type (2*custkey / 2*suppkey+1). Emits the top {PR_TOPK} nodes:
    the 'most systemically connected' customers/suppliers, which is
    what trade-network influence queries actually rank.

    Integer fixed-point throughout: s0 = SCALE div N; each round
    new_s(v) = BASE + (sum over in-edges (s(u) div wsum(u)) * w(u,v))
    * 85 div 100 with BASE = (SCALE * 15 div 100) div N -- div is
    integer floor division in BOTH engines, so scores are exactly
    reproducible (no doubles anywhere).

    Scale shape: the symmetric edge list caches ONCE, partitioned by
    the PER-ROUND AGGREGATE's key (dst) and carrying only
    (src, dst, w). Each of the {PR_ITERS} rounds is then ONE
    exchange-free stage when the O(nodes) frame fits a broadcast
    (node count measured, PR_BCAST_MAX_NODES): an explicit
    BroadcastHashJoin streams the cached edge partitions -- which
    KEEPS their dst hash-partitioning -- straight into the dst
    aggregate, so neither the edge table nor the scores frame shuffles
    at all (round-14 optimization, guide 3.1 "pick the strategy
    deliberately" + 2.4 "two operations keyed the same way share one
    exchange"; the scores RDD carries no stats after localCheckpoint,
    so without the explicit hint the planner fell to sort-merge at
    scale AND re-shuffled every round's aggregate: 2 exchanges + 2
    sorts per round -> 0). Second pass (guide §2.2 "shuffle fewer
    bytes"): the per-src normalizer moved OFF the edge cache onto the
    round's O(nodes) side -- q(src) = score div wsum computes on the
    scores x wout join (nodes rows, not edge rows) and broadcasts as
    (src, q), so the build no longer pays the edges-x-wout join + its
    extra full-edge shuffle, the cache drops the wsum column (25%
    narrower rows scanned every round), and the node set falls out of
    wout's keys instead of a separate 117M-row distinct. Beyond the
    broadcast bound the rounds fall back to the prior sort-merge form
    over a src-partitioned sorted cache. Undirected edges mean no
    dangling-mass correction term is needed. Measured at the 100x
    replica (broadcast branch), same-session both-orders best-of-2:
    30.8 -> 18.9 s for the broadcast rewrite, then 41.0 -> 25.7 s for
    the q-side pass (1.6x, contended session -- the same-session A/B
    is the trusted ratio; solo best-of-2 read 10.5 s before the
    second pass). Plan evidence:
    plans/r14/supplier_pagerank_iter_{{before,after}}.txt."""
    fwd = _trade_fwd(spark, sf_dir)
    edges = fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    # wout doubles as the node set: its keys are exactly distinct src
    # (= all nodes, the edge list being symmetric), which retires the
    # old separate 117M-row edges.distinct() pass. localCheckpoint,
    # not cache, so the per-round q join does not share ew's lineage.
    wout = (
        edges.groupBy("src").agg(F.sum("w").alias("wsum")).localCheckpoint()
    )
    n = wout.count()
    bcast = n <= PR_BCAST_MAX_NODES
    if bcast:
        # broadcast rounds: cache keyed on the AGGREGATE key; no sort
        # (neither the hash join nor the hash aggregate wants one).
        # Only (src, dst, w): wsum lives on the O(nodes) side now, so
        # the old edges-join-wout build (a full-edge join + one more
        # full-edge shuffle) is gone and every round scans 25%
        # narrower cached rows.
        ew = edges.repartition("dst").cache()
    else:
        # sort-merge rounds: cache partitioned AND sorted on the join
        # key, so the per-round join re-sorts only the O(nodes) side
        ew = edges.repartition("src").sortWithinPartitions("src").cache()
    base = (PR_SCALE * 15 // 100) // n
    scores = wout.select("src", F.lit(PR_SCALE // n).alias("score"))
    for _ in range(PR_ITERS):
        # localCheckpoint each round: breaks the self-lineage column
        # ambiguity (scores derives from ew) AND keeps the plan depth
        # constant instead of growing per iteration -- the standard
        # iterative-Spark discipline; the node-score frame is O(nodes)
        # rows, tiny relative to the edge table at any scale.
        # q(src) = score div wsum computes HERE, on the O(nodes) join,
        # instead of once per edge row against a cached wsum column --
        # identical integer math (per-src constant), ~73x fewer divs
        # at the 100x replica (1.6M nodes vs 117M edge rows).
        q = scores.join(wout, "src").select(
            "src", F.expr("score div wsum").alias("q")
        )
        rhs = F.broadcast(q) if bcast else q
        contrib = (
            ew.join(rhs, "src")
            .select(F.col("dst"), (F.col("q") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        # NO per-round nodes left-join (round-13 optimization, guide
        # §2.4 "remove shuffles outright"): the edge table is SYMMETRIC
        # (fwd union reversed-fwd), so every node (= distinct src, =
        # wout's keys) also appears as a dst, and `scores` always
        # covers all nodes -- contrib's groupBy(dst) therefore emits
        # EXACTLY the node set every round, the old left join matched
        # every row, and its coalesce(mass, 0) never fired. The
        # oracle's LEFT JOIN form pins the fixpoint if the symmetry
        # ever broke.
        scores = contrib.select(
            F.col("dst").alias("src"),
            (
                F.lit(base) + F.expr("mass * 85 div 100")
            ).alias("score"),
        ).localCheckpoint()
    out = (
        scores.select(F.col("src").alias("node"), "score")
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(PR_TOPK)
        .selectExpr(
            "CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END"
            " AS node_type",
            "CAST(node div 2 AS BIGINT) AS key",
            "CAST(score AS BIGINT) AS score_ppb",
        )
    )
    from pyspark.sql.window import Window

    return out.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score_ppb"), F.asc("node_type"), F.asc("key"))
        ),
    ).orderBy("rank")


def _pagerank_sql() -> str:
    n_sub = "(SELECT count(*) FROM nodes)"
    base = f"((CAST({PR_SCALE} AS BIGINT) * 15) // 100) // {n_sub}"
    iters = [f"s0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) // {n_sub} AS score FROM nodes)"]
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""s{i} AS (
  SELECT n.node,
         {base} + (coalesce(sum((s.score // e.wsum) * e.w), 0) * 85) // 100
           AS score
  FROM nodes n
  LEFT JOIN ew e ON e.dst = n.node
  LEFT JOIN s{i - 1} s ON s.node = e.src
  GROUP BY n.node
)""")
    return f"""
WITH cs AS (
  SELECT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
fwd AS (
  SELECT c_node AS src, s_node AS dst, count(*) AS w FROM cs GROUP BY 1, 2
),
edges AS (
  SELECT src, dst, w FROM fwd
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM fwd
),
ew AS (
  SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS wsum FROM edges
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
{','.join(iters)},
top AS (
  SELECT node, score FROM s{PR_ITERS}
  ORDER BY score DESC, node ASC LIMIT {PR_TOPK}
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS key,
       CAST(score AS BIGINT) AS score_ppb,
       CAST(row_number() OVER (ORDER BY score DESC,
            CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END ASC,
            node // 2 ASC) AS INT) AS rank
FROM top
ORDER BY rank
"""


SUPPLIER_PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# Triangle counting over the co-purchase graph (graph-analytics family
# next to supplier_pagerank / the connected-components dispatcher).
TRI_MIN_SUP = 2  # parts must co-occur in >= 2 orders to form an edge


def part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph: parts
    are nodes, an edge joins two parts co-occurring in >= {TRI_MIN_SUP}
    distinct orders, and each part's count of closed triangles measures
    how clustered its neighborhood is -- the community-density signal
    bundle-recommendation and fraud-ring detection both start from
    (the reference's schema keeps no relationships at all;
    services/db/init.sql:1-31).

    Scale shape, in order of data volume touched:
      1. pair generation is the distinct-items SELF-JOIN on the order
         key: both sides are the same compact (order, part) frame, the
         per-order fanout is bounded by basket size (<= 7 in TPC-H),
         and every operator stays inside whole-stage codegen. The
         collect_set + per-array pair expansion this replaces looked
         cheaper on paper (one corpus shuffle) but built 15M array
         rows through interpreted higher-order functions -- measured
         at the 100x scale test for the identical 357k edges: HOF
         expansion 244-271 s, items self-join 38-106 s cold / 17-60 s
         steady (the spread is first-execution JVM warmup on the big
         sorts, not plan variance);
      2. edge support is one keyed aggregate with map-side partials,
         and the HAVING filter shrinks the graph before any
         triangle work;
      3. enumeration is DEGREE-ORIENTED: every edge points from its
         lower-(degree, id) endpoint, so out-degrees are O(sqrt(m))
         and the out-neighbor pair join does O(m^1.5) work worst-case
         instead of sum(deg^2) piling onto hub parts -- the standard
         distributed triangle-count shape;
      4. each triangle is found exactly once at its minimum-order
         corner (the orientation is a total order), so no DISTINCT
         over enumerated triangles is ever needed.
    The oracle counts the same triangles from the unoriented a<b<c
    form -- different strategy, identical set, which is what the gate
    should pin."""
    # SHUFFLE_HASH on the self-join build side (and the wedge/closing
    # joins below): per-key groups are basket-bounded (<= 7 items) /
    # degree-oriented O(sqrt(m)), so the planner's sort-merge joins
    # paid full sorts of both sides for hash-sized groups (guide 3.1;
    # the q21 / _wide_fp_pairs precedent). Measured at the 100x
    # replica, same-session best-of-2 A/B run in BOTH orders (cold
    # position alternated): no hints 36.5 / 51.0 s, all three hinted
    # 12.0 / 12.2 s; pair join only, mid-contention: 63.8 -> 35.6 s.
    items = _order_items(spark, sf_dir)
    edges = (
        items.selectExpr("l_orderkey", "l_partkey AS pa")
        .join(items.selectExpr("l_orderkey", "l_partkey AS pb")
              .hint("SHUFFLE_HASH"),
              "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= TRI_MIN_SUP)
        .select("pa", "pb")
    )
    # EAGER materialization, not cache(): the edge subtree feeds four
    # downstream branches that can run as sibling stages of one job --
    # a lazily-populated cache is not guaranteed visible to siblings,
    # which can recompute the corpus pair aggregate. The support-
    # filtered edge set is O(co-purchase pairs), tiny next to lineitem
    # at any scale, so the checkpoint itself is cheap.
    edges = edges.localCheckpoint()
    deg = (
        edges.selectExpr("pa AS node")
        .unionAll(edges.selectExpr("pb AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # total order for orientation: ord = deg * 1e9 + id (ids stay well
    # under 1e9 at any TPC-H scale factor; asserted cheaply via the id
    # itself riding inside ord, which would collide otherwise)
    withord = (
        edges.join(deg.withColumnRenamed("node", "pa"), "pa")
        .withColumnRenamed("deg", "da")
        .join(
            deg.selectExpr("node AS pb", "deg AS db"), "pb"
        )
        .selectExpr(
            "pa", "pb",
            "da * 1000000000L + pa AS orda",
            "db * 1000000000L + pb AS ordb",
        )
    )
    oriented = withord.selectExpr(
        "CASE WHEN orda < ordb THEN pa ELSE pb END AS src",
        "CASE WHEN orda < ordb THEN pb ELSE pa END AS dst",
        "CASE WHEN orda < ordb THEN orda ELSE ordb END AS src_ord",
        "CASE WHEN orda < ordb THEN ordb ELSE orda END AS dst_ord",
        # same sibling-stage argument as edges: o1, o2, and the closing
        # join all consume this O(edges) frame
    ).localCheckpoint()
    o1 = oriented.alias("o1")
    o2 = oriented.hint("SHUFFLE_HASH").alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst_ord") < F.col("o2.dst_ord")),
    ).select(
        F.col("o1.src").alias("ta"),
        F.col("o1.dst").alias("tb"),
        F.col("o2.dst").alias("tc"),
    )
    tri = wedges.join(
        oriented.selectExpr("src AS tb", "dst AS tc")
        .hint("SHUFFLE_HASH"),
        ["tb", "tc"],
    )
    return (
        tri.selectExpr("explode(array(ta, tb, tc)) AS l_partkey")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "l_partkey")
    )


PART_TRIANGLES_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT pa, pb FROM pairs GROUP BY 1, 2
  HAVING count(*) >= {TRI_MIN_SUP}
),
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM edges e1
  JOIN edges e2 ON e1.pb = e2.pa
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
corners AS (SELECT unnest([a, b, c]) AS l_partkey FROM tri)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY 1
ORDER BY n_triangles DESC, l_partkey
"""


# --------------------------------------------------------------------------
# Skyline (Pareto frontier): cheapest price per size, dominated sizes
# removed. The classic multi-criteria "best trade-off" operator.


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over parts: MINIMIZE p_retailprice, MAXIMIZE p_size.
    A size s is on the frontier iff its cheapest part is strictly
    cheaper than the cheapest part of EVERY larger size (a part at the
    same price but bigger size dominates). Emits one row per frontier
    point with the tie count and the smallest achieving part key --
    the "best value at each capability level" table a procurement
    query wants (the reference keeps no part catalog at all;
    services/db/init.sql:1-31).

    Scale shape: prices move to exact integer cents (round-to-int is
    boundary-safe in both engines); ONE keyed aggregate collapses the
    corpus to (size, cents) groups -- output bounded by the VALUE
    DOMAIN (50 sizes x ~10k cent values), not the row count -- then a
    50-row per-size min, a 50-row cumulative-min window (descending
    size), and a broadcast join back to the bounded group table. No
    pairwise dominance join anywhere: the O(n^2) textbook skyline
    becomes agg + tiny window because both criteria have bounded
    domains."""
    part = load_table(spark, sf_dir, "part")
    g = (
        part.selectExpr(
            "p_size",
            "CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents",
            "p_partkey",
        )
        .groupBy("p_size", "cents")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
        )
    )
    per_size = g.groupBy("p_size").agg(F.min("cents").alias("min_cents"))
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_size.withColumn("best_larger", F.min("min_cents").over(w))
        .filter(
            F.col("best_larger").isNull()
            | (F.col("min_cents") < F.col("best_larger"))
        )
        # alias away the shared lineage with g (frontier derives from g)
        .select(
            F.col("p_size").alias("f_size"),
            F.col("min_cents").alias("f_cents"),
        )
    )
    return (
        g.join(
            F.broadcast(frontier),
            (F.col("p_size") == F.col("f_size"))
            & (F.col("cents") == F.col("f_cents")),
        )
        .select(
            "p_size",
            F.col("cents").alias("price_cents"),
            "n_parts",
            "min_partkey",
        )
        .orderBy(F.desc("p_size"))
    )


SKYLINE_PARTS_SQL = """
WITH g AS (
  SELECT p_size, CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents,
         count(*) AS n_parts, min(p_partkey) AS min_partkey
  FROM part GROUP BY 1, 2
),
per_size AS (SELECT p_size, min(cents) AS min_cents FROM g GROUP BY 1),
frontier AS (
  SELECT p_size, min_cents FROM (
    SELECT p_size, min_cents,
           min(min_cents) OVER (ORDER BY p_size DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_larger
    FROM per_size
  ) WHERE best_larger IS NULL OR min_cents < best_larger
)
SELECT g.p_size, g.cents AS price_cents, g.n_parts, g.min_partkey
FROM g JOIN frontier f ON g.p_size = f.p_size AND g.cents = f.min_cents
ORDER BY g.p_size DESC
"""


# --------------------------------------------------------------------------
# BFS hop census over the trade graph (graph family: pagerank ranks,
# triangles measure density, BFS measures REACH).
BFS_HOPS = 4
BFS_SRC_SUPPKEY = 1


def supplier_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reach census from supplier {BFS_SRC_SUPPKEY} over
    the undirected customer--supplier trade graph (same node encoding
    as supplier_pagerank: 2*custkey / 2*suppkey+1): how many customers
    and suppliers sit at exactly 1, 2, .. {BFS_HOPS} hops. This is the
    blast-radius query of fraud investigation -- "who is N
    transactions away from this flagged entity" -- which the
    reference's flat predictions table cannot ask (services/db/
    init.sql:1-31).

    Scale shape: the distinct edge list builds with one corpus shuffle
    and is cached across rounds; each of the {BFS_HOPS} unrolled
    rounds joins the cached edges against the BROADCAST frontier and
    anti-joins the BROADCAST visited set -- both are node sets, ~3
    orders of magnitude smaller than the edge table, so every round is
    a map-side scan of the cached edges instead of re-shuffling them
    (the keyed-join form measured 136 s at the 100x scale test; this
    form 45 s, nearly all of it the one edge build). On a graph whose node
    set outgrows broadcast (billions), drop the two hints and the same
    plan degrades gracefully to shuffle joins; localCheckpoint keeps
    lineage flat either way. Levels are exact: a node's hop is the
    FIRST round that reaches it, pinned by the anti-join. The oracle
    replays the same levels via unrolled CTEs with NOT-IN exclusion --
    different strategy, identical frontier sets."""
    # the memoized weighted edge list IS the distinct pair set (it is a
    # (src, dst) group-by); BFS just drops the weight
    fwd = _trade_fwd(spark, sf_dir).select("src", "dst")
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    src_node = BFS_SRC_SUPPKEY * 2 + 1
    reached = spark.createDataFrame(
        [(src_node, 0)], "node long, hop int"
    ).localCheckpoint()
    frontier = reached.select("node")
    for k in range(1, BFS_HOPS + 1):
        nxt = (
            edges.join(F.broadcast(frontier), edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(
                F.broadcast(reached.select("node")), "node", "left_anti"
            )
            .withColumn("hop", F.lit(k))
            .localCheckpoint()
        )
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    out = (
        reached.groupBy("hop")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.expr("CAST(node % 2 = 0 AS BIGINT)")).alias(
                "n_customers"
            ),
            F.sum(F.expr("CAST(node % 2 = 1 AS BIGINT)")).alias(
                "n_suppliers"
            ),
        )
        .orderBy("hop")
    )
    edges.unpersist()
    return out


def _bfs_sql() -> str:
    src = BFS_SRC_SUPPKEY * 2 + 1
    ctes = [
        f"r0 AS (SELECT CAST({src} AS BIGINT) AS node, 0 AS hop)",
        "f0 AS (SELECT node FROM r0)",
    ]
    for k in range(1, BFS_HOPS + 1):
        ctes.append(
            f"""n{k} AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN f{k - 1} f
    ON e.src = f.node
  WHERE e.dst NOT IN (SELECT node FROM r{k - 1})
)"""
        )
        ctes.append(
            f"r{k} AS (SELECT node, hop FROM r{k - 1}"
            f" UNION ALL SELECT node, {k} AS hop FROM n{k})"
        )
        ctes.append(f"f{k} AS (SELECT node FROM n{k})")
    cte_block = ",\n".join(ctes)
    return f"""
WITH fwd AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
{cte_block}
SELECT CAST(hop AS INT) AS hop, count(*) AS n_nodes,
       CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers,
       CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppliers
FROM r{BFS_HOPS}
GROUP BY hop ORDER BY hop
"""


SUPPLIER_BFS_SQL = _bfs_sql()


# --------------------------------------------------------------------------
# Item-item collaborative filtering over order baskets. Differs from
# event_type_affinity (temporal.py) in the vocabulary regime: event
# types are a ~5-token enum, part keys are an unbounded catalog -- so
# pairs must expand map-side from bounded per-basket arrays and prune
# on support BEFORE any ranking work.
CO_MIN_SUP = 2   # pair must co-occur in >= 2 orders
CO_TOPF = 20     # focus parts: the most-ordered
CO_TOPK = 5      # recommendations per focus part


def part_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Customers who bought X also bought': for the {CO_TOPF}
    most-ordered parts, the {CO_TOPK} strongest co-purchased partners
    by lift = P(a,b) / (P(a) P(b)) in integer ppm (ties by partner id).

    Scale shape: ONE cached distinct (order, part) frame feeds
    everything -- per-part counts, the exact order count, and the pair
    expansion, which never materializes the all-pairs table: the focus
    side's item rows (bounded by 20 parts' order lists) broadcast back
    into the cached items as a map-side equi-join on the order key, so
    only pairs TOUCHING a focus part ever exist. Three earlier drafts,
    all measured at the 100x scale test: C(k,2)-per-basket expansion +
    global pair aggregate 201 s; the same with the basket table cached
    112 s (the collect_set basket build alone is 64 s); this items
    form 41 s. Support prunes at >= {CO_MIN_SUP}; lift is pure BIGINT
    floor math; output is bounded at {CO_TOPF} x {CO_TOPK} rows at any
    corpus size. (If a focus part's order list ever outgrows broadcast
    -- a single item on billions of orders -- drop the hint and the
    same plan shuffles on the order key.)"""
    # memoized distinct basket items (shared with part_triangles); the
    # parquet read replays cheaply for the two count actions below, so
    # no cache/checkpoint is pinned across the sweep
    items = _order_items(spark, sf_dir)
    n_orders = items.select("l_orderkey").distinct().count()
    counts = items.groupBy("l_partkey").agg(
        F.count("*").alias("n_orders_part")
    )
    focus_rows = counts.orderBy(
        F.desc("n_orders_part"), F.asc("l_partkey")
    ).limit(CO_TOPF).collect()
    n_a_map = {r["l_partkey"]: r["n_orders_part"] for r in focus_rows}
    n_a_expr = "CASE " + " ".join(
        f"WHEN part = {k} THEN {v}L" for k, v in n_a_map.items()
    ) + " END"
    focus_items = items.filter(
        F.col("l_partkey").isin(list(n_a_map))
    ).selectExpr("l_orderkey", "l_partkey AS part")
    pairs = (
        items.join(F.broadcast(focus_items), "l_orderkey")
        .filter(F.col("part") != F.col("l_partkey"))
        .selectExpr("part", "l_partkey AS partner")
        .groupBy("part", "partner")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= CO_MIN_SUP)
    )
    scored = pairs.join(
        counts.selectExpr("l_partkey AS partner", "n_orders_part AS n_b"),
        "partner",
    ).selectExpr(
        "part",
        "partner",
        "n_ab",
        f"CAST(n_ab * {n_orders}L * 1000000L div (({n_a_expr}) * n_b)"
        " AS BIGINT) AS lift_ppm",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("part").orderBy(
        F.desc("lift_ppm"), F.desc("n_ab"), F.asc("partner")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CO_TOPK)
        .orderBy("part", "rank")
    )


PART_COOCCURRENCE_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {CO_MIN_SUP}
),
sym AS (
  SELECT pa, pb, n_ab FROM pairs
  UNION ALL SELECT pb AS pa, pa AS pb, n_ab FROM pairs
),
counts AS (
  SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders_part
  FROM lineitem GROUP BY 1
),
focus AS (
  SELECT l_partkey, n_orders_part FROM counts
  ORDER BY n_orders_part DESC, l_partkey ASC LIMIT {CO_TOPF}
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
scored AS (
  SELECT s.pa AS part, s.pb AS partner, s.n_ab,
         CAST(s.n_ab * n.n_orders * 1000000 // (f.n_orders_part * c.n_orders_part)
              AS BIGINT) AS lift_ppm
  FROM sym s
  JOIN focus f ON s.pa = f.l_partkey
  JOIN counts c ON s.pb = c.l_partkey
  CROSS JOIN n
),
ranked AS (
  SELECT part, partner, n_ab, lift_ppm,
         row_number() OVER (PARTITION BY part
             ORDER BY lift_ppm DESC, n_ab DESC, partner ASC) AS rank
  FROM scored
)
SELECT part, partner, n_ab, lift_ppm, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {CO_TOPK}
ORDER BY part, rank
"""


QUERIES = {
    "part_triangles": part_triangles,
    "skyline_parts": skyline_parts,
    "supplier_bfs_hops": supplier_bfs_hops,
    "part_cooccurrence_topk": part_cooccurrence_topk,
    "supplier_pagerank": supplier_pagerank,
    "q7_volume_shipping": q7_volume_shipping,
    "q4_order_priority_exists": q4_order_priority_exists,
    "q12_shipping_delay_classes": q12_shipping_delay_classes,
    "q21_sole_late_supplier": q21_sole_late_supplier,
    "q22_dormant_high_balance": q22_dormant_high_balance,
    "q13_customer_distribution": q13_customer_distribution,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
}

ORACLE = {
    "part_triangles": PART_TRIANGLES_SQL,
    "skyline_parts": SKYLINE_PARTS_SQL,
    "supplier_bfs_hops": SUPPLIER_BFS_SQL,
    "part_cooccurrence_topk": PART_COOCCURRENCE_SQL,
    "supplier_pagerank": SUPPLIER_PAGERANK_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q4_order_priority_exists": Q4_SQL,
    "q12_shipping_delay_classes": Q12_SQL,
    "q21_sole_late_supplier": Q21_SQL,
    "q22_dormant_high_balance": Q22_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_parts_supplier_counts": Q16_SQL,
    "q20_excess_stock_suppliers": Q20_SQL,
}
