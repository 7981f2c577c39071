"""TPC-H analog widening: EXISTS semi-joins, disjunctive scan
predicates, conditional aggregation, top-k with deterministic
tiebreaks, grouping sets, unpivot, and the full ranking-window
function family — each adapted to the fixture schema (no partsupp /
l_shipmode / c_phone columns, see FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.queries import query
from taps_spark.queries.numeric import DECIMAL_T, dsum, dsum_sql

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_late_order_priority", oracle=Q4_ORACLE)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with any lineitem shipped >60 days after order date,
    counted by priority (TPC-H Q4 analog: EXISTS → left-semi join
    with a non-equi conjunct).

    Scale: the semi join shuffles both sides on orderkey once and
    keeps only the orders columns afterward — no row multiplication
    for orders with many late items, which is exactly why EXISTS must
    compile to semi join and not inner join + distinct.
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        t["orders"]
        .join(t["lineitem"], late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS returned_revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY returned_revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", oracle=Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns (TPC-H Q10 analog).

    Deterministic top-k: ties on the sort measure are broken by the
    unique key so LIMIT selects the same set in any engine.
    Scale: returnflag filter is pushed to the lineitem scan; nation
    broadcast; customer↔orders↔lineitem shuffles on their keys; the
    global top-20 is a TakeOrderedAndProject (per-partition heap +
    driver merge), not a full sort.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("returned_revenue"))
        .orderBy(F.desc("returned_revenue"), "c_custkey")
        .limit(20)
    )


Q12_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
       CAST(SUM(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) BETWEEN 31 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
       CAST(SUM(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_slow
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q12_ship_delay_classes", oracle=Q12_ORACLE)
def q12_ship_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay distribution per order priority (TPC-H Q12
    analog, shipmode replaced by delay buckets): conditional
    aggregation — sum(case when) pivots three predicates into one
    pass, no per-bucket scans."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).alias  # noqa: E731
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            bucket(delay <= 30)("n_fast"),
            bucket((delay >= 31) & (delay <= 90))("n_medium"),
            bucket(delay > 90)("n_slow"),
        )
        .orderBy("o_orderpriority")
    )


Q14_ORACLE = f"""
SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END), 2) AS DOUBLE) AS promo_revenue,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 3) AS promo_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
"""


@query("q14_promo_revenue", oracle=Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 analog). The ratio divides
    the two EXACT decimal sums as doubles — identical operands give
    identical IEEE quotients in both engines, so rounding is safe.

    Scale: part side broadcasts; one pass, no shuffle beyond the
    single global aggregate."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DECIMAL_T)
    zero = F.lit(0).cast(DECIMAL_T)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
    total = F.sum(rev)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(promo, 2).cast("double").alias("promo_revenue"),
            F.round(total, 2).cast("double").alias("total_revenue"),
            F.round(100.0 * promo.cast("double") / total.cast("double"), 3).alias("promo_pct"),
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 5 AND 40
GROUP BY p_brand, p_type
ORDER BY n_suppliers DESC, p_brand, p_type
"""


@query("q16_supplier_variety", oracle=Q16_ORACLE)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per brand/type slice (TPC-H Q16 analog,
    partsupp replaced by lineitem observations): grouped COUNT
    DISTINCT — Catalyst expands to a two-level aggregate, partial on
    (brand, type, suppkey) first, so the distinct set never
    concentrates on one node."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter((F.col("p_brand") != "Brand#1") & F.col("p_size").between(5, 40))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), "p_brand", "p_type")
    )


Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey AS b_orderkey,
         {dsum_sql("l_quantity")} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 200
)
SELECT c_custkey, c_name, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = b_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


@query("q18_large_orders", oracle=Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-volume orders and who placed them (TPC-H Q18 analog):
    HAVING on a grouped sum, then join the survivors back to their
    order/customer rows; deterministic top-100 via unique tiebreak.

    Scale: the aggregate shrinks lineitem to one row per qualifying
    order BEFORE the joins, so the join input is ~0.1% of lineitem;
    orders joins on its own key (no re-shuffle under AQE)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    big = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DECIMAL_T)), 2).alias("qty_dec"),
        )
        .filter(F.col("qty_dec") > 200)
        .select("b_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("b_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


Q19_ORACLE = f"""
SELECT COUNT(*) AS n_items,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)
"""


@query("q19_disjunctive_revenue", oracle=Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-attribute predicate revenue (TPC-H Q19
    analog): three OR'd brand/size/quantity conjunctions spanning
    both join sides — the optimizer-stressing shape. Catalyst still
    extracts the common `p_size BETWEEN 1 AND 50`-style bounds it can
    push; the residual OR evaluates post-join in one codegen stage."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    q, b, s, ty = F.col("l_quantity"), F.col("p_brand"), F.col("p_size"), F.col("p_type")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((ty == "PROMO") & s.between(20, 50) & (q >= 25))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


WINDOW_FAMILY_ORACLE = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price,
       LAG(ROUND(o_totalprice, 2)) OVER w_time  AS prev_price,
       LEAD(ROUND(o_totalprice, 2)) OVER w_time AS next_price,
       FIRST_VALUE(o_orderkey) OVER w_time      AS first_order,
       CAST(NTILE(4) OVER w_price AS INT)       AS price_quartile,
       ROUND(PERCENT_RANK() OVER w_price, 6)    AS price_pctrank
FROM orders
WINDOW w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@query("window_function_family", oracle=WINDOW_FAMILY_ORACLE)
def window_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window family in one pass: lag, lead,
    first_value over event-time order; ntile + percent_rank over
    value order. Both windows include the unique key as tiebreak —
    without it ntile/percent_rank are nondeterministic under ties.

    Scale: both windows share PARTITION BY o_custkey, so Spark plans
    ONE hash-partition exchange on o_custkey and two in-partition
    sorts — confirm with .explain (single Exchange)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    price = F.round("o_totalprice", 2)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        price.alias("price"),
        F.lag(price).over(w_time).alias("prev_price"),
        F.lead(price).over(w_time).alias("next_price"),
        F.first("o_orderkey").over(w_time).alias("first_order"),
        F.ntile(4).over(w_price).alias("price_quartile"),
        F.round(F.percent_rank().over(w_price), 6).alias("price_pctrank"),
    ).orderBy("o_custkey", "o_orderkey")


GROUPING_SETS_ORACLE = f"""
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {dsum_sql("o_totalprice")} AS total_spend
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
ORDER BY region_name, priority
"""


@query("agg_grouping_sets", oracle=GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube): per
    (region, priority), per region, and grand total in one logical
    pass. COALESCE labels the super-aggregate rows portably (fixture
    names are never NULL, so no ambiguity).

    Scale: Catalyst plans an Expand (3 replicas tagged by grouping
    id) + one shuffle — same cost shape as rollup; at 100 TB prefer
    this over 3 separate jobs re-reading the fact table."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    joined = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return (
        joined.groupingSets(
            [["r_name", "o_orderpriority"], ["r_name"], []],
            "r_name",
            "o_orderpriority",
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_spend",
        )
        .orderBy("region_name", "priority")
    )


UNPIVOT_ORACLE = f"""
SELECT l_returnflag, 'l_quantity' AS measure,
       {dsum_sql("l_quantity")} AS total, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'l_extendedprice', {dsum_sql("l_extendedprice")}, COUNT(*)
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'l_discount', {dsum_sql("l_discount")}, COUNT(*)
FROM lineitem GROUP BY l_returnflag
ORDER BY l_returnflag, measure
"""


@query("unpivot_measures", oracle=UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) then per-measure aggregation — the
    inverse of pivot, used to normalize N metric columns into one
    (metric, value) stream for generic downstream rollups.

    Scale: unpivot is a zero-shuffle Expand (3× rows, narrow); the
    single shuffle is the groupBy. The oracle's UNION ALL of three
    scans shows exactly what this saves: one fact-table read, not
    three."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.unpivot(
            ["l_returnflag"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "val",
        )
        .groupBy("l_returnflag", "measure")
        .agg(dsum("val").alias("total"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "measure")
    )


Q6_ORACLE = f"""
SELECT COUNT(*) AS n_items,
       {dsum_sql("l_extendedprice * l_discount")} AS forecast_revenue_delta
FROM lineitem
WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 analog): pure scan-side
    conjunctive range predicates + ungrouped aggregate — the query
    where pushdown IS the plan. All three filters reach the parquet
    scan (PushedFilters); at 100 TB with date-partitioned layout the
    shipdate range also prunes partitions."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1996-12-31")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "forecast_revenue_delta"
            ),
        )
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_order_count_distribution", oracle=Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram including zero-order customers
    (TPC-H Q13 analog): LEFT join so empty groups survive —
    COUNT(o_orderkey) counts non-null keys only. Two-level aggregate:
    big shuffle on custkey shrinks to |distinct counts| rows."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS r_suppkey,
         {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-03-31'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON r_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue supplier(s) for a quarter (TPC-H Q15 analog):
    aggregate → global-max scalar subquery → equality join back.
    Decorrelated Spark shape: the 1-row max broadcast-joins against
    the per-supplier revenue (no window over a global sort). Ties all
    surface (= semantics), ordered by key."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(F.col("l_shipdate").between("1996-01-01", "1996-03-31"))
        .groupBy(F.col("l_suppkey").alias("r_suppkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("best_rev"))
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("best_rev"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("r_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q21_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, l_suppkey,
         MAX(l_shipdate > o_orderdate + INTERVAL 90 DAY) AS s_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_orderkey, l_suppkey
),
ord AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN s_late THEN 1 ELSE 0 END) AS n_late_supp
  FROM per_order GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order p
JOIN ord USING (l_orderkey)
JOIN supplier ON s_suppkey = p.l_suppkey
WHERE p.s_late AND ord.n_supp >= 2 AND ord.n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@query("q21_sole_late_supplier", oracle=Q21_ORACLE)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late supplier on multi-supplier
    orders (TPC-H Q21 analog; late = shipped >90 days after order
    date). The exists/not-exists pair decorrelated into per-(order,
    supplier) flags + per-order counts — one aggregation tree instead
    of two correlated subqueries per row, the shape that survives
    100 TB.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    per_order = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("s_late")
        )
    )
    ord_stats = per_order.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("s_late"), 1).otherwise(0)).alias("n_late_supp"),
    )
    return (
        per_order.join(ord_stats, "l_orderkey")
        .filter(F.col("s_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q8_ORACLE = """
WITH sales AS (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
         n.n_name AS supp_nation,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS rev
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n ON n.n_nationkey = s_nationkey
  WHERE r_name = 'AMERICA'
)
SELECT order_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
FROM sales
GROUP BY order_year
ORDER BY order_year
"""


@query("q8_market_share", oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's yearly share of supplier revenue into AMERICA-region
    customers (TPC-H Q8 analog): 7-table join + conditional share
    ratio. Share = exact decimal sums divided as doubles (identical
    operands → identical IEEE quotient in both engines).

    Scale: region filter prunes customers BEFORE the fact join (the
    filter rides the customer-side dimension broadcasts); lineitem
    shuffles once on orderkey; every dimension broadcasts.
    """
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "supplier")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    amer = t["region"].filter(F.col("r_name") == "AMERICA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DECIMAL_T)
    zero = F.lit(0).cast(DECIMAL_T)
    nat3 = F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero))
    total = F.sum(rev)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(amer), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.round(nat3.cast("double") / total.cast("double"), 6).alias("mkt_share"))
        .orderBy("order_year")
    )


Q9_ORACLE = f"""
SELECT n_name AS supp_nation,
       CAST(YEAR(l_shipdate) AS INT) AS ship_year,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       {dsum_sql("p_retailprice * l_quantity * 0.01")} AS cost_proxy,
       {dsum_sql("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01")} AS margin
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY supp_nation, ship_year
ORDER BY supp_nation, ship_year
"""


@query("q9_nation_margin", oracle=Q9_ORACLE)
def q9_nation_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation yearly revenue/cost/margin (TPC-H Q9
    analog; the fixtures carry no partsupp supply cost, so cost is
    proxied as 1% of retail price × quantity — the plan shape, a
    fact-to-two-dimensions join with multi-measure rollup, is what's
    exercised). All three measures share one decimal-exact pass."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity") * 0.01
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"), F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            dsum(rev).alias("revenue"),
            dsum(cost).alias("cost_proxy"),
            dsum(rev - cost).alias("margin"),
        )
        .orderBy("supp_nation", "ship_year")
    )


Q22_ORACLE = f"""
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       COUNT(*) AS n_dormant_rich,
       {dsum_sql("c_acctbal")} AS total_bal
FROM customer, ab
WHERE c_acctbal > ab.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("q22_dormant_rich_customers", oracle=Q22_ORACLE)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no URGENT orders, per
    nation (TPC-H Q22 analog sans phone prefixes): scalar-average subquery
    (exact decimal sum ÷ count, so the threshold is bit-identical in
    both engines) + NOT EXISTS → left-anti join.

    Scale: the 1-row average broadcasts; the anti join shuffles
    customer/orders once on custkey; aggregation is map-side-combined
    on the 25 nations.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DECIMAL_T)).cast("double") / F.count("*")).alias(
                "avg_bal"
            )
        )
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_dormant_rich"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_nationkey")
    )


Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey AS b_partkey, MIN(supplycost) AS best_cost
  FROM ps GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name,
       ROUND(s_acctbal, 2) AS acctbal, supplycost
FROM ps
JOIN best ON b_partkey = l_partkey AND supplycost = best_cost
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 5
ORDER BY p_partkey, s_suppkey
"""


@query("q2_min_cost_supplier", oracle=Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per small part (TPC-H Q2 analog; lineitem
    stands in for partsupp — the fixture has no partsupp table, see
    FIXTURES.md §B). The correlated MIN subquery decorrelates into an
    aggregate + equality join back; MIN over doubles is exact, so the
    equality is engine-portable.

    Scale: the part filter broadcast-semi-joins the lineitem scan
    BEFORE any aggregation — the 100 TB fact table shrinks by the
    part selectivity first; both aggs then shuffle on l_partkey-led
    keys and the tiny best-cost side rides the same partitioning."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    small_parts = t["part"].filter(F.col("p_size") <= 5)
    ps = (
        t["lineitem"]
        .join(F.broadcast(small_parts.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supplycost"))
    )
    best = ps.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supplycost").alias("best_cost")
    )
    return (
        ps.join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("supplycost") == F.col("best_cost")),
        )
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name",
            F.round("s_acctbal", 2).alias("acctbal"), "supplycost",
        )
        .orderBy("p_partkey", "s_suppkey")
    )


Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey, {dsum_sql("l_extendedprice * l_quantity")} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > (SELECT {dsum_sql("part_value")} / 1500 FROM pv)
ORDER BY part_value DESC, l_partkey
"""


@query("q11_important_parts", oracle=Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose inventory value exceeds 1/1500 of the corpus total
    (TPC-H Q11 analog). Both the per-part values and the global
    threshold go through the exact-decimal sum, so the > comparison
    lands on bit-identical doubles in either engine — a double SUM of
    the 2-dp values could differ in the last ulp and flip borderline
    rows.

    Scale: one shuffle on l_partkey; the global total is a 1-row
    reduce of the already-aggregated per-part frame (reuses the agg
    output, not a second fact-table scan) and broadcasts back."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    pv = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
    )
    thr = pv.agg((dsum("part_value") / 1500).alias("threshold"))
    return (
        pv.join(F.broadcast(thr), F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q20_ORACLE = """
WITH sq AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey, l_partkey
),
tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
  FROM sq GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sq JOIN tot ON t_partkey = l_partkey
  WHERE qty > 0.15 * total_qty
)
ORDER BY s_suppkey
"""


@query("q20_excess_share_suppliers", oracle=Q20_ORACLE)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers carrying >15% of any 'small%' part's shipped volume
    (TPC-H Q20 analog): nested IN-subquery flattened to a left-semi
    join chain. Quantities are integral doubles, so the share
    comparison is exact cross-engine.

    Scale: name-filtered parts broadcast-prune the fact scan first;
    the per-(part,supplier) and per-part aggs share an l_partkey-led
    shuffle; supplier is probed with a semi join (no row
    multiplication, dedup for free)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    sq = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = sq.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    excess = (
        sq.join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > 0.15 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


WINDOW_DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(DENSE_RANK() OVER w_price AS INT)          AS price_dense_rank,
       ROUND(CUME_DIST() OVER w_price, 6)              AS price_cume_dist,
       NTH_VALUE(o_orderkey, 2) OVER w_full            AS second_order,
       LAG(o_orderkey, 2, -1) OVER w_time              AS order_2_back,
       LAST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END IGNORE NULLS)
         OVER w_time                                   AS last_finished_order
FROM orders
WINDOW w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
       w_full  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


@query("window_distribution_family", oracle=WINDOW_DISTRIBUTION_ORACLE)
def window_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution/navigation window functions the first family
    left out: dense_rank + cume_dist over value order, nth_value over
    the full-partition frame, offset lag with an explicit default,
    and IGNORE NULLS last_value (latest *finished* order as of each
    row — the conditional carry-forward idiom behind
    events_attribution_last_touch).

    Scale: all three windows share PARTITION BY o_custkey — one hash
    exchange, in-partition sorts only (the same single-exchange
    discipline tests/test_plans.py pins for the first family)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w_time.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("price_cume_dist"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        F.lag("o_orderkey", 2, -1).over(w_time).alias("order_2_back"),
        F.last(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey")), ignorenulls=True
        ).over(w_time).alias("last_finished_order"),
    ).orderBy("o_custkey", "o_orderkey")
