"""Relational-core query inventory (SURVEY.md §2b surface).

Each query is a named registry entry with a DuckDB oracle. These are
the operators the reference lacks entirely (it only scans/counts
tables — SURVEY.md §2b); the new engine exposes them as first-class,
Catalyst-optimized DataFrame plans.

Determinism rules used throughout (see queries/__init__.py):
- float aggregates rounded (2dp for big sums, 4dp for avgs/ratios)
- orderings always end with a unique key for stable top-k cuts
- DuckDB type alignment: sum(BIGINT)→CAST BIGINT, length()/year()→CAST
  INT, row_number()→CAST INT to match Spark result types exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.operators.relational import asof_join, asof_join_nearest, top_k_per_group
from taps_spark.queries import query
from taps_spark.queries.numeric import davg, dsum

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 analog — scan + filter + project + agg + sort in one.
# --------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,6))), 2) AS DOUBLE)       AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,6))), 2) AS DOUBLE)  AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 4)      AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 4)      AS avg_disc,
  COUNT(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 analog).

    Plan shape to verify at scale: parquet scan with pushed
    l_shipdate filter + pruned columns → partial agg (map-side
    combine) → single shuffle on (l_returnflag, l_linestatus) → final
    agg. Group cardinality is tiny (≤ 9 groups) so the shuffle is
    negligible at any SF.
    """
    from taps_spark.io.tables import parallelize_cpu

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Filter FIRST (stays pushed into the scan), then widen: the
    # decimal-quantized partial agg is the CPU cost here, and the
    # single-row-group fixture file scans as one task. Conditional —
    # no-op whenever the scan already has >= cores partitions (i.e.
    # any real multi-file table), so the shuffle never appears at scale.
    return (
        parallelize_cpu(
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q3 / Q5 analogs)
# --------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue,
  o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue (TPC-H Q3 analog): 3-way join, agg, top-10.

    Scale: customer is the small side after its segment filter —
    Catalyst broadcasts it under AQE; the orders↔lineitem join
    shuffles on orderkey (both sides pre-filtered by pushed date
    predicates). Ordering by the *rounded* revenue with an orderkey
    tiebreak keeps the top-10 cut deterministic across engines.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


Q5_ORACLE = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_region_revenue", oracle=Q5_ORACLE)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation (TPC-H Q5 analog): 6-way join.

    Scale: region/nation/supplier are dimension tables — broadcast
    explicitly so the only real shuffles are customer↔orders and
    orders↔lineitem on their keys. The s_nationkey = c_nationkey
    condition rides on the supplier broadcast join (no extra shuffle).
    """
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Join strategies: broadcast, semi, anti, range (theta), as-of
# --------------------------------------------------------------------------

BROADCAST_ORACLE = """
SELECT p_brand,
       COUNT(*)                                      AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS brand_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


@query("join_broadcast_enrich", oracle=BROADCAST_ORACLE)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim enrichment with an explicit broadcast hint.

    Scale: part is O(SF·200k) rows — comfortably broadcastable at any
    realistic dim size; the join then requires NO shuffle of the
    100 TB fact side (map-side hash join), and the brand agg shuffles
    only the tiny partial-agg output.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("brand_revenue"),
        )
        .orderBy("p_brand")
    )


SEMI_ORACLE = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > 1000.0
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@query("join_semi_active_customers", oracle=SEMI_ORACLE)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS: customers with ≥1 order.

    Scale: semi-join only ships the distinct key set of orders —
    Catalyst builds it as a shuffled semi or broadcasts the key set
    under AQE; output never duplicates customer rows.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .filter(F.col("c_acctbal") > 1000.0)
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@query("join_anti_dormant_customers", oracle=ANTI_ORACLE)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS: customers with no orders.

    The anti-join is also the engine's idempotent-write primitive
    (reference repairs duplicate-PK errors at lib/taps/
    data_stream.rb:217-226; we prevent them instead — io/sinks.py).
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


RANGE_ORACLE = """
SELECT b.band,
       COUNT(*)                          AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS band_total
FROM orders
JOIN (VALUES ('p00_low',        0.0,  50000.0),
             ('p01_mid',    50000.0, 150000.0),
             ('p02_high',  150000.0, 300000.0),
             ('p03_jumbo', 300000.0, 1e12)) AS b(band, lo, hi)
  ON o_totalprice >= b.lo AND o_totalprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""


@query("join_range_price_bands", oracle=RANGE_ORACLE)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: bucket facts into value bands from a tiny
    band table.

    Scale: a non-equi join has no shuffle key — the ONLY sane physical
    plan is broadcast-nested-loop with the band table broadcast; the
    hint pins that. 4 bands × N rows stays linear in N.
    """
    t = load_tables(spark, sf_dir, ("orders",))
    bands = spark.createDataFrame(
        [
            ("p00_low", 0.0, 50000.0),
            ("p01_mid", 50000.0, 150000.0),
            ("p02_high", 150000.0, 300000.0),
            ("p03_jumbo", 300000.0, 1e12),
        ],
        "band string, lo double, hi double",
    )
    return (
        t["orders"]
        .join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("band_total"),
        )
        .orderBy("band")
    )


ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey  AS asof_o_orderkey,
       o.o_orderdate AS asof_o_orderdate
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
ORDER BY e.event_id
"""


@query("join_asof_latest_order", oracle=ASOF_ORACLE)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event paired with the issuing user's most
    recent order at event time (ties → max orderkey).

    Implemented via the union+window formulation in
    operators/relational.asof_join — single shuffle on the key,
    linear per-key scan; see that docstring for why this is the
    100 TB-safe plan versus a per-key range join.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    ev = t["events"].select("event_id", "user_id", "ts").withColumn("__key", F.col("user_id"))
    orders = t["orders"].select(
        F.col("o_custkey").alias("__key"), "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        ev,
        orders,
        key="__key",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_o_orderkey"),
        F.col("asof_o_orderdate"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Aggregation variants: rollup, cube, distinct
# --------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*)                          AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("agg_rollup", oracle=ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (flag, status) → (flag) → ().

    Scale: Spark expands grouping sets map-side then shuffles once;
    cardinality stays tiny here.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_price,
       COUNT(*)                       AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("agg_cube", oracle=CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations over (flag, status)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice").alias("sum_price"), F.count("*").alias("n_rows"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey)                 AS n_parts,
       COUNT(DISTINCT l_suppkey)                 AS n_supps,
       COUNT(*)                                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_distinct", oracle=DISTINCT_ORACLE)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-column DISTINCT aggregation.

    Scale: two distinct columns → Catalyst plans an expand + two-phase
    agg; for approximate needs at 100 TB switch to
    approx_count_distinct (HLL, no expand) — kept exact here for the
    oracle.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Window functions: rank / running / moving frame
# --------------------------------------------------------------------------

RANK_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


@query("window_rank_top_orders", oracle=RANK_ORACLE)
def window_rank_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number window).

    Scale: one shuffle on o_custkey, per-key partial sort; no global
    sort of the fact table. Unique o_orderkey tiebreak keeps the cut
    deterministic.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    top = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    return top.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("rn"),
    ).orderBy("o_custkey", "rn")


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@query("window_running_total", oracle=RUNNING_ORACLE)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (cumulative ROWS frame)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


MOVING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(AVG(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg_qty
FROM lineitem
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


@query("window_moving_avg", oracle=MOVING_ORACLE)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame moving average per supplier (4-row window)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # (l_orderkey, l_linenumber) is NOT unique in these fixtures (the
    # driver seeds duplicate "PK" rows with different payloads —
    # dedup-stress data); partkey + extendedprice make the frame order
    # total, so both engines see identical 4-row windows.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .rowsBetween(-3, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 4).alias("moving_avg_qty"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

SETOPS_ORACLE = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'both' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT 'customer_only' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT 'either' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
ORDER BY op, nationkey
"""


@query("set_ops_nations", oracle=SETOPS_ORACLE)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over customer vs supplier nations,
    tagged and unioned into one result."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("op"), "nationkey")
    only = c.exceptAll(s).select(F.lit("customer_only").alias("op"), "nationkey")
    either = c.union(s).distinct().select(F.lit("either").alias("op"), "nationkey")
    return both.unionByName(only).unionByName(either).orderBy("op", "nationkey")


# --------------------------------------------------------------------------
# Scalar expression surface: string / date / math
# --------------------------------------------------------------------------

STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand)                                   AS brand_u,
       LOWER(p_type)                                    AS type_l,
       CAST(LENGTH(p_name) AS INT)                      AS name_len,
       SUBSTRING(p_type, 1, 5)                          AS type_pfx,
       REPLACE(p_name, ' ', '_')                        AS name_snake,
       REVERSE(p_brand)                                 AS brand_rev,
       CAST(p_size % 7 AS INT)                          AS size_mod,
       ROUND(p_retailprice * 1.1, 2)                    AS price_adj
FROM part
ORDER BY p_partkey
"""


@query("scalar_string_funcs", oracle=STRING_ORACLE)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math expression surface — all JVM-side codegen'd
    built-ins (no UDFs; the reference has no expression language at
    all, SURVEY.md §2b)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_adj"),
    ).orderBy("p_partkey")


DATE_ORACLE = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT)                     AS order_year,
       CAST(MONTH(o_orderdate) AS INT)                    AS order_month,
       CAST(DAY(o_orderdate) AS INT)                      AS order_day,
       CAST(QUARTER(o_orderdate) AS INT)                  AS order_quarter,
       DATE_TRUNC('month', o_orderdate)                   AS month_start,
       o_orderdate + INTERVAL 30 DAY                      AS due_date,
       CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start
FROM orders
ORDER BY o_orderkey
"""


@query("scalar_date_funcs", oracle=DATE_ORACLE)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time expression surface: extract, truncate, arithmetic."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Sort / limit / offset (reference parity #6/#7 + pagination)
# --------------------------------------------------------------------------

SORT_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 100
"""


@query("sort_limit_offset", oracle=SORT_ORACLE)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + LIMIT/OFFSET page (reference's offset-paginated
    scan, lib/taps/data_stream.rb:76-87, made deterministic).

    Scale note: the reference's OFFSET pagination is O(n²) over a
    table (README.rdoc:36); here a single global top-(150) sort
    (TakeOrderedAndProject) feeds the page — and real pagination at
    scale should be keyset (see scan_keyset_page in
    queries/reference.py).
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .offset(100)
        .limit(50)
    )


# --------------------------------------------------------------------------
# Pivot (conditional aggregation)
# --------------------------------------------------------------------------

PIVOT_ORACLE = """
SELECT l_linestatus,
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(27,6)) END), 2) AS DOUBLE) AS "A",
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(27,6)) END), 2) AS DOUBLE) AS "N",
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(27,6)) END), 2) AS DOUBLE) AS "R"
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("pivot_returnflag", oracle=PIVOT_ORACLE)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot quantity by return flag (explicit value list → single
    shuffle, no extra pass to discover pivot values)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(27,6)")), 2).cast("double"))
        .orderBy("l_linestatus")
    )


SETOPS_ALL_ORACLE = """
WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
     s AS (SELECT s_nationkey AS nationkey FROM supplier),
     ia AS (SELECT * FROM c INTERSECT ALL SELECT * FROM s),
     ea AS (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM ia GROUP BY nationkey
UNION ALL
SELECT 'except_all', nationkey, COUNT(*) FROM ea GROUP BY nationkey
UNION ALL
SELECT 'union_all', nationkey, COUNT(*) FROM (SELECT * FROM c UNION ALL SELECT * FROM s) GROUP BY nationkey
ORDER BY op, nationkey
"""


@query("set_ops_all_variants", oracle=SETOPS_ALL_ORACLE)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL / UNION
    ALL) over customer-vs-supplier nation bags — duplicate
    multiplicities preserved per SQL bag semantics (intersect = min of
    the two counts, except = difference floored at 0), rolled up per
    key so the result stays small.

    Scale: each ALL-variant is one hash shuffle on the value; no
    distinct step, so no second aggregation pass."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))

    def rollup(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("nationkey").agg(F.count("*").alias("n")).select(
            F.lit(op).alias("op"), "nationkey", "n"
        )

    return (
        rollup(c.intersectAll(s), "intersect_all")
        .unionByName(rollup(c.exceptAll(s), "except_all"))
        .unionByName(rollup(c.unionAll(s), "union_all"))
        .orderBy("op", "nationkey")
    )


ARRAY_NULL_ORACLE = """
SELECT vec_id,
       CAST(LEN(embedding) AS INT)                                   AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0                  AS first_val,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0           AS max_val,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0           AS min_val,
       ROUND(list_sum(embedding::DOUBLE[]), 4) + 0.0                 AS sum_val,
       CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT)          AS n_positive,
       COALESCE(NULLIF(label, 0), -1)                                AS label_or_neg1
FROM embeddings
ORDER BY vec_id
"""


@query("scalar_array_null_funcs", oracle=ARRAY_NULL_ORACLE)
def scalar_array_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function + null-handling surface over the embedding
    column: size / element_at / array_max / array_min / aggregate-sum
    / filter-count, plus NULLIF→COALESCE. All map-only codegen'd
    column expressions; float values pass through double before
    rounding (ROUND on raw FLOAT is a no-op in DuckDB — cast first)."""
    from taps_spark.operators.similarity import as_double

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    v = F.col("embedding")
    dv = as_double(v)
    # `+ 0.0` collapses IEEE negative zero to +0.0 on both engines:
    # round() can yield -0.0, which compares equal pairwise but
    # renders as '-0.0' and de-syncs order-insensitive hash compares.
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        (F.round(F.element_at(v, 1).cast("double"), 4) + 0.0).alias("first_val"),
        (F.round(F.array_max(v).cast("double"), 4) + 0.0).alias("max_val"),
        (F.round(F.array_min(v).cast("double"), 4) + 0.0).alias("min_val"),
        (F.round(
            F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x), 4
        ) + 0.0).alias("sum_val"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.coalesce(F.nullif("label", F.lit(0)), F.lit(-1)).alias("label_or_neg1"),
    ).orderBy("vec_id")


SALTED_ORACLE = """
SELECT user_id, c_name,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY user_id, c_name
ORDER BY user_id
"""


@query("join_salted_skew", oracle=SALTED_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (events fact × customer dim on user_id, 8
    salts) aggregated per user — the explicit hot-key defense, proved
    result-identical to the plain join by the oracle: salting must be
    invisible in the output, only in the partition histogram.

    Scale: the fact side pays one narrow map (hash → salt); the dim
    side replicates 8× (keep it the SMALL side); the hot key's rows
    spread across 8 partitions instead of melting one executor.
    """
    from taps_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, ("events", "customer"))
    ev = t["events"].select("user_id", "value")
    cust = t["customer"].select(F.col("c_custkey"), "c_name")
    joined = salted_join(
        ev.withColumnRenamed("user_id", "c_custkey"), cust, on="c_custkey", num_salts=8
    )
    return (
        joined.groupBy(F.col("c_custkey").alias("user_id"), "c_name")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("user_id")
    )


MAP_FUNCS_ORACLE = """
SELECT event_id,
       CAST(LEN(json_keys(props)) AS INT)                  AS n_keys,
       json_keys(props)[1]                                 AS first_key,
       CAST(json_extract(props, '$.k') AS INT)             AS k_value,
       CAST(json_extract(props, '$.k') AS INT) % 10 = 0    AS k_div10,
       '{"k":' || (CAST(json_extract(props, '$.k') AS INT) + 1) || '}' AS bumped_json,
       CAST(LEN(json_keys(props)) + 1 AS INT)              AS n_keys_concat
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


@query("scalar_map_funcs", oracle=MAP_FUNCS_ORACLE)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: JSON → map<string,int> via
    from_json, then map_keys / element_at / map_contains_key /
    transform_values / map_concat / to_json. All map-only codegen'd
    expressions — the map column never leaves the executor as an
    object, only flattened scalars come back."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    m = F.from_json("props", "map<string,int>")
    return (
        ev.filter(F.col("event_id") < 200)
        .select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.size("m").alias("n_keys"),
            F.element_at(F.map_keys("m"), 1).alias("first_key"),
            F.element_at("m", F.lit("k")).alias("k_value"),
            (F.element_at("m", F.lit("k")) % 10 == 0).alias("k_div10"),
            F.to_json(F.transform_values("m", lambda k, v: v + 1)).alias("bumped_json"),
            F.size(F.map_concat("m", F.create_map(F.lit("extra"), F.lit(1)))).alias(
                "n_keys_concat"
            ),
        )
        .orderBy("event_id")
    )


RANGE_FRAME_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders
)
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY d
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS spend_30d
FROM o
ORDER BY o_custkey, o_orderkey
"""


@query("window_time_range_frame", oracle=RANGE_FRAME_ORACLE)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-DAY customer spend via a RANGE window frame keyed
    on days-since-epoch — a VALUE-based frame (all orders within 30
    days, however many rows that is), vs the ROWS frame in
    window_moving_avg. Peers at the same day aggregate identically
    regardless of tie order, so the result is deterministic.

    Money sums run in DECIMAL(18,2) (see queries/numeric.py rules) —
    double accumulation diverges across engines on .xx5 ties."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("price").over(w), 2).cast("double").alias("spend_30d"),
    ).orderBy("o_custkey", "o_orderkey")


NULL_SAFE_JOIN_ORACLE = """
WITH a AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
  FROM customer
),
b AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END AS nk
  FROM supplier
)
SELECT COALESCE(a.nk, -1) AS nationkey, COUNT(*) AS n_pairs
FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
GROUP BY 1
ORDER BY nationkey
"""


@query("join_null_safe", oracle=NULL_SAFE_JOIN_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other — the semantics plain equality silently drops.
    The NULL bucket is the canonical skew hazard at scale (every
    null-keyed row lands in one partition under a plain shuffle);
    eqNullSafe keeps it a single hash key, which AQE's skew-join
    split or an upstream salt then handles — the engine still plans a
    normal hash join, not a cross-product."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk")
    )
    b = t["supplier"].select(
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nk_b")
    )
    return (
        a.join(b, a["nk"].eqNullSafe(b["nk_b"]))
        .groupBy("nk")
        .agg(F.count("*").alias("n_pairs"))
        # -1 encodes the matched-NULL bucket: an integer output column
        # keeps both engines' pandas dtype int64 (a NULL would force
        # float64 + NaN, the one value hash functions disagree on).
        .select(F.coalesce(F.col("nk"), F.lit(-1)).alias("nationkey"), "n_pairs")
        .orderBy("nationkey")
    )


ASOF_NEAREST_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN b.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR
              epoch_us(e.ts) - epoch_us(CAST(b.o_orderdate AS TIMESTAMP))
              <= epoch_us(CAST(f.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts))
            THEN b.o_orderkey ELSE f.o_orderkey END AS near_o_orderkey,
       CASE WHEN b.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR
              epoch_us(e.ts) - epoch_us(CAST(b.o_orderdate AS TIMESTAMP))
              <= epoch_us(CAST(f.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts))
            THEN b.o_orderdate ELSE f.o_orderdate END AS near_o_orderdate
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND CAST(o_orderdate AS TIMESTAMP) <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) b ON TRUE
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND CAST(o_orderdate AS TIMESTAMP) > e.ts
  ORDER BY o_orderdate ASC, o_orderkey ASC
  LIMIT 1
) f ON TRUE
ORDER BY e.event_id
"""


@query("join_asof_nearest", oracle=ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest': each event paired with the
    user's order CLOSEST in time, before or after (pandas
    merge_asof(direction='nearest') parity; tie → the earlier order).

    Both direction candidates ride ONE shuffle and one sort
    (operators/relational.asof_join_nearest: backward = last() over
    the preceding frame, forward = first() over the following frame,
    row-local distance CASE picks the winner) — the naive
    two-range-join formulation the oracle uses would shuffle twice
    and explode per-key at scale.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    ev = t["events"].select("event_id", "user_id", "ts").withColumn("__key", F.col("user_id"))
    orders = t["orders"].select(
        F.col("o_custkey").alias("__key"), "o_orderdate", "o_orderkey"
    )
    joined = asof_join_nearest(
        ev,
        orders,
        key="__key",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "near_o_orderkey", "near_o_orderdate"
    ).orderBy("event_id")


BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(support AS BIGINT) AS support
FROM pairs
WHERE support >= 2
ORDER BY support DESC, part_a, part_b
"""


@query("join_market_basket_pairs", oracle=BASKET_ORACLE)
def join_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-ordered in the same order,
    with support ≥ 2 (the pairwise-support pass of FP-growth-style
    association mining).

    Scale: the pair expansion is a self-join WITHIN an order — lineitem
    holds ≤ 7 items per order, so pairs are ≤ 21 per order (bounded
    fan-out, linear in orders, never |parts|²). One shuffle on
    orderkey for the expansion, one on the pair for support counts;
    both map-side combined. A 100 TB run caps per-basket fan-out by
    filtering giant baskets first (they are bots/outliers in retail
    data anyway).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
    )


ASOF_TOLERANCE_ORACLE = """
WITH j AS (
  SELECT e.event_id, e.event_type, e.ts,
         o.o_orderkey, o.o_orderdate,
         DATEDIFF('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE)) AS stale_days
  FROM events e
  LEFT JOIN LATERAL (
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 1
  ) o ON TRUE
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN stale_days <= 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched_within,
       CAST(SUM(CASE WHEN stale_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale_rejected,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_order,
       ROUND(AVG(CASE WHEN stale_days <= 90 THEN CAST(stale_days AS DOUBLE) END), 4)
         AS avg_stale_days_within
FROM j
GROUP BY event_type
ORDER BY event_type
"""


@query("join_asof_tolerance", oracle=ASOF_TOLERANCE_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas merge_asof's
    `tolerance=`, kdb aj within a window): each event takes the user's
    most recent order only if it is at most 90 days old — a match
    older than the tolerance is REJECTED, because joining a summer
    event to a winter price is worse than admitting there is no
    match. Reports the accept/reject/no-match split per event type
    plus mean accepted staleness.

    Scale: the match itself is the proven union+window asof_join
    (one shuffle on the key, linear per-key scan); the tolerance is a
    pure post-filter expression on the matched row — no second join,
    no extra shuffle, and the rejection logic costs nothing at
    100 TB.

    Determinism: staleness is an integer calendar-day difference on
    both engines; the only float is the rounded mean of those
    integers.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    ev = t["events"].select("event_id", "event_type", "user_id", "ts").withColumn(
        "__key", F.col("user_id")
    )
    orders = t["orders"].select(
        F.col("o_custkey").alias("__key"), "o_orderdate", "o_orderkey"
    )
    j = asof_join(
        ev,
        orders,
        key="__key",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["o_orderkey", "o_orderdate"],
    ).select(
        "event_type",
        "asof_o_orderkey",
        F.datediff(F.to_date("ts"), F.col("asof_o_orderdate")).alias("stale_days"),
    )
    within = F.col("stale_days") <= 90
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(within, 1).otherwise(0)).cast("long").alias("n_matched_within"),
            F.sum(F.when(F.col("stale_days") > 90, 1).otherwise(0))
            .cast("long")
            .alias("n_stale_rejected"),
            F.sum(F.when(F.col("asof_o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_no_order"),
            F.round(
                F.avg(F.when(within, F.col("stale_days").cast("double"))), 4
            ).alias("avg_stale_days_within"),
        )
        .orderBy("event_type")
    )


BOOLEAN_AGG_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_100,
       BOOL_AND(value > 0)   AS all_positive,
       BOOL_OR(value > 450)  AS any_over_450,
       BOOL_AND(value <= 490.02) AS none_over_max,
       CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
         = CAST(COUNT(*) AS BIGINT) AS all_over_100
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("agg_boolean_funcs", oracle=BOOLEAN_AGG_ORACLE)
def agg_boolean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-aggregate surface (count_if / every / any — the ANSI
    bool_and/bool_or family) per event type — the predicate-census
    aggregates a data-quality gate is written in ("did EVERY row pass",
    "did ANY row trip the alarm", "how many exceeded the threshold"),
    completing the aggregation surface next to the bitwise and
    exact-mode entries (SURVEY §2b aggregations).

    Exactness: boolean and integer outputs only; the threshold
    comparisons are identical double literals both engines.

    Scale: one map-side-combined grouped aggregate over the scan —
    every one of these folds to a partial per task.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("count_if(value > 100)").alias("n_over_100"),
            F.expr("every(value > 0)").alias("all_positive"),
            F.expr("any(value > 450)").alias("any_over_450"),
            F.expr("bool_and(value <= 490.02)").alias("none_over_max"),
            F.expr("every(value > 100)").alias("all_over_100"),
        )
        .orderBy("event_type")
    )


REGEX_FUNCS_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(LEN(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
         AS n_number_runs,
       CAST(SUM(CASE WHEN regexp_matches(props, '"k": [0-9]+')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_k_shape,
       CAST(SUM(LENGTH(regexp_replace(props, '[0-9]', '#', 'g'))) AS BIGINT)
         AS redacted_chars,
       MIN(regexp_extract(props, '"([a-z_]+)"', 1)) AS first_key
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("scalar_regex_funcs", oracle=REGEX_FUNCS_ORACLE)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface over the events props payload —
    regexp_extract_all (count of digit runs), rlike shape test,
    global regexp_replace (redaction length), and group-capturing
    regexp_extract — rolled up per event type so the output is
    small while every row exercises the functions (completes the
    scalar-function coverage next to string/date/array/map/json/try;
    SURVEY §2b scalar row). The redaction pattern is the scalar half
    of pii_redact_digits.

    Exactness: counts/lengths are integers; the regex dialects agree
    on these patterns (character classes, capture groups — no
    lookaround, no engine-specific syntax). Spark's regexp_replace
    is global by default, matched by DuckDB's 'g' flag.

    Scale: map-only scalar work folded by one grouped aggregate.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)")))
            .cast("long")
            .alias("n_number_runs"),
            F.sum(
                F.when(F.col("props").rlike('"k": [0-9]+'), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_k_shape"),
            F.sum(F.length(F.regexp_replace("props", "[0-9]", "#")))
            .cast("long")
            .alias("redacted_chars"),
            F.min(F.regexp_extract("props", '"([a-z_]+)"', 1)).alias("first_key"),
        )
        .orderBy("event_type")
    )
