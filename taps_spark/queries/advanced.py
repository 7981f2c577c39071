"""Advanced relational coverage: multi-join analytics, percentiles,
ordered string aggregation, JSON extraction, HAVING, and correlated-
subquery decorrelation patterns — rounding out SURVEY.md §2b."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.queries import query
from taps_spark.queries.numeric import dsum

Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INT) AS ship_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query("q7_nation_trade_volume", oracle=Q7_ORACLE)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume by year (TPC-H Q7 analog): 6-way
    join with a self-joined dimension (nation twice).

    Scale: supplier/customer/nation broadcast; the only big shuffle
    is lineitem↔orders. The nation inequality filter rides the
    broadcast joins (no extra pass).
    """
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "orders", "customer", "nation"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


PERCENTILE_ORACLE = """
SELECT l_returnflag,
       ROUND(MEDIAN(l_quantity), 4)                 AS median_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.90), 4) AS p90_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_percentiles", oracle=PERCENTILE_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group.

    Exact percentile needs the group's values together (sort-based
    agg); at 100 TB switch to percentile_approx (t-digest, partial-
    aggregatable) — kept exact here for oracle comparability.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", 0.90), 4).alias("p90_price"),
            F.round(F.percentile("l_extendedprice", 0.99), 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


STRING_AGG_ORACLE = """
SELECT r_name,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@query("agg_string_collect", oracle=STRING_AGG_ORACLE)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_list → array_sort →
    concat_ws): deterministic regardless of partitioning, which is
    the only safe way to use collect_list at scale."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4)       AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_json_extract", oracle=JSON_ORACLE)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a field out of the JSON props
    column and aggregate it (get_json_object — JVM-side JSON path,
    no UDF; at scale prefer from_json once per schema over repeated
    path extraction)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).cast("long").alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
ORDER BY o_custkey
"""


@query("agg_having", oracle=HAVING_ORACLE)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING): frequent-buyer filter."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


CORRELATED_ORACLE = """
SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT AVG(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
ORDER BY c_custkey
"""


@query("subquery_above_nation_avg", oracle=CORRELATED_ORACLE)
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated the way Catalyst (and
    every engine) wants it: compute the per-group average once and
    broadcast-join it back — one scan + one tiny join instead of a
    per-row subquery."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey, AVG(l_quantity) AS part_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       COUNT(*) AS n_small_lots,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS small_lot_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ap_partkey = l_partkey
WHERE l_quantity < 0.5 * part_avg
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q17_small_lot_revenue", oracle=Q17_ORACLE)
def q17_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-lot revenue per brand (TPC-H Q17 analog): correlated
    aggregate (per-part average quantity) decorrelated into a
    self-aggregation + join — the canonical pattern for 'compare each
    row to its group statistic' at scale."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("part_avg")
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_lots"),
            dsum("l_extendedprice").alias("small_lot_revenue"),
        )
        .orderBy("p_brand")
    )


@query("agg_approx")  # rows-only: HLL/t-digest results are engine-specific
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for exact
    DISTINCT/percentile: approx_count_distinct (HyperLogLog++, fully
    partial-aggregatable, no expand) and percentile_approx (t-digest
    sketch). Engine-specific sketch values → rows-only driver check;
    tests/test_operators.py pins both to within rel-error bounds of
    the exact answers."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


#: One dialect-portable ANSI statement — executed VERBATIM by both
#: Spark SQL (over temp views) and the DuckDB oracle, proving the
#: engine's raw-SQL entry point gives the same answers as the
#: DataFrame API (same Catalyst planning underneath).
SQL_INTERFACE_STMT = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, order_year
"""


@query("sql_interface_revenue", oracle=SQL_INTERFACE_STMT)
def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL entry point: fixture tables registered as temp views,
    then `spark.sql` runs the SAME statement the oracle runs — the
    engine's second query surface next to the DataFrame API. Catalyst
    plans it identically (broadcasts, pushdown), so everything
    tests/test_plans.py asserts about DataFrame plans holds here too."""
    tables = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(SQL_INTERFACE_STMT)


#: Recursive CTE (Spark ≥4.0 WITH RECURSIVE): gap-free weekly spine
#: derived by recursion from the data's own bounds, left-joined back
#: for per-week activity — weeks with zero events still appear. The
#: recursion terminates via the monotone `w < hi` guard (UNION ALL
#: iteration; Spark does not yet support UNION-distinct recursion).
SQL_RECURSIVE_STMT = """
WITH RECURSIVE bounds AS (
  SELECT DATE_TRUNC('week', MIN(ts)) AS lo, DATE_TRUNC('week', MAX(ts)) AS hi
  FROM events
),
weeks(w) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT w + INTERVAL {interval_7d} FROM weeks WHERE w < (SELECT hi FROM bounds)
)
SELECT w AS week_start,
       COUNT(e.event_id) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM weeks LEFT JOIN events e ON DATE_TRUNC('week', e.ts) = weeks.w
GROUP BY w
ORDER BY w
"""


@query(
    "sql_recursive_week_spine",
    oracle=SQL_RECURSIVE_STMT.format(interval_7d="7 DAY"),
)
def sql_recursive_week_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE surface: WITH RECURSIVE generates the complete
    weekly calendar between the corpus' first and last event, so the
    left join reports zero-activity weeks a plain GROUP BY would drop.

    Scale: the recursive branch iterates on a single-row frame (one
    date per step, |weeks| steps total — driver-bound, tiny); the only
    data-sized work is the final join-aggregate, which Catalyst plans
    like any other (the spine side is broadcast-sized by construction).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(SQL_RECURSIVE_STMT.format(interval_7d="'7' DAY"))


VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                                  AS n_events,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT)           AS sum_k,
       CAST(MIN(CAST(props->>'$.k' AS INT)) AS INT)              AS min_k,
       CAST(COUNT(CASE WHEN props->>'$.missing' IS NOT NULL THEN 1 END) AS BIGINT)
                                                                 AS n_missing_path,
       'OBJECT<k: BIGINT>'                                       AS variant_schema
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_variant_json", oracle=VARIANT_ORACLE)
def events_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: `parse_json` ONCE per row into the
    binary variant encoding, then typed path extraction
    (`variant_get`), missing-path NULL semantics (`try_variant_get`),
    and corpus-level schema inference (`schema_of_variant_agg`) —
    the modern replacement for repeated `get_json_object` string
    re-parsing (`events_json_extract` is the legacy twin).

    Scale: variant parse is one pass, columnar-encoded, shredded at
    the scan at 100 TB (parquet variant shredding); every later path
    read is a binary field lookup, not a JSON re-parse. The oracle
    pins the extracted values AND the inferred variant schema string.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).cast("long").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.count(F.try_variant_get("v", "$.missing", "int")).alias("n_missing_path"),
            F.schema_of_variant_agg("v").alias("variant_schema"),
        )
        .orderBy("event_type")
    )


MINMAX_BY_ORACLE = """
-- DuckDB's arg_max rejects composite ordering keys, so the oracle
-- emulates the deterministic max_by([value, event_id]) with rank
-- windows over the identical total order.
WITH r AS (
  SELECT event_type, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rn_top,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn_bot,
         COUNT(*) OVER (PARTITION BY event_type) AS n_events
  FROM events
)
SELECT event_type,
       MAX(n_events) AS n_events,
       MAX(CASE WHEN rn_top = 1 THEN user_id END) AS top_user,
       ROUND(MAX(value), 4) AS top_value,
       MAX(CASE WHEN rn_bot = 1 THEN user_id END) AS bottom_user,
       ROUND(MIN(value), 4) AS bottom_value
FROM r
GROUP BY event_type
ORDER BY event_type
"""


@query("agg_minmax_by", oracle=MINMAX_BY_ORACLE)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max / arg-min aggregates (max_by / min_by): which user
    produced each event type's highest- and lowest-valued event — the
    'who caused the extreme' lookup that otherwise costs a rank
    window + filter. The ordering key is [value, event_id], so ties
    on value resolve by the unique event id and the answer is
    deterministic cross-engine (bare max_by on a tied key is
    engine-arbitrary — the same discipline as every rank tiebreak
    here).

    Scale: plain hash aggregation with map-side partial max_by state
    (one candidate row per key per partition) — strictly cheaper than
    the window formulation, no per-group sort at all.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("max_by(user_id, array(value, cast(event_id as double)))").alias("top_user"),
            F.round(F.max("value"), 4).alias("top_value"),
            F.expr("min_by(user_id, array(value, cast(event_id as double)))").alias("bottom_user"),
            F.round(F.min("value"), 4).alias("bottom_value"),
        )
        .orderBy("event_type")
    )


TRY_FUNCS_ORACLE = """
WITH v AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         o_orderkey % 3 AS divisor
  FROM orders
)
SELECT o_orderkey,
       TRY_CAST(o_orderstatus AS INTEGER)          AS status_as_int,
       ROUND(o_totalprice / NULLIF(divisor, 0), 4) AS price_per_bucket,
       TRY_CAST('20' || CAST(o_orderkey AS VARCHAR) AS BIGINT) AS synthetic_num,
       CASE WHEN divisor = 0 THEN NULL ELSE divisor END AS safe_divisor
FROM v
ORDER BY o_orderkey
"""


@query("scalar_try_funcs", oracle=TRY_FUNCS_ORACLE)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family: try_cast on a non-numeric column
    (NULL, not an exception), try_divide by a sometimes-zero divisor
    (NULL, not ArithmeticException under ANSI mode), try_to_number on
    synthesized digits — the row-level resilience surface that keeps
    a 100 TB job from dying on one malformed value (the batch
    counterpart of the PERMISSIVE quarantine readers in io/sources,
    and of the reference's convert_invalid_date_time NULL-coercion,
    lib/taps/utils.rb:47-68).

    All map-only expressions; the oracle mirrors with TRY_CAST and
    NULLIF division, which have identical NULL semantics.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.selectExpr(
        "o_orderkey",
        "try_cast(o_orderstatus AS int) AS status_as_int",
        "round(try_divide(o_totalprice, o_orderkey % 3), 4) AS price_per_bucket",
        "try_cast('20' || cast(o_orderkey AS string) AS bigint) AS synthetic_num",
        "nullif(o_orderkey % 3, 0) AS safe_divisor",
    ).orderBy("o_orderkey")


def _interleave_sql(xcol: str, ycol: str) -> str:
    """16-bit Morton code from two 8-bit bucket ranks, as a static
    shift/mask expression string valid in BOTH Spark SQL (>> << since
    4.0) and DuckDB; & is bitwise AND in both."""
    terms = []
    for i in range(8):
        terms.append(f"(((({xcol} >> {i}) & 1)) << {2 * i + 1})")
        terms.append(f"(((({ycol} >> {i}) & 1)) << {2 * i})")
    return " + ".join(terms)


ZORDER_ORACLE = f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS max_p, MAX(l_suppkey) AS max_s FROM lineitem
),
b AS (
  SELECT (l_partkey * 256 // (max_p + 1))::BIGINT AS bx,
         (l_suppkey * 256 // (max_s + 1))::BIGINT AS by
  FROM lineitem, mx
),
z AS (
  SELECT bx, by, {_interleave_sql('bx', 'by')} AS zv FROM b
),
blocks AS (
  SELECT 'zorder' AS strategy, zv >> 8 AS block_id, bx, by FROM z
  UNION ALL
  SELECT 'linear' AS strategy, bx AS block_id, bx, by FROM z
),
stats AS (
  SELECT strategy, block_id,
         MIN(bx) AS min_x, MAX(bx) AS max_x,
         MIN(by) AS min_y, MAX(by) AS max_y,
         COUNT(*) AS n_rows
  FROM blocks GROUP BY strategy, block_id
)
SELECT strategy,
       COUNT(*)::BIGINT AS n_blocks,
       SUM(n_rows)::BIGINT AS n_rows,
       SUM((max_x - min_x + 1) * (max_y - min_y + 1))::BIGINT AS coverage_cells,
       (SUM((max_x - min_x + 1) * (max_y - min_y + 1))::BIGINT * 1000000) >> 16
         AS expected_blocks_scanned_micro
FROM stats
GROUP BY strategy
ORDER BY strategy
"""


@query("layout_zorder_effectiveness", oracle=ZORDER_ORACLE)
def layout_zorder_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering audit: how much data-skipping
    does interleaved-bit layout buy for two-key point lookups versus a
    plain single-key sort? THE physical-layout question for a 100 TB
    table queried on (part, supplier) — Delta/Iceberg OPTIMIZE ZORDER
    exists exactly for this; the audit quantifies it BEFORE paying for
    a rewrite. (Extends the reference's layout surface — single-key
    ordered chunking, lib/taps/data_stream.rb — to multi-key locality.)

    Method: rank both keys onto an 8-bit grid (value-proportional
    buckets from the global max — exact integer floor-division, no
    percentile estimate, no collect), interleave bits into a 16-bit
    Morton code (static shift/mask chain, identical text in both
    engines), and group rows into 256 blocks by Morton prefix
    (zv >> 8) vs 256 blocks by the linear key (bx). Per block the
    min/max box of (bx, by) gives the pruning power: a point query
    for cell (x, y) must scan every block whose box contains it, so
    SUM of box areas = total cells covered, and
    coverage * 1e6 >> 16 = expected blocks scanned per uniform point
    query, in millionths (the >> 16 divide-by-65536 is exact in both
    engines — power-of-two shift, not float). Z-order blocks have
    ~square boxes (area ~2^8 each); linear blocks are full-height
    stripes (area 256 * width) — the audit shows the ~16x skip gap.

    Scale: one scan, block-grain aggregation with map-side combine
    (512 groups total), a 1-row broadcast for the maxes; everything
    exact integers. Blocks are defined by VALUE prefix, not row
    position — no row_number, no total-order hazard, and the metric is
    identical however many files each block spans.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    mx = li.agg(
        F.max("l_partkey").alias("max_p"), F.max("l_suppkey").alias("max_s")
    )
    b = li.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST(l_partkey * 256 div (max_p + 1) AS BIGINT)").alias("bx"),
        F.expr("CAST(l_suppkey * 256 div (max_s + 1) AS BIGINT)").alias("by"),
    )
    z = b.select("bx", "by", F.expr(_interleave_sql("bx", "by")).alias("zv"))
    blocks = z.select(
        F.lit("zorder").alias("strategy"),
        F.expr("zv >> 8").alias("block_id"),
        "bx",
        "by",
    ).unionAll(
        z.select(
            F.lit("linear").alias("strategy"),
            F.col("bx").alias("block_id"),
            "bx",
            "by",
        )
    )
    stats = blocks.groupBy("strategy", "block_id").agg(
        F.min("bx").alias("min_x"),
        F.max("bx").alias("max_x"),
        F.min("by").alias("min_y"),
        F.max("by").alias("max_y"),
        F.count("*").alias("n_rows"),
    )
    area = (F.col("max_x") - F.col("min_x") + 1) * (
        F.col("max_y") - F.col("min_y") + 1
    )
    return (
        stats.groupBy("strategy")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum(area).cast("long").alias("coverage_cells"),
        )
        .select(
            "strategy",
            "n_blocks",
            "n_rows",
            "coverage_cells",
            F.expr(
                "(coverage_cells * 1000000) >> 16"
            ).alias("expected_blocks_scanned_micro"),
        )
        .orderBy("strategy")
    )


BITWISE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(BIT_AND(o_orderkey) AS BIGINT) AS and_all,
       CAST(BIT_OR(o_orderkey) AS BIGINT) AS or_all,
       CAST(BIT_XOR(o_orderkey) AS BIGINT) AS xor_all,
       CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_low_byte,
       CAST(SUM((o_orderkey >> 8) & 15) AS BIGINT) AS sum_mid_nibble,
       CAST(SUM(CASE WHEN (o_orderkey & 1) = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_odd
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("scalar_bitwise_funcs", oracle=BITWISE_ORACLE)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface (SURVEY §2b scalar family):
    per-priority BIT_AND / BIT_OR / BIT_XOR folds of the order key and
    masked/shifted scalar extractions (& 255, >> 8 & 15, parity) — the
    primitive layer under every hand-rolled bitmap/bloom/flag-word
    scheme (dedup_bloom_incremental and the simhash family build on
    exactly these). All integer, bit-exact cross-engine by definition.

    Scale: one map-side-combinable grouped aggregate; bit folds are
    associative-commutative so partial aggregation applies untouched.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    k = F.col("o_orderkey")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_and(k).alias("and_all"),
            F.bit_or(k).alias("or_all"),
            F.bit_xor(k).alias("xor_all"),
            F.sum(F.expr("o_orderkey & 255")).alias("sum_low_byte"),
            F.sum(F.expr("shiftright(o_orderkey, 8) & 15")).alias(
                "sum_mid_nibble"
            ),
            F.sum(F.expr("CASE WHEN (o_orderkey & 1) = 1 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_odd"),
        )
        .orderBy("o_orderpriority")
    )


MODE_ORACLE = """
WITH c AS (
  SELECT o_orderpriority AS prio,
         CAST(isodow(o_orderdate) AS INT) AS dow,
         COUNT(*)::BIGINT AS cnt
  FROM orders GROUP BY 1, 2
),
mx AS (SELECT prio, MAX(cnt) AS mc FROM c GROUP BY prio)
SELECT c.prio AS o_orderpriority,
       MIN(c.dow) AS mode_dow,
       CAST(mx.mc AS BIGINT) AS mode_count
FROM c JOIN mx ON c.prio = mx.prio AND c.cnt = mx.mc
GROUP BY c.prio, mx.mc
ORDER BY c.prio
"""


@query("agg_mode_exact", oracle=MODE_ORACLE)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group with a PINNED tie rule (highest count,
    then smallest value): the most frequent order day-of-week per
    priority. Engines' built-in mode() leaves ties implementation-
    defined — a cross-engine hash would flap — so the operator is the
    portable two-aggregate form: value-grain counts, per-group max
    joined back, MIN(value) among the argmax set. (SURVEY §2b
    aggregation family; the deterministic sibling of
    profile_skew_heavy_hitters' top-k.)

    Scale: two map-side-combinable aggregates on (group, value) and
    (group) grains plus a broadcast-sized join on the group key —
    value cardinality bounds the grid (7 here), rows never re-shuffle.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    c = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        (F.weekday(F.col("o_orderdate")) + 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mx = c.groupBy("prio").agg(F.max("cnt").alias("mc"))
    return (
        c.join(F.broadcast(mx), ["prio"])
        .filter(F.col("cnt") == F.col("mc"))
        .groupBy("prio", "mc")
        .agg(F.min("dow").alias("mode_dow"))
        .select(
            F.col("prio").alias("o_orderpriority"),
            "mode_dow",
            F.col("mc").cast("long").alias("mode_count"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Round 12: KMV (theta-style) sketch set operations + data-derived
# recursive hierarchy rollup.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_M = 1 << 48  # hash domain: first 12 hex chars of md5

KMV_INTERSECTION_ORACLE = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
hv AS (
  SELECT DISTINCT event_type,
         ('0x' || SUBSTRING(MD5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM du
),
sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hv)
  WHERE rn <= {_KMV_K}
),
th AS (SELECT event_type, MAX(h) AS theta FROM sk GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         LEAST(a.theta, b.theta) AS theta
  FROM th a JOIN th b ON a.event_type < b.event_type
),
rho AS (
  SELECT p.type_a, p.type_b, CAST(COUNT(*) AS BIGINT) AS rho
  FROM pairs p
  JOIN sk sa ON sa.event_type = p.type_a
  JOIN sk sb ON sb.event_type = p.type_b AND sb.h = sa.h
  WHERE sa.h <= p.theta
  GROUP BY 1, 2
),
ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS exact_intersection
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.theta,
       CAST(COALESCE(r.rho, 0) AS BIGINT) AS rho,
       CAST(COALESCE(r.rho, 0) * {_KMV_M} // p.theta AS BIGINT) AS est_intersection,
       CAST(COALESCE(e.exact_intersection, 0) AS BIGINT) AS exact_intersection
FROM pairs p
LEFT JOIN rho r ON r.type_a = p.type_a AND r.type_b = p.type_b
LEFT JOIN ex e ON e.type_a = p.type_a AND e.type_b = p.type_b
ORDER BY p.type_a, p.type_b
"""


@query("agg_kmv_set_intersection", oracle=KMV_INTERSECTION_ORACLE)
def agg_kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-style sketch set algebra: per event type, the K=64
    smallest md5(user) hash values form a mergeable distinct-count
    sketch; for every type pair the sketches alone estimate audience
    overlap (ρ retained intersection hashes below the pair's θ,
    scaled by the hash domain), reported NEXT TO the exact
    intersection so the estimate is auditable in one result.

    Unlike approx_count_distinct (HLL — union-only, engine-opaque),
    KMV sketches support INTERSECTION estimates and are bit-exact
    reproducible cross-engine: md5 is the repo's only cross-engine
    hash, and every step after it is integer order statistics.

    Determinism: distinct h per type before ranking (ROW_NUMBER ties
    on duplicate h would be unstable; distinct h values make the
    ordering key unique), integer floor division for the estimate.

    Scale: the per-type K-smallest filter is a rank-≤-K window Spark
    executes as WindowGroupLimit (map-side partial top-K per
    partition — the Hamming top-k precedent); all sketch joins touch
    K·|types| rows. The exact-intersection audit column is the only
    data-sized join, and production drops it — the sketches ARE the
    product (stored per partition, merged at read).
    """
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    du = ev.select("event_type", "user_id").distinct()
    hv = du.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    sk = hv.withColumn("rn", rn).filter(F.col("rn") <= _KMV_K).drop("rn")
    th = sk.groupBy("event_type").agg(F.max("h").alias("theta"))
    a, b = th.alias("a"), th.alias("b")
    pairs = (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.least(F.col("a.theta"), F.col("b.theta")).alias("theta"),
        )
    )
    sa, sb = sk.alias("sa"), sk.alias("sb")
    rho = (
        pairs.alias("p")
        .join(F.broadcast(sa), F.col("sa.event_type") == F.col("p.type_a"))
        .join(
            F.broadcast(sb),
            (F.col("sb.event_type") == F.col("p.type_b"))
            & (F.col("sb.h") == F.col("sa.h")),
        )
        .filter(F.col("sa.h") <= F.col("p.theta"))
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("rho"))
    )
    da, db = du.alias("da"), du.alias("db")
    ex = (
        da.join(
            db,
            (F.col("da.user_id") == F.col("db.user_id"))
            & (F.col("da.event_type") < F.col("db.event_type")),
        )
        .groupBy(
            F.col("da.event_type").alias("type_a"),
            F.col("db.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return (
        pairs.join(F.broadcast(rho), ["type_a", "type_b"], "left")
        .join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "theta",
            F.coalesce(F.col("rho"), F.lit(0)).cast("long").alias("rho"),
            F.expr(
                f"CAST(COALESCE(rho, 0) * {_KMV_M} div theta AS BIGINT)"
            ).alias("est_intersection"),
            F.coalesce(F.col("exact_intersection"), F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
        )
        .orderBy("type_a", "type_b")
    )


#: Data-derived recursive hierarchy (next to sql_recursive_week_spine's
#: generated spine): part keys form a decimal tree (parent = key div
#: 10), and WITH RECURSIVE walks it from the single-digit roots,
#: rolling up subtree size / depth / price. Executed VERBATIM by Spark
#: SQL and DuckDB — FLOOR(x / 10.0) is the dialect-portable integral
#: parent (Spark `div` vs DuckDB `//` differ in spelling).
SQL_PART_HIERARCHY_STMT = """
WITH RECURSIVE tree AS (
  SELECT p_partkey AS node, p_partkey AS root, 0 AS depth, p_retailprice AS price
  FROM part WHERE p_partkey <= 9  -- roots: single-digit keys (0-based fixture)
  UNION ALL
  SELECT p.p_partkey, t.root, t.depth + 1, p.p_retailprice
  FROM part p JOIN tree t ON p.p_partkey >= 10
   AND CAST(FLOOR(p.p_partkey / 10.0) AS BIGINT) = t.node
)
SELECT root,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(depth) AS INT) AS max_depth,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(27,6))), 2) AS DOUBLE) AS subtree_price
FROM tree
GROUP BY root
ORDER BY root
"""


@query("sql_recursive_part_hierarchy", oracle=SQL_PART_HIERARCHY_STMT)
def sql_recursive_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy rollup over DATA (the week spine
    recursion iterates a constant; this one joins the part table each
    step): parts form a decimal-digit tree, and the recursion labels
    every node with its root for subtree aggregates — org charts /
    BOM explosions / category trees without an iterative driver loop.

    Scale: recursion depth is the tree height (⌈log₁₀ N⌉ — 7 levels
    at a billion parts); each step is one equi-join of the frontier
    against the table, exactly the frontier-BFS shape of
    graph_bfs_hops but expressed in pure SQL. Termination is
    STRUCTURAL, not a level cap: the `p_partkey >= 10` guard makes
    every recursive child's parent strictly smaller than itself
    (fixture keys are 0-based, and key 0 is otherwise its own parent
    — an instant infinite recursion). Determinism: the price rollup
    is the DECIMAL(27,6) exact-sum law.
    """
    tables = load_tables(spark, sf_dir, ("part",))
    tables["part"].createOrReplaceTempView("part")
    return spark.sql(SQL_PART_HIERARCHY_STMT)
