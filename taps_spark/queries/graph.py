"""Graph-analytics query inventory (§2c breadth): rank propagation
over relationships mined from the relational fixtures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.queries import query


@query("graph_pagerank_suppliers")  # rows-only: iterative fixpoint, not ANSI-SQL
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→part supply graph (distinct
    (l_suppkey, l_partkey) edges from lineitem): parts sourced by
    many well-connected suppliers rank highest — the corpus-curation
    authority signal (crawl-domain ranking, citation weighting)
    expressed on the fixtures. 10 damped iterations with dangling
    mass redistributed; top-20 nodes by rank.

    Rows-only check (iterative fixpoint); tests/test_operators.py
    replays the exact formulation in NumPy on a small graph and pins
    ranks to 1e-9.
    """
    from taps_spark.operators.graph import pagerank

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    pr = pagerank(edges, iters=10, damping=0.85)
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


DEGREE_DIST_ORACLE = """
WITH deg AS (
  SELECT l_suppkey AS suppkey, COUNT(DISTINCT l_partkey) AS degree
  FROM lineitem GROUP BY l_suppkey
)
SELECT degree, COUNT(*) AS n_suppliers
FROM deg GROUP BY degree ORDER BY degree
"""


@query("graph_degree_distribution", oracle=DEGREE_DIST_ORACLE)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier→part graph (distinct parts
    shipped per supplier, bucketed into a histogram) — the first
    diagnostic before any graph algorithm: a heavy-tailed degree
    histogram is what makes naive vertex-partitioned algorithms skew
    (and why graph_pagerank_suppliers pre-aggregates by edge).

    Two grouped aggs, both map-side combinable; the second groups on
    degree (tiny key space).  No joins, no explosion.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    deg = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.countDistinct("l_partkey").alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("degree")
    )


TRIANGLE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
),
-- orient every edge from the lower-(degree, id) endpoint to the higher
oriented AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS lo,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS hi
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
wedges AS (
  SELECT a.lo AS pivot, a.hi AS x, b.hi AS y
  FROM oriented a JOIN oriented b ON a.lo = b.lo AND a.hi < b.hi
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM wedges w
  JOIN oriented o
    ON (o.lo = LEAST(w.x, w.y) AND o.hi = GREATEST(w.x, w.y))
     OR (o.hi = LEAST(w.x, w.y) AND o.lo = GREATEST(w.x, w.y))
)
SELECT (SELECT COUNT(DISTINCT node) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM edges)           AS n_edges,
       n_triangles,
       ROUND(CAST(3.0 * n_triangles AS DOUBLE) /
             (SELECT SUM(d * (d - 1) / 2) FROM deg), 6) AS global_clustering
FROM tri
"""


@query("graph_triangle_count", oracle=TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase graph (parts adjacent when they appear together in
    >= 2 distinct orders) — the community-density probe behind
    spam-farm detection and near-duplicate *source* discovery in
    crawl curation.

    The SUPPORT THRESHOLD (co-occurrence >= 2) is load-bearing for
    scale: a raw co-occurrence graph densifies toward complete as
    data grows (the co-supplier variant at sf0.1 is a near-complete
    1000-node graph — 500k edges, ~10^8 wedges), while thresholded
    edges track genuine association and stay sparse (~3.5k edges at
    every SF here). Pair enumeration is per-order C(k,2), bounded by
    basket size, never corpus².

    Algorithm: the MapReduce classic (Suri & Vassilvitskii 2011):
    orient every edge from its lower-(degree, id) endpoint to the
    higher, enumerate wedges only at each edge's LOWER endpoint, and
    close them against the oriented edge set. Orientation bounds
    per-node wedge fan-out by O(sqrt(|E|)) regardless of raw degree
    skew — a celebrity node of degree 10M generates no wedges at all
    unless both neighbors out-rank it.

    Scale: the wedge self-join and the closing join are both
    equi-joins on node ids (AQE-skew-splittable); nothing is ever
    broadcast except the final 1-row totals. Wedge volume is
    Σ out_deg² with out-degrees capped by orientation — the whole
    point of the degree ordering.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("p2"))
    edges = (
        op.join(b, (F.col("o") == F.col("o2")) & (F.col("p") < F.col("p2")))
        .groupBy(F.col("p").alias("u"), F.col("p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    a = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("x"))
    bb = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("y"))
    wedges = a.join(bb, "pivot").filter(F.col("x") < F.col("y")).select(
        F.least("x", "y").alias("cx"), F.greatest("x", "y").alias("cy")
    )
    close = oriented.select(
        F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
    )
    tri = wedges.join(close, ["cx", "cy"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    totals = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedge_tot"),
    )
    return (
        tri.crossJoin(F.broadcast(nodes))
        .crossJoin(F.broadcast(totals))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("wedge_tot"), 6).alias(
                "global_clustering"
            ),
        )
    )
