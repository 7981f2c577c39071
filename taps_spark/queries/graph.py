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
