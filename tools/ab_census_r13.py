"""Interleaved A/B/C of profile_outlier_census shapes (r13 adjudication).

One resident session holds all candidate shapes as plan builders
(tools/ab_kendall_r13.py protocol): strictly serialized, side order
rotated every rep, medians AND mins reported.  Shapes:

  seal   — r12 seal: per column the raw cents frame is consumed by 3
           independent branches (moments / distinct-cents windows /
           counting): 18 corpus scans, no barrier.
  union  — r13 session-2 draft: one tagged (tbl,col,cents,c) grain for
           all six columns, eager localCheckpoint, consumers fold
           integer sums over the checkpointed grain: 6 scans + barrier.
  reuse  — per-column vc = groupBy(cents).count() consumed by ALL
           THREE branches (moments via Σc/Σcents·c, windows, counting):
           if ReusedExchange fires on the identical vc subtrees this is
           6 scans with NO explicit barrier at all.

Exactness: all shapes' collected results compared cell-by-cell first.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window

from taps_spark.io.tables import load_tables

SF_DIR = "/root/testdata/sf0.1"

_COLS = (
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
    ("part", "p_retailprice"),
)


def _moments_from_vc(vc: DataFrame) -> DataFrame:
    return vc.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("cents") * F.col("c")).alias("s1"),
        F.sum(
            (F.col("cents") * F.col("cents")).cast("decimal(38,0)") * F.col("c")
        ).alias("s2"),
    ).select(
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        F.sqrt(
            F.col("s2").cast("double") / F.col("n")
            - (F.col("s1").cast("double") / F.col("n"))
            * (F.col("s1").cast("double") / F.col("n"))
        ).alias("sigma"),
    )


def _quartiles_from_vc(vc: DataFrame) -> DataFrame:
    cum = vc.select(
        "cents",
        F.sum("c").over(Window.orderBy("cents")).alias("cum"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    return cum.agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 3) div 4"), F.col("cents"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(3 * n + 3) div 4"), F.col("cents"))
        ).alias("q3"),
    ).select(
        F.expr("CAST(q1 - (q3 - q1) * 3 div 2 AS BIGINT)").alias("lo_fence"),
        F.expr("CAST(q3 + (q3 - q1) * 3 div 2 AS BIGINT)").alias("hi_fence"),
    )


def _count_from_vc(vc: DataFrame, s: DataFrame, q: DataFrame, tbl, col):
    j = vc.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(q))
    return j.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.abs(F.col("cents").cast("double") - F.col("mu"))
                > 3 * F.col("sigma"),
                F.col("c"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("n_sigma3"),
        F.sum(
            F.when(
                (F.col("cents") < F.col("lo_fence"))
                | (F.col("cents") > F.col("hi_fence")),
                F.col("c"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("n_iqr"),
    ).select(
        F.lit(tbl).alias("tbl"),
        F.lit(col).alias("col_name"),
        "n_rows",
        "n_sigma3",
        "n_iqr",
    )


def shape_seal(spark: SparkSession) -> DataFrame:
    tabs = load_tables(
        spark, SF_DIR, ("orders", "lineitem", "customer", "supplier", "part")
    )
    branches = []
    for tbl, col in _COLS:
        v = tabs[tbl].select(
            F.round(F.col(col) * 100).cast("long").alias("cents")
        )
        s = v.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s1"),
            F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias(
                "s2"
            ),
        ).select(
            (F.col("s1").cast("double") / F.col("n")).alias("mu"),
            F.sqrt(
                F.col("s2").cast("double") / F.col("n")
                - (F.col("s1").cast("double") / F.col("n"))
                * (F.col("s1").cast("double") / F.col("n"))
            ).alias("sigma"),
        )
        vc = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
        q = _quartiles_from_vc(vc)
        j = v.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(q))
        branches.append(
            j.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (
                        F.abs(F.col("cents").cast("double") - F.col("mu"))
                        > 3 * F.col("sigma")
                    ).cast("int")
                ).cast("long").alias("n_sigma3"),
                F.sum(
                    (
                        (F.col("cents") < F.col("lo_fence"))
                        | (F.col("cents") > F.col("hi_fence"))
                    ).cast("int")
                ).cast("long").alias("n_iqr"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("col_name"),
                "n_rows",
                "n_sigma3",
                "n_iqr",
            )
        )
    b = branches[0]
    for extra in branches[1:]:
        b = b.unionByName(extra)
    return b.orderBy("tbl", "col_name")


def shape_union(spark: SparkSession) -> DataFrame:
    from functools import reduce

    tabs = load_tables(
        spark, SF_DIR, ("orders", "lineitem", "customer", "supplier", "part")
    )
    grains = []
    for tbl, col in _COLS:
        grains.append(
            tabs[tbl]
            .select(
                F.lit(tbl).alias("g_tbl"),
                F.lit(col).alias("g_col"),
                F.round(F.col(col) * 100).cast("long").alias("cents"),
            )
            .groupBy("g_tbl", "g_col", "cents")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    vc_all = reduce(lambda a, b: a.unionByName(b), grains).localCheckpoint(
        eager=True
    )
    branches = []
    for tbl, col in _COLS:
        vc = vc_all.filter(
            (F.col("g_tbl") == tbl) & (F.col("g_col") == col)
        ).select("cents", "c")
        s = _moments_from_vc(vc)
        q = _quartiles_from_vc(vc)
        branches.append(_count_from_vc(vc, s, q, tbl, col))
    b = branches[0]
    for extra in branches[1:]:
        b = b.unionByName(extra)
    return b.orderBy("tbl", "col_name")


def shape_reuse(spark: SparkSession) -> DataFrame:
    tabs = load_tables(
        spark, SF_DIR, ("orders", "lineitem", "customer", "supplier", "part")
    )
    branches = []
    for tbl, col in _COLS:
        vc = (
            tabs[tbl]
            .select(F.round(F.col(col) * 100).cast("long").alias("cents"))
            .groupBy("cents")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        s = _moments_from_vc(vc)
        q = _quartiles_from_vc(vc)
        branches.append(_count_from_vc(vc, s, q, tbl, col))
    b = branches[0]
    for extra in branches[1:]:
        b = b.unionByName(extra)
    return b.orderBy("tbl", "col_name")


def shape_union_c8(spark: SparkSession) -> DataFrame:
    """union shape but the grain is coalesced to 8 partitions before the
    eager checkpoint — the union of 6 16-partition aggregates otherwise
    materializes 96 tiny blocks that 18 consumer branches re-scan
    (~1700 micro-tasks of pure scheduling overhead at sf0.1)."""
    from functools import reduce

    tabs = load_tables(
        spark, SF_DIR, ("orders", "lineitem", "customer", "supplier", "part")
    )
    grains = []
    for tbl, col in _COLS:
        grains.append(
            tabs[tbl]
            .select(
                F.lit(tbl).alias("g_tbl"),
                F.lit(col).alias("g_col"),
                F.round(F.col(col) * 100).cast("long").alias("cents"),
            )
            .groupBy("g_tbl", "g_col", "cents")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    vc_all = (
        reduce(lambda a, b: a.unionByName(b), grains)
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    branches = []
    for tbl, col in _COLS:
        vc = vc_all.filter(
            (F.col("g_tbl") == tbl) & (F.col("g_col") == col)
        ).select("cents", "c")
        s = _moments_from_vc(vc)
        q = _quartiles_from_vc(vc)
        branches.append(_count_from_vc(vc, s, q, tbl, col))
    b = branches[0]
    for extra in branches[1:]:
        b = b.unionByName(extra)
    return b.orderBy("tbl", "col_name")


SHAPES = {"seal": shape_seal, "union": shape_union, "reuse": shape_reuse}

if "--round2" in sys.argv:
    SHAPES = {"seal": shape_seal, "union_c8": shape_union_c8}
    sys.argv.remove("--round2")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("ab_census_r13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Plan shape evidence for the reuse variant: does ReusedExchange fire?
    plan = shape_reuse(spark)._jdf.queryExecution().executedPlan().toString()
    n_scan = plan.count("Scan parquet")
    n_reuse = plan.count("ReusedExchange")
    print(f"reuse plan: {n_scan} parquet scans, {n_reuse} ReusedExchange", flush=True)

    # Exactness: all shapes must collect identical rows.
    rows = {k: [tuple(r) for r in fn(spark).collect()] for k, fn in SHAPES.items()}
    ref = rows[next(iter(rows))]
    assert all(v == ref for v in rows.values()), "RESULT MISMATCH"
    print("results identical across shapes", flush=True)

    order = list(SHAPES)
    samples = {k: [] for k in SHAPES}
    for rep in range(reps):
        rot = order[rep % len(order):] + order[: rep % len(order)]
        for k in rot:
            t0 = time.monotonic()
            SHAPES[k](spark).collect()
            dt = time.monotonic() - t0
            samples[k].append(dt)
            print(f"rep {rep} {k:6s} {dt:6.2f}", flush=True)
    out = {
        k: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "samples": [round(x, 3) for x in v],
        }
        for k, v in samples.items()
    }
    print(json.dumps(out, indent=1))
    out_path = (
        "/tmp/ab_census_r13_round2.json"
        if "union_c8" in SHAPES
        else "/tmp/ab_census_r13.json"
    )
    with open(out_path, "w") as fh:
        json.dump({"reuse_plan": {"scans": n_scan, "reused": n_reuse}, **out}, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
