"""Round-13 kendall adjudication (VERDICT r12 task #1): fixed-commit
interleaved A/B of the two kendall variants, same session, alternating
reps so every variant samples the same CPU-credit throttle phases
(BASELINE.md "Round-12 optimization session" — single-shot timings on
this box are weather; interleaved medians + mins are the instrument).

Variants per query:
  exact:    r11 (ties-from-base + pre-agg repartition(64))
            r12 (ties-from-cells, no repartition)   <- driver regressed 0.82x
            r13 (ties-from-base, no repartition)    <- HEAD
  bucketed: r11 (no barrier - join replayed per branch)
            r12 (value-grain localCheckpoint only)  <- driver regressed 0.82x
            r13 (value grain + grid localCheckpoint) <- HEAD

The r13 variants are imported from the package (the committed code IS
what is measured); r11/r12 are frozen history reconstructed inline from
git show 58de796 / 346f526 — drift-free because those commits are
immutable.

Usage: python tools/ab_kendall_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from taps_spark.io.tables import load_tables  # noqa: E402
from taps_spark.queries.profiling import (  # noqa: E402
    stats_kendall_tau,
    stats_kendall_tau_bucketed,
)
from taps_spark.session import get_spark  # noqa: E402


def _exact_hist(spark, sf_dir, ties_from_cells: bool, pre_repartition: int):
    """r11/r12 shapes of stats_kendall_tau (difference from HEAD is only
    (a) where n/t1/t2 aggregate from and (b) the pre-agg repartition)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    cells = base.groupBy("flag", "q", "p").agg(F.count("*").alias("c"))
    qd = cells.select("flag", "q").distinct()
    wq = Window.partitionBy("flag").orderBy("q")
    qd = qd.select("flag", "q", F.dense_rank().over(wq).cast("int").alias("qr"))
    R = qd.agg(F.max("qr")).collect()[0][0]
    cr = cells.join(F.broadcast(qd), ["flag", "q"])
    B = max((int(R) - 1).bit_length(), 1)
    zero = F.lit(0).cast("long")
    ex = (
        cr.select(
            "flag",
            "p",
            "c",
            (F.col("qr") - 1).alias("qr0"),
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b"),
        )
        .select(
            "flag",
            "b",
            F.expr("shiftright(qr0, b + 1)").alias("g"),
            "p",
            F.when(F.expr("(shiftright(qr0, b) & 1) = 0"), F.col("c"))
            .otherwise(zero)
            .alias("cl"),
            F.when(F.expr("(shiftright(qr0, b) & 1) = 1"), F.col("c"))
            .otherwise(zero)
            .alias("cu"),
        )
    )
    if pre_repartition:
        ex = ex.repartition(pre_repartition, "flag", "b", "g", "p")
    g2 = ex.groupBy("flag", "b", "g", "p").agg(
        F.sum("cl").alias("cl"), F.sum("cu").alias("cu")
    )
    wli = Window.partitionBy("flag", "b", "g").orderBy("p")
    run = g2.select(
        "flag",
        "cu",
        "cl",
        F.coalesce(
            F.sum("cl").over(wli.rowsBetween(Window.unboundedPreceding, -1)), zero
        ).alias("lt"),
        F.sum("cl")
        .over(wli.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("tot"),
    )
    cud = F.col("cu").cast("decimal(19,0)")
    s = run.groupBy("flag").agg(
        F.sum((cud * F.col("lt").cast("decimal(19,0)")).cast("decimal(38,0)")).alias(
            "nc"
        ),
        F.sum(
            (
                cud * (F.col("tot") - F.col("lt") - F.col("cl")).cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("nd"),
    )
    tie_pairs = (
        F.col("t").cast("decimal(19,0)") * (F.col("t") - 1).cast("decimal(19,0)") / 2
    ).cast("decimal(38,0)")
    src = cells if ties_from_cells else base
    cnt = (lambda: F.sum("c")) if ties_from_cells else (lambda: F.count("*"))
    n_f = src.groupBy("flag").agg(cnt().cast("long").alias("n"))
    t1 = (
        src.groupBy("flag", "q")
        .agg(cnt().alias("t"))
        .groupBy("flag")
        .agg(F.sum(tie_pairs).alias("n1"))
    )
    t2 = (
        src.groupBy("flag", "p")
        .agg(cnt().alias("t"))
        .groupBy("flag")
        .agg(F.sum(tie_pairs).alias("n2"))
    )
    out = s.join(n_f, "flag").join(t1, "flag").join(t2, "flag")
    nn = F.col("n").cast("decimal(19,0)")
    n0 = ((nn * (nn - 1)) / 2).cast("decimal(38,0)")
    num = (F.col("nc") - F.col("nd")).cast("decimal(38,0)")
    den = F.sqrt((n0 - F.col("n1")).cast("double")) * F.sqrt(
        (n0 - F.col("n2")).cast("double")
    )
    return out.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.col("nc").cast("string").alias("n_concordant"),
        F.col("nd").cast("string").alias("n_discordant"),
        F.floor(num.cast("double") / den * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("tau_b_ppm"),
    ).orderBy("flag")


def _bucketed_hist(spark, sf_dir, ckpt_v, ckpt_cells):
    """r11 (no barrier) / r12 (v barrier only) shapes of the bucketed
    variant. With ckpt_v the bucket maps aggregate from the value grain
    (the r12 formulation); without it they aggregate from base (r11)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    base = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )
    vg = base.groupBy("flag", "x", "y").agg(F.count("*").alias("c"))
    if ckpt_v == "eager":
        v = vg.localCheckpoint(eager=True)
    elif ckpt_v == "persist":
        v = vg.persist()
    else:
        v = vg
    if ckpt_v:
        xv = v.groupBy("flag", "x").agg(F.sum("c").alias("c"))
        yv = v.groupBy("flag", "y").agg(F.sum("c").alias("c"))
        nf = v.groupBy("flag").agg(F.sum("c").cast("long").alias("n"))
    else:
        xv = base.groupBy("flag", "x").agg(F.count("*").alias("c"))
        yv = base.groupBy("flag", "y").agg(F.count("*").alias("c"))
        nf = base.groupBy("flag").agg(F.count("*").alias("n"))

    def bucket_map(vals, col: str, alias: str):
        w = Window.partitionBy("flag").orderBy(col)
        return (
            vals.select("flag", col, F.sum("c").over(w).alias("cum"))
            .join(F.broadcast(nf), "flag")
            .select(
                "flag",
                col,
                F.expr(f"CAST(((cum - 1) * 64) div n + 1 AS int) AS {alias}"),
            )
        )

    if ckpt_v:
        cells = (
            v.join(bucket_map(xv, "x", "xb"), ["flag", "x"])
            .join(bucket_map(yv, "y", "yb"), ["flag", "y"])
            .groupBy("flag", "xb", "yb")
            .agg(F.sum("c").alias("c"))
        )
    else:
        # true r11 shape: grid aggregated straight from the row grain
        cells = (
            base.join(bucket_map(xv, "x", "xb"), ["flag", "x"])
            .join(bucket_map(yv, "y", "yb"), ["flag", "y"])
            .groupBy("flag", "xb", "yb")
            .agg(F.count("*").alias("c"))
        )
    if ckpt_cells == "eager":
        cells = cells.localCheckpoint(eager=True)
    elif ckpt_cells == "persist":
        cells = cells.persist()
    zero = F.lit(0).cast("long")
    ex = cells.select(
        "flag",
        "yb",
        "c",
        "xb",
        F.explode(F.sequence(F.lit(1), F.col("xb"))).alias("i"),
    ).select(
        "flag",
        "i",
        "yb",
        F.when(F.col("i") == F.col("xb"), F.col("c")).otherwise(zero).alias("cl"),
        F.when(F.col("i") < F.col("xb"), F.col("c")).otherwise(zero).alias("cu"),
    )
    g2 = ex.groupBy("flag", "i", "yb").agg(
        F.sum("cl").alias("cl"), F.sum("cu").alias("cu")
    )
    wli = Window.partitionBy("flag", "i").orderBy("yb")
    run = g2.select(
        "flag",
        "cu",
        "cl",
        F.coalesce(
            F.sum("cl").over(wli.rowsBetween(Window.unboundedPreceding, -1)), zero
        ).alias("lt"),
        F.sum("cl")
        .over(wli.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("tot"),
    )
    cud = F.col("cu").cast("decimal(19,0)")
    s = run.groupBy("flag").agg(
        F.sum((cud * F.col("lt").cast("decimal(19,0)")).cast("decimal(38,0)")).alias(
            "nc"
        ),
        F.sum(
            (
                cud * (F.col("tot") - F.col("lt") - F.col("cl")).cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("nd"),
    )
    tie_pairs = (
        F.col("t").cast("decimal(19,0)") * (F.col("t") - 1).cast("decimal(19,0)") / 2
    ).cast("decimal(38,0)")
    t1 = (
        cells.groupBy("flag", "xb")
        .agg(F.sum("c").alias("t"))
        .groupBy("flag")
        .agg(F.sum(tie_pairs).alias("n1"))
    )
    t2 = (
        cells.groupBy("flag", "yb")
        .agg(F.sum("c").alias("t"))
        .groupBy("flag")
        .agg(F.sum(tie_pairs).alias("n2"))
    )
    out = s.join(nf, "flag").join(t1, "flag").join(t2, "flag")
    nn = F.col("n").cast("decimal(19,0)")
    n0 = ((nn * (nn - 1)) / 2).cast("decimal(38,0)")
    num = (F.col("nc") - F.col("nd")).cast("decimal(38,0)")
    den = F.sqrt((n0 - F.col("n1")).cast("double")) * F.sqrt(
        (n0 - F.col("n2")).cast("double")
    )
    return out.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.col("nc").cast("string").alias("n_concordant"),
        F.col("nd").cast("string").alias("n_discordant"),
        F.floor(num.cast("double") / den * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("tau_b_ppm"),
    ).orderBy("flag")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("ab_kendall_r13")

    # 2x2 factor grid for the exact variant (ties source x pre-agg
    # repartition) plus HEAD; r11 = (base, 64), r12 = (cells, 0),
    # r13/HEAD = (base, 0), X = (cells, 64) completes the square.
    variants = {
        "exact_r11": lambda: _exact_hist(spark, sf_dir, False, 64),
        "exact_r12": lambda: _exact_hist(spark, sf_dir, True, 0),
        "exact_X": lambda: _exact_hist(spark, sf_dir, True, 64),
        "exact_r13": lambda: stats_kendall_tau(spark, sf_dir),
        "bucket_r11": lambda: _bucketed_hist(spark, sf_dir, None, None),
        "bucket_r12": lambda: _bucketed_hist(spark, sf_dir, "eager", None),
        "bucket_D": lambda: _bucketed_hist(spark, sf_dir, None, "eager"),
        # bucket_E (lazy persist, no barriers) was measured ONCE and
        # excluded as INVALID: persisted deterministic plans are
        # substituted by the CacheManager into later matching plans,
        # so reps 2..N read rep 1's cache — its 2.05 s median was
        # cross-rep result reuse, not execution (the discovery that
        # led to the r13 bloom-probe persist fixes).
        "bucket_r13": lambda: stats_kendall_tau_bucketed(spark, sf_dir),
    }
    sel = os.environ.get("AB_VARIANTS")
    if sel:
        keep = set(sel.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    # Warm-up (untimed): one full pass per variant absorbs
    # JVM/codegen/plan-analysis cost outside the measurement.
    for fn in variants.values():
        fn().write.mode("overwrite").format("noop").save()

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    out = {
        name: {
            "samples": ts,
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
        }
        for name, ts in samples.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
