"""Incremental aggregate maintenance: mergeable agg states.

The reference re-pulls a table wholesale to refresh a copy
(lib/taps/operation.rb pull loop); its only incremental story is
resuming an interrupted stream.  At 100 TB you never recompute a
rollup from scratch — you maintain it: keep the aggregate in a
MERGEABLE state representation (count/sum/min/max per key), fold
each new delta batch into it with a key-wise merge, and derive the
final metrics (avg etc.) at read time.  This is the materialized-
view maintenance pattern (same algebra partial aggregation uses
inside a single Spark job, lifted across jobs/days).

Merge laws used: count/sum are commutative monoids under +, min/max
under least/greatest — so merging N delta batches in any order or
grouping equals the full recompute, which is exactly what the
oracle asserts.  The sum state is kept in DECIMAL (queries/
numeric.py rationale): double addition is order-dependent at the
ulp, and an incrementally-maintained rollup MUST be bit-identical
to the from-scratch recompute or every refresh drifts the ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taps_spark.queries.numeric import DECIMAL_T


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Collapse rows into the mergeable state (cnt, sum_v, min_v,
    max_v) per key.  Map-side combinable; shuffle carries one row per
    key per partition."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast(DECIMAL_T)).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Key-wise merge of any number of agg states — one union + one
    grouped fold, regardless of how many batches are merged.  The key
    columns are every non-state column."""
    keys = [c for c in states[0].columns if c not in ("cnt", "sum_v", "min_v", "max_v")]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame, round_to: int = 4) -> DataFrame:
    """Derive read-time metrics from the state (avg comes from
    sum/cnt — it is NOT stored, because avg is not mergeable).

    The average is computed by INTEGER floor division on the exact
    scaled decimal sum (floor(sum·10⁴/cnt) / 10⁴): round-half on a
    double quotient hits .xxxx5 ties (cents/8) that Spark and DuckDB
    break differently, while floor of an exact rational is
    engine-independent."""
    keys = [c for c in state.columns if c not in ("cnt", "sum_v", "min_v", "max_v")]
    # floor(sum·10⁴/cnt): all-integer (`div`), so no double quotient
    # ever exists to misround.  sum_v has scale 6 → ·10⁶ is exact.
    avg_e4 = F.expr("CAST(sum_v * 1000000 AS BIGINT) div (cnt * 100)")
    return state.select(
        *keys,
        F.col("cnt").alias("n_rows"),
        F.round(F.col("sum_v"), round_to).cast("double").alias("total_v"),
        (avg_e4 / 10000.0).alias("avg_v"),
        F.round("min_v", round_to).alias("lo_v"),
        F.round("max_v", round_to).alias("hi_v"),
    )
