"""Relational operator helpers beyond single built-in calls.

The reference has no relational algebra at all (SURVEY.md §2b) — its
whole query surface is scan/count/limit/offset/max (lib/taps/
data_stream.rb:76-87, 279-312). The helpers here are the engine's
scale-aware building blocks for the query inventory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window.

    Scale: one shuffle on group_cols; within-partition sort only —
    no global sort. Pass a tie-breaking unique column in order_cols
    for deterministic output.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right_time <= left_time for the same key (ties broken by the last
    right_value_col, ascending — pass a unique id last for
    determinism).

    Spark has no native as-of join; the scalable formulation is
    union + window (one shuffle on key, linear scan per key) instead
    of the naive range join (quadratic per key):

      1. Tag both sides, union on (key, time) with right rows sorted
         before left rows at equal time (so "<=" semantics hold).
      2. last_value(ignorenulls) over (partition by key
         order by time, side, tiebreak) carries the latest right
         attributes forward.
      3. Keep left rows.

    At 100 TB this beats pd.merge_asof-per-group (applyInPandas)
    because it never materializes a group in Python memory and AQE can
    split skewed keys.
    """
    lcols = left.columns
    tag_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tag_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tag_r.unionByName(tag_l)
    # Right rows at the same timestamp sort first (side 0 < 1), so a
    # left row at time t sees right rows with __t <= t. The trailing
    # value columns order ties between right rows deterministically.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *[F.col(c).asc_nulls_first() for c in right_value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"{prefix}{c}") for c in right_value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: Sequence[str],
    prefix: str = "near_",
) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof parity):
    for each left row, the right row whose time is CLOSEST to
    left_time for the same key; exact distance tie → the backward
    (earlier-or-equal) candidate, matching pandas.

    Same union+window shape as asof_join, but BOTH directions ride
    one shuffle and one sort: last(ignorenulls) over the preceding
    frame carries the latest right row at-or-before each left row,
    first(ignorenulls) over the following frame carries the next
    right row strictly after it (equal-time right rows sort before
    the left row, so they land in the backward candidate — where a
    0-distance match wins anyway). The final pick is a row-local
    CASE on microsecond distances; no second exchange, no per-key
    range join.

    Ties among right rows at the same time are deterministic: value
    columns order the sort, backward takes the last (max), forward
    the first (min) — mirror this in any oracle.
    """
    lcols = left.columns
    rvc = list(right_value_cols)
    tag_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in rvc],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tag_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rvc],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tag_r.unionByName(tag_l)
    order = ["__t", "__side", *[F.col(c).asc_nulls_first() for c in rvc]]
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[F.last(F.col(c), ignorenulls=True).over(wb).alias(f"__b_{c}") for c in rvc],
        *[F.first(F.col(c), ignorenulls=True).over(wf).alias(f"__f_{c}") for c in rvc],
    )
    bt = F.col(f"__b_{right_time}").cast("timestamp")
    ft = F.col(f"__f_{right_time}").cast("timestamp")
    lt = F.col("__t").cast("timestamp")
    use_b = bt.isNotNull() & (
        ft.isNull()
        | ((F.unix_micros(lt) - F.unix_micros(bt)) <= (F.unix_micros(ft) - F.unix_micros(lt)))
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[
            F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(f"{prefix}{c}")
            for c in rvc
        ],
    )
