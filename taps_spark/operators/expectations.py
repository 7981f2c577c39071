"""Declarative data-quality expectations, verified in one pass.

The reference ships row-count / checksum verification of a transfer
(taps: lib/taps/data_stream.rb:88-109 verify_stream; lib/taps/
operation.rb:229-233 verify counts per table).  This module
generalizes that idea into a Deequ/Great-Expectations-shaped
constraint suite: each expectation is an aggregate metric plus a
threshold, and the whole suite is evaluated in a SINGLE aggregation
pass over the relation — at 100 TB you get one scan + one tiny
all-to-one agg regardless of how many constraints are declared,
instead of one job per check.

Scale notes
-----------
* All metrics are plain Catalyst aggregate expressions → map-side
  partial aggregation, whole-stage codegen, zero Python.
* Referential checks need a join; callers pre-join and express the
  containment metric over the joined relation so it still rides the
  same single pass (see queries/governance.py).
* The verdict explode runs on ONE row — driver-side cost is nil.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: comparison direction for an expectation threshold
GE = ">="
LE = "<="


@dataclass(frozen=True)
class Expectation:
    """One named constraint: aggregate `metric` compared to `threshold`."""

    name: str
    metric: Column
    threshold: float
    op: str = GE  # GE → pass when metric >= threshold; LE → metric <= threshold


def completeness(col: str) -> Column:
    """Fraction of non-null values (Deequ Completeness)."""
    return F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0))


def uniqueness(col: str) -> Column:
    """distinct / total — 1.0 iff the column is a key (Deequ Uniqueness)."""
    return F.countDistinct(col) / F.count(F.lit(1))


def domain_fraction(col: str, allowed: tuple[str, ...]) -> Column:
    """Fraction of rows whose value is inside the allowed domain."""
    return F.avg(F.when(F.col(col).isin(*allowed), 1.0).otherwise(0.0))


def verify(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation over `df`.

    Returns a long-format verdict relation:
        (check_name STRING, metric DOUBLE, threshold DOUBLE,
         op STRING, passed BOOLEAN)
    ordered by check_name.  Metrics are rounded to 6 decimals before
    the comparison so the verdict is engine-portable.
    """
    agg_row = df.agg(
        *[e.metric.cast("double").alias(e.name) for e in expectations]
    )
    return verdict(agg_row, [(e.name, e.threshold, e.op) for e in expectations])


def verdict(agg_row: DataFrame, specs: list[tuple[str, float, str]]) -> DataFrame:
    """Explode a one-row RAW metrics frame (column per check) into the
    long-format verdict relation.  Split out of `verify` so STREAMING
    pipelines can compute the metrics as a stateful streaming
    aggregation (mergeable across micro-batches) and derive the
    identical verdict from the materialized state.

    The comparison runs on the UNROUNDED metric; rounding is display
    only.  Rounding first would let an exact constraint (completeness
    >= 1.0) pass with up to ~5e-7 violations — thousands of bad rows
    at the scale this suite exists to police."""
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.round(F.col(name), 6).alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
            F.lit(op).alias("op"),
            (
                (F.col(name) >= F.lit(float(threshold)))
                if op == GE
                else (F.col(name) <= F.lit(float(threshold)))
            ).alias("passed"),
        )
        for name, threshold, op in specs
    ]
    return (
        agg_row.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("check_name")
    )
