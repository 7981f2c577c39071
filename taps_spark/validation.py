"""Declarative data-validation rules (reference InvalidData parity).

The reference enforces two constraints Spark won't enforce natively:
- varchar(n) length (SQLite doesn't enforce; taps raises InvalidData —
  lib/taps/utils.rb:47-68, spec'd in spec/utils_spec.rb)
- integer range (SQLite ints can exceed the target's max —
  lib/taps/data_stream.rb:206-213)

Here the rules compile to ONE aggregate pass over the DataFrame
(every rule a conditional count — no per-row Python), and
`enforce` raises InvalidData when any rule trips, with per-rule
violation counts in the message.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taps_spark.errors import InvalidData

INT32_MAX = 2_147_483_647
INT64_MAX = 9_223_372_036_854_775_807


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # TRUE ⇒ violation


def varchar_limit(col: str, max_len: int) -> Rule:
    return Rule(f"{col}_varchar_{max_len}", F.length(F.col(col)) > max_len)


def int_range(col: str, lo: int, hi: int = INT32_MAX) -> Rule:
    return Rule(f"{col}_range", (F.col(col) < lo) | (F.col(col) > hi))


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def coerce_invalid_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """Reference parity for malformed datetimes → NULL: taps sets
    `convert_invalid_date_time = :nil` (lib/taps/config.rb:4,
    lib/taps/data_stream.rb:229-231) so MySQL zero-dates and garbage
    strings load as NULL instead of failing the transfer.

    Spark analog: `try_to_timestamp` parses string columns
    permissively — unparseable values become NULL, never an error —
    all JVM-side, one map pass, no shuffle."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.try_to_timestamp(F.col(c)))
    return out


def violation_counts(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """One distributed aggregate: conditional count per rule."""
    if not rules:
        return {}
    row = df.agg(
        *[F.sum(F.when(r.predicate, 1).otherwise(0)).alias(r.name) for r in rules]
    ).collect()[0]
    return {r.name: (row[r.name] or 0) for r in rules}


def enforce(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Raise InvalidData if any rule is violated; otherwise return df
    unchanged (chainable into a transfer pipeline)."""
    counts = violation_counts(df, rules)
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise InvalidData(f"validation failed: {bad}")
    return df
