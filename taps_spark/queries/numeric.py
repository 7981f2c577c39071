"""Cross-engine numeric determinism helpers.

Summing doubles is order-dependent at ~1e-16 relative error, and
Spark's partial-aggregation order differs from DuckDB's vectorized
order — so `round(sum(x), 2)` can land a cent apart when the true sum
sits near a rounding boundary (observed on q7 at sf0.001).

Fix the class, not the instance: quantize each term to decimal(27,6)
— scale 6 because products of the fixtures' 2-decimal factors
terminate at 6 decimals, so the cast RECOVERS the exact value and no
.xxxx5 tie (which the engines break differently) can occur — then sum
EXACTLY in decimal, cast the one result back to double
(same value both sides), then round. The oracle mirrors it as
  CAST(ROUND(SUM(CAST(x AS DECIMAL(27,6))), s) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CAST_SCALE = 6
DECIMAL_T = f"decimal(27,{CAST_SCALE})"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive deterministic sum of a double expression.

    The final rounding happens in DECIMAL space via ROUND(decimal)
    (half-away-from-zero in both engines — NOT a decimal downscale
    cast, which DuckDB truncates), and NOT on a double: an exact
    decimal sum ending in ...5 (e.g. 137947.485) has no exact double,
    and Spark (shortest-repr HALF_UP) and DuckDB (binary comparison)
    round that double differently.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL_T)), scale).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum ÷ count in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL_T)).cast("double") / F.count(F.lit(1)), scale)


def dsum_sql(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(27,{CAST_SCALE}))), {scale}) AS DOUBLE)"
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(27,{CAST_SCALE}))) AS DOUBLE)"
        f" / COUNT(*), {scale})"
    )
