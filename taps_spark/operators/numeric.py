"""Exact cross-engine numeric folds.

The one float trap this repo has actually been bitten by (r6,
`pipeline_dsir_weights`) is `ROUND(AVG(x), 3)` over an UNORDERED double
aggregate: the per-row doubles are bit-identical on Spark and DuckDB,
but the summation ORDER differs between engines (and between fixture
generations), so the mean can land on either side of a rounding
boundary. The fix is the integer-grid recipe used everywhere here:

1. quantize each row's double to an integer grid with
   ``FLOOR(x * 1e9 + 0.5)`` — multiply, add and floor are identical
   IEEE steps on both engines, so the per-row integer is bit-identical;
2. sum the integers EXACTLY in ``DECIMAL(38,0)`` — order-independent;
3. fold the exact integer sum to the reported precision (millis /
   ten-micros) through ONE correctly-rounded double division.

The DOUBLE cast of the exact sum is itself exact while |sum| < 2^53,
i.e. for any group under ~9e6 rows x |x| <= 1e3 at nano scale — far
beyond the per-document / per-group grains these folds run at; at
coarser grains pick a coarser grid.

SQL twin (write it literally in the DuckDB oracle):

    CAST(FLOOR(x * 1000000000 + 0.5) AS DECIMAL(38,0))             -- q
    CAST(FLOOR((CAST(SUM(q) AS DOUBLE)
                / (CAST(COUNT(*) AS DOUBLE) * 1000000000))
               * <scale> + 0.5) AS BIGINT)                          -- mean fold
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NANO = 1_000_000_000


def quantize_nano(col: Column) -> Column:
    """Bit-identical integer 1e-9-grid quantization of a double column:
    ``FLOOR(x * 1e9 + 0.5)`` as DECIMAL(38,0), ready for an exact,
    order-independent SUM."""
    return F.floor(col * NANO + F.lit(0.5)).cast("decimal(38,0)")


def exact_mean_scaled(sum_q: Column, n: Column, scale: int) -> Column:
    """Mean of nano-quantized values folded to an integer at ``scale``
    (1000 → millis, 10000 → ten-micros...), computed from the EXACT
    DECIMAL(38,0) sum: one correctly-rounded double division, then the
    same FLOOR(x*scale + 0.5) fold both engines execute identically."""
    mean = sum_q.cast("double") / (n.cast("double") * F.lit(float(NANO)))
    return F.floor(mean * scale + F.lit(0.5)).cast("long")
