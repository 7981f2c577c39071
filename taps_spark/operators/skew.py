"""Skew-resilient join: key salting.

AQE's skew-join handling (enabled engine-wide in session.py) splits
oversized partitions at runtime, but only for sort-merge joins it can
see; salting is the explicit, planner-independent fallback for the
pathological hot key — the pattern every 100 TB pipeline eventually
needs (one user/session/null-key holding 10% of rows).

Mechanics: the large side hashes each ROW to one of N salt buckets
(deterministic — resumable retries produce identical assignment); the
small side is replicated N× with every salt value; the join key
becomes (key, salt). The hot key's rows now spread over N partitions;
result equality is exact because each large row meets each small row
exactly once (its own salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted N ways.

    `small` is replicated num_salts× (keep it the dimension side);
    `large` pays only a narrow map. Output columns = normal join
    output (salt column dropped).

    Only inner/left/left_semi/left_anti are supported: replicating the
    small side N× would emit N copies of every unmatched small-side
    row under right/full outer, which is silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — replicated small side "
            "would duplicate unmatched rows under right/full outer joins"
        )
    salts = large.sparkSession.range(num_salts).select(F.col("id").cast("int").alias("__salt"))
    big = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(num_salts)).cast("int"),
    )
    rep = small.join(F.broadcast(salts))
    return big.join(rep, [on, "__salt"], how).drop("__salt")
