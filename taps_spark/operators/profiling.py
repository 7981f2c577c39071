"""Data-profiling and deterministic-sampling operators — the
pipeline hygiene tools a transfer engine runs before/after moving
data (the reference's only profile was a row count per table,
lib/taps/server.rb:160-169; this generalizes it to column level).

Scale notes: the profile is ONE pass over the table (all per-column
statistics as a single wide aggregate — no per-column jobs); sampling
is a map-only filter on a content hash, so it needs no state, no
shuffle, and the same rows are selected on any engine/cluster/run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType)


def profile_table(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """Column-level profile: one row per column with null count,
    distinct count, and min/max rendered as strings (numeric columns
    rounded to 4 to stay engine-portable).

    One wide aggregation → one scan, one reduce. `approx_distinct`
    switches COUNT(DISTINCT) to HyperLogLog for the 100 TB run where
    exact distinct per column would add a shuffle per column (Spark
    plans multi-distinct via Expand — fine at 10^2 columns, brutal at
    10^2 columns × 10^12 rows).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        nn = F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{f.name}__nulls")
        nd = (
            F.approx_count_distinct(f.name) if approx_distinct else F.count_distinct(c)
        ).alias(f"{f.name}__distinct")
        if isinstance(f.dataType, _NUMERIC):
            # Render numeric bounds through DECIMAL(18,4): double→string
            # formatting differs across engines (exponent thresholds),
            # decimal→string does not.
            mn = F.min(c).cast("decimal(18,4)").cast("string").alias(f"{f.name}__min")
            mx = F.max(c).cast("decimal(18,4)").cast("string").alias(f"{f.name}__max")
        elif isinstance(f.dataType, (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType)):
            mn = F.min(c).cast("string").alias(f"{f.name}__min")
            mx = F.max(c).cast("string").alias(f"{f.name}__max")
        else:  # arrays/maps/binary: order undefined — profile presence only
            mn = F.lit(None).cast("string").alias(f"{f.name}__min")
            mx = F.lit(None).cast("string").alias(f"{f.name}__max")
        aggs += [nn, nd, mn, mx]
    wide = df.agg(*aggs)
    parts = []
    for f in df.schema.fields:
        parts.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"{f.name}__nulls").alias("n_nulls"),
                F.col(f"{f.name}__distinct").alias("n_distinct"),
                F.col(f"{f.name}__min").alias("min_repr"),
                F.col(f"{f.name}__max").alias("max_repr"),
            )
        )
    return wide.select(F.explode(F.array(*parts)).alias("p")).select("p.*")


def hash_sample(df: DataFrame, id_col: str, rate_pct: int) -> DataFrame:
    """Deterministic content-hash sampling: keep rows whose
    md5(id) mod 100 < rate_pct.

    Unlike df.sample() (seeded RNG over partition iteration order —
    NOT stable across engines or repartitioning), the hash tie to the
    row's key means: reproducible anywhere, stable under re-runs and
    shuffles, and consistent BETWEEN tables (sampling orders and
    lineitem at the same rate keeps referential overlap on the shared
    key). This is how eval/holdout splits stay pinned at 100 TB.
    """
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast(
        "long"
    ) % 100
    return df.filter(bucket < rate_pct)


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, rates_pct: dict[str, int]
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates over the
    same md5(id) buckets as `hash_sample`. Strata missing from
    `rates_pct` are dropped (rate 0).

    Unlike df.sampleBy (seeded RNG over partition order), the hash tie
    means the SAME rows are chosen on any engine/cluster — and because
    the bucket depends only on the id, raising a stratum's rate keeps
    all previously sampled rows (nested samples for eval-set growth).
    """
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast(
        "long"
    ) % 100
    rate = None
    for stratum, pct in sorted(rates_pct.items()):
        cond = F.when(F.col(strata_col) == stratum, F.lit(pct))
        rate = cond if rate is None else rate.when(F.col(strata_col) == stratum, F.lit(pct))
    rate = (rate.otherwise(F.lit(0)) if rate is not None else F.lit(0))
    return df.filter(bucket < rate)


def train_valid_test_split(
    df: DataFrame, id_col: str, train_pct: int = 80, valid_pct: int = 10
) -> DataFrame:
    """Deterministic three-way train/valid/test assignment on
    md5(id) buckets: bucket < train_pct → 'train', < train+valid →
    'valid', else 'test'. Returns the input plus `bucket` and `split`.

    Properties RNG splits can't give you: every engine/cluster/run
    assigns the SAME row to the SAME split (no leakage when the
    pipeline is re-run or re-partitioned); the three splits are
    disjoint and exhaustive by construction (a single CASE over one
    bucket value); and growing train_pct only MOVES rows from
    valid/test into train — it never reshuffles existing train rows
    out, so checkpoint-resumed training never sees its eval data.

    Scale: map-only column expressions — no shuffle, no state, runs
    at scan speed on 100 TB, and the assignment rides the key so
    joined tables (e.g. documents ↔ embeddings) land in the same
    split.
    """
    if not (0 <= train_pct and 0 <= valid_pct and train_pct + valid_pct <= 100):
        raise ValueError("split percentages must be non-negative and sum to <= 100")
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def redact_pattern(col, pattern: str = "[0-9]", repl: str = "#"):
    """Mask every regex match in a string column (digit masking by
    default — the account-number/phone scrubbing primitive). Global
    replace in both engines: Spark's regexp_replace is global by
    default; the oracle passes the 'g' flag. Patterns must stay in
    the Java∩RE2 common subset (no lookaround).

    Scale: map-only JVM regex — runs at scan speed, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, repl)
