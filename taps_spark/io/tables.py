"""Fixture-table loading.

The driver fixtures are one parquet file per table under an sf dir
(see /root/repo/TESTDATA.md). `load_tables` gives every query a single
way to get its inputs: parquet scans (column-pruned + predicate-pushed
by Catalyst) with the session tuned for oracle parity.

Parity: the reference's table discovery is `db.tables`
(lib/taps/operation.rb:569, lib/taps/server.rb:153); here the catalog
is the fixture directory — see taps_spark.catalog for the
discovery/filter surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from taps_spark.session import tune

#: The full fixture catalog (TESTDATA.md).
TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's
        # reader; with spark.sql.legacy.parquet.nanosAsLong (session.py)
        # it arrives as LongType nanos. Floor-divide to micros (exactly
        # what DuckDB's ns→us narrowing does) so both engines see
        # identical timestamps.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div`, not `/`: epoch-nanos exceed double's 2^53
            # exact-integer range, so float division would corrupt the
            # low-order digits.
            # Cast to TIMESTAMP_NTZ: Spark 4 reads the other fixtures'
            # parquet timestamps (isAdjustedToUTC=false) as NTZ, and
            # DuckDB timestamps are naive — keep one timestamp family
            # engine-wide. Session TZ is pinned UTC so the cast is a
            # pure relabel.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
    return df


def parallelize_cpu(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan has fewer partitions than
    cores — for CPU-heavy per-row operators (shingling, hash families,
    vector math) whose input is small but whose map work is not.

    The fixtures are single-file/single-row-group parquet, so Spark
    plans a one-task scan and the whole hash pipeline runs on one core;
    shuffling a few MB to unlock N-way codegen parallelism is a
    >2× win (measured on minhash at sf0.1). At production scale the
    file count exceeds the core count and this is a no-op, so the
    shuffle never appears where it would hurt.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load fixture tables as DataFrames keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
