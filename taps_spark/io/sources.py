"""File-format sources: parquet / CSV / JSON readers with explicit
schemas (SURVEY.md §2b — absent in the reference, which only spoke
live Sequel connections, lib/taps/operation.rb:129-131).

Rules that matter at 100 TB:
- NEVER inferSchema on CSV/JSON in production paths — inference is an
  extra full scan; pass or persist the schema (io/schema.py).
- Parquet is the engine's interchange format (pushdown + pruning);
  CSV/JSON exist for ingest/egress at the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from taps_spark.session import tune


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    tune(spark)
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    tune(spark)
    return spark.read.options(header=str(header).lower(), **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options: str
) -> DataFrame:
    tune(spark)
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other columnar interchange format (predicate pushdown
    + column pruning like parquet); schema travels in the footer."""
    tune(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("compression", "zstd").orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
