"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over taps_spark.queries — the engine's query registry.
`entry` runs the flagship pricing-summary query at sf0.001;
`queries`/`oracle_sql` expose every registered operator with its
DuckDB oracle (see taps_spark/queries/__init__.py for the
determinism contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from taps_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from taps_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys get the
    driver's weaker rows-only check."""
    return all_oracles()
