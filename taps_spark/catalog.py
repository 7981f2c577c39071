"""Catalog surface: table discovery, counts, and name filtering.

Parity targets (SURVEY.md §2a #1-#3):
- table discovery  — reference `db.tables` via GET pull/table_names
  (lib/taps/server.rb:147-158, lib/taps/operation.rb:338-368)
- row counts       — `db[table].count` via POST pull/table_count
  (lib/taps/server.rb:160-169)
- name filter      — `--filter` regex / `--tables` include /
  `--exclude_tables` (lib/taps/operation.rb:40-63, compiled from the
  CLI at lib/taps/cli.rb:137-142)

Here a "database" is any directory of parquet tables (the fixture
layout) or a Spark catalog namespace; counts come back as a DataFrame
so they compose with the rest of the engine.
"""

from __future__ import annotations

import os
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.io.tables import TABLE_NAMES, load_table


def discover_tables(sf_dir: str) -> list[str]:
    """List table names in a parquet-directory 'database' (sorted).

    Mirrors `db.tables`: dynamic discovery, no declared catalog.
    """
    names = []
    for entry in sorted(os.listdir(sf_dir)):
        if entry.endswith(".parquet"):
            names.append(entry[: -len(".parquet")])
    return names or list(TABLE_NAMES)


def compile_table_pattern(tables: list[str] | None) -> str | None:
    """Compile an include-list to a regex, as the reference CLI does:
    ['a','b'] → '(^a$|^b$)' (lib/taps/cli.rb:137-142)."""
    if not tables:
        return None
    return "(" + "|".join(f"^{re.escape(t)}$" for t in tables) + ")"


def apply_table_filter(
    names: list[str],
    pattern: str | None = None,
    exclude: list[str] | None = None,
) -> list[str]:
    """Regex include + exact exclude over the table list
    (reference apply_table_filter, lib/taps/operation.rb:40-63)."""
    out = []
    rx = re.compile(pattern) if pattern else None
    excl = set(exclude or ())
    for n in names:
        if n in excl:
            continue
        if rx is not None and not rx.search(n):
            continue
        out.append(n)
    return out


def table_counts(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> DataFrame:
    """One row per table: (table_name, n_rows).

    Scale: each count is a parquet-footer metadata aggregate
    (no full scan — Spark reads row-group counts); the per-table
    results are unioned into one tiny DataFrame.
    """
    names = names or discover_tables(sf_dir)
    parts = [
        load_table(spark, sf_dir, n)
        .groupBy()
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit(n).alias("table_name"), "n_rows")
        for n in names
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
