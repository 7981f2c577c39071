"""JDBC scan planning + DDL passthrough SQL generation.

This is the Spark mapping of the reference's single most important
physical decision (SURVEY.md §4 #1): pick the access path per table.

Reference behavior:
- single integer PK → keyset pagination, `WHERE pk > last ORDER BY pk
  LIMIT k` (lib/taps/data_stream.rb:279-312, chosen at
  lib/taps/data_stream.rb:228-242 via utils.rb:140-143)
- otherwise → OFFSET pagination ordered by all columns
  (lib/taps/data_stream.rb:76-87) — the documented O(n²) cliff
  (README.rdoc:36)

Spark-native plan: a numeric PK becomes `partitionColumn` +
lower/upper bounds + numPartitions — Spark generates exactly the
keyset-range predicates (`pk >= lo AND pk < hi`) and runs them in
PARALLEL, which is why the engine's floor throughput is ~numPartitions
× the reference's single-cursor rate. No usable PK degrades to a
single-partition read (documented, like the reference's cliff) or to
caller-supplied predicate ranges.

No live database exists in the test environment, so `plan_jdbc_scan`
returns the exact reader options (asserted in unit tests) and
`read_jdbc` applies them when a URL is available.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableStats:
    """Bounds the planner needs — one cheap aggregate on the source
    (SELECT count(*), min(pk), max(pk)), the Spark analog of the
    reference's table_count + verify_stream max(pk) calls
    (lib/taps/server.rb:160-169, lib/taps/data_stream.rb:329-340)."""

    n_rows: int
    pk: str | None = None
    pk_min: int | None = None
    pk_max: int | None = None


@dataclass(frozen=True)
class JdbcScanPlan:
    table: str
    options: dict[str, str] = field(default_factory=dict)
    parallel: bool = True
    reason: str = ""


def plan_jdbc_scan(
    table: str,
    stats: TableStats,
    target_rows_per_partition: int = 1_000_000,
    max_partitions: int = 512,
) -> JdbcScanPlan:
    """Choose the partitioned-read strategy for one table.

    Sizing: partitions ≈ n_rows / target_rows_per_partition, clamped
    to [1, max_partitions] — the static analog of the reference's
    adaptive chunk sizing (transfer/chunking.py holds the adaptive
    controller math for the fetchsize feedback loop).
    """
    if stats.pk is None or stats.pk_min is None or stats.pk_max is None:
        return JdbcScanPlan(
            table=table,
            options={"dbtable": table},
            parallel=False,
            reason="no single integer primary key → single-cursor read "
            "(reference's offset-scan fallback, data_stream.rb:76-87)",
        )
    n_parts = max(1, min(max_partitions, stats.n_rows // target_rows_per_partition or 1))
    return JdbcScanPlan(
        table=table,
        options={
            "dbtable": table,
            "partitionColumn": stats.pk,
            "lowerBound": str(stats.pk_min),
            "upperBound": str(stats.pk_max + 1),
            "numPartitions": str(n_parts),
            # fetchsize: rows per JDBC round trip; the reference's
            # steady-state chunksize lands ~1000-2000 (BASELINE.md),
            # a modern driver sustains far more.
            "fetchsize": "10000",
        },
        parallel=True,
        reason=f"keyset-range parallel read on {stats.pk} ({n_parts} partitions)",
    )


def read_jdbc(spark: SparkSession, url: str, plan: JdbcScanPlan, **extra: str) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in {**plan.options, **extra}.items():
        reader = reader.option(k, v)
    return reader.load()


# --------------------------------------------------------------------------
# DDL passthrough (not expressible as DataFrame ops)
# --------------------------------------------------------------------------


def create_index_sql(table: str, columns: list[str], unique: bool = False) -> str:
    """Deferred secondary-index DDL (reference #13: indexes applied
    AFTER data load as a bulk-load optimization,
    lib/taps/schema.rb:32-58, ordering at lib/taps/operation.rb:245-256)."""
    idx = f"idx_{table}_{'_'.join(columns)}"
    u = "UNIQUE " if unique else ""
    return f'CREATE {u}INDEX {idx} ON {table} ({", ".join(columns)})'


def reset_sequence_sql(table: str, pk: str, dialect: str = "postgres") -> str:
    """Auto-increment resync after bulk load (reference #14:
    reset_db_sequences, lib/taps/schema.rb:74-80)."""
    if dialect == "postgres":
        return (
            f"SELECT setval(pg_get_serial_sequence('{table}', '{pk}'), "
            f"(SELECT COALESCE(MAX({pk}), 1) FROM {table}))"
        )
    if dialect == "mysql":
        return f"ALTER TABLE {table} AUTO_INCREMENT = 1"
    if dialect == "sqlite":
        return (
            f"UPDATE sqlite_sequence SET seq = (SELECT MAX({pk}) FROM {table}) "
            f"WHERE name = '{table}'"
        )
    raise ValueError(f"unknown dialect: {dialect}")
