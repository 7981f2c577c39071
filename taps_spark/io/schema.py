"""Schema dump/load: StructType ⇄ portable DDL (reference #12 parity).

The reference round-trips schemas as generated Sequel migration
classes shipped over HTTP and eval'd on the other side
(lib/taps/schema.rb:15-30 dump, 60-66 load, via the bin/schema
subprocess at lib/taps/utils.rb:117-134). The Spark engine's portable
form is simply Spark's own DDL string (`col TYPE, ...`) plus an
explicit SQL-dialect type mapping for JDBC targets — no subprocess,
no eval.

Known reference limitation preserved deliberately: foreign keys are
not transferred (README.rdoc:35); primary-key/index DDL goes through
the passthrough layer (io/jdbc.py) because DataFrames cannot express
them.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Spark type → ANSI-ish SQL column type per dialect. The varchar
#: length is not tracked by Spark (StringType is unbounded); the
#: validation layer (validation.py varchar_limit) enforces declared
#: lengths instead — the same division of labor as the reference
#: (schema DDL + InvalidData checks, lib/taps/utils.rb:47-68).
_SQL_TYPES: dict[str, dict[type, str]] = {
    "postgres": {
        T.LongType: "BIGINT",
        T.IntegerType: "INTEGER",
        T.ShortType: "SMALLINT",
        T.DoubleType: "DOUBLE PRECISION",
        T.FloatType: "REAL",
        T.StringType: "TEXT",
        T.BinaryType: "BYTEA",
        T.BooleanType: "BOOLEAN",
        T.TimestampType: "TIMESTAMP",
        T.TimestampNTZType: "TIMESTAMP",
        T.DateType: "DATE",
    },
    "mysql": {
        T.LongType: "BIGINT",
        T.IntegerType: "INT",
        T.ShortType: "SMALLINT",
        T.DoubleType: "DOUBLE",
        T.FloatType: "FLOAT",
        T.StringType: "TEXT",
        T.BinaryType: "BLOB",
        T.BooleanType: "TINYINT(1)",
        T.TimestampType: "DATETIME",
        T.TimestampNTZType: "DATETIME",
        T.DateType: "DATE",
    },
    "sqlite": {
        T.LongType: "INTEGER",
        T.IntegerType: "INTEGER",
        T.ShortType: "INTEGER",
        T.DoubleType: "REAL",
        T.FloatType: "REAL",
        T.StringType: "TEXT",
        T.BinaryType: "BLOB",
        T.BooleanType: "INTEGER",
        T.TimestampType: "TIMESTAMP",
        T.TimestampNTZType: "TIMESTAMP",
        T.DateType: "DATE",
    },
    # Derby: the live-JDBC dialect the test harness actually executes
    # against (no unbounded TEXT type — VARCHAR(32672) is its max).
    "derby": {
        T.LongType: "BIGINT",
        T.IntegerType: "INTEGER",
        T.ShortType: "SMALLINT",
        T.DoubleType: "DOUBLE",
        T.FloatType: "REAL",
        T.StringType: "VARCHAR(32672)",
        T.BinaryType: "BLOB",
        T.BooleanType: "BOOLEAN",
        T.TimestampType: "TIMESTAMP",
        T.TimestampNTZType: "TIMESTAMP",
        T.DateType: "DATE",
    },
}


def dump_schema(schema: T.StructType) -> str:
    """Engine-portable schema dump: Spark's canonical JSON form —
    lossless for every type the engine uses including nested
    arrays/maps/structs (which the reference could never express —
    its rows were flat scalars, SURVEY.md §1.1)."""
    return schema.json()


def load_schema(dumped: str) -> T.StructType:
    """Inverse of dump_schema."""
    import json

    parsed = T.StructType.fromJson(json.loads(dumped))
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"not a struct schema: {dumped}")
    return parsed


def create_table_sql(
    table: str,
    schema: T.StructType,
    dialect: str = "postgres",
    primary_key: str | None = None,
    if_not_exists: bool = False,
) -> str:
    """CREATE TABLE DDL for a JDBC target (the reference's schema-load
    phase; decimal/varchar sizes map through explicitly)."""
    mapping = _SQL_TYPES[dialect]
    cols = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            sql_t = f"DECIMAL({dt.precision},{dt.scale})"
        elif type(dt) in mapping:
            sql_t = mapping[type(dt)]
        else:
            raise ValueError(f"no {dialect} mapping for {dt.simpleString()} ({f.name})")
        null = "" if f.nullable else " NOT NULL"
        pk = " PRIMARY KEY" if primary_key == f.name else ""
        cols.append(f"{f.name} {sql_t}{null}{pk}")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}{table} ({', '.join(cols)})"


def diff_schemas(old: T.StructType, new: T.StructType) -> list[dict]:
    """Schema-drift report between two table versions: added, removed,
    retyped, and nullability-changed columns, in new-schema order
    (removed columns last, in old order).

    The reference transfers schemas wholesale and silently replaces
    the target (lib/taps/schema.rb `down`+`up`); a 100 TB pipeline
    instead needs to KNOW what changed before deciding merge vs
    migrate — this is the pre-flight check for mergeSchema reads
    (sources.read_parquet_evolved) and for evolving JDBC sinks.
    """
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    report: list[dict] = []
    for f in new.fields:
        if f.name not in old_f:
            report.append({"column": f.name, "change": "added",
                           "old_type": None, "new_type": f.dataType.simpleString()})
            continue
        o = old_f[f.name]
        if o.dataType != f.dataType:
            report.append({"column": f.name, "change": "retyped",
                           "old_type": o.dataType.simpleString(),
                           "new_type": f.dataType.simpleString()})
        elif o.nullable != f.nullable:
            report.append({"column": f.name, "change": "nullability",
                           "old_type": str(o.nullable).lower(),
                           "new_type": str(f.nullable).lower()})
    for f in old.fields:
        if f.name not in new_f:
            report.append({"column": f.name, "change": "removed",
                           "old_type": f.dataType.simpleString(), "new_type": None})
    return report
