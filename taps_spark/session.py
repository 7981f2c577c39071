"""SparkSession construction and tuning.

All engine entry points accept an externally built SparkSession (the
driver harness owns it); `tune()` applies the runtime-settable confs
the engine relies on for determinism (UTC timestamps for oracle
parity) and for sane local-mode performance (AQE, shuffle partition
count ≈ cores). `get_spark()` builds a session for tests/benchmarks.

Scale note: on a real cluster the static confs (executor memory,
shuffle service, dynamic allocation) come from spark-submit; nothing
here assumes local mode except the defaults in `get_spark()`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to any session the engine touches.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp rendering; DuckDB oracle timestamps are
    # UTC-naive, so pin the session timezone.
    "spark.sql.session.timeZone": "UTC",
    # AQE re-plans post-shuffle: coalesces small partitions, rewrites
    # skewed joins, converts sort-merge→broadcast when stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas exchange (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs over Arrow batches too — the default pickle
    # row-at-a-time exchange (BatchEvalPythonUDTF) is the slow path.
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects outright; read nanos as LongType and convert to
    # microsecond timestamps in the loader (io/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally owned session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be fixed by the owner; never fail a query
            # over a tuning knob.
            pass
    return spark


def get_spark(app_name: str = "taps_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build a local session for tests/benchmarks.

    Honors SPARK_GRAFT_CPUS for parallelism; shuffle partitions default
    to the core count (200 default is wrong at every local scale —
    over-parallelized for tiny data, under for huge).
    """
    import tempfile

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Keep warehouse/metastore droppings out of the repo (static
        # confs — only effective for the session that creates the JVM).
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="taps_wh_"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={tempfile.mkdtemp(prefix='taps_derby_')}",
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
