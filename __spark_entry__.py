"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over taps_spark.queries — the engine's query registry.
`entry` runs the flagship pricing-summary query at sf0.001;
`queries`/`oracle_sql` expose every registered operator with its
DuckDB oracle (see taps_spark/queries/__init__.py for the
determinism contract).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from taps_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from taps_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _coverage_counts() -> dict[str, int]:
    """Count green driver-correctness rows per query across past rounds.

    The driver gates a bounded prefix of `queries()` each round, so we
    rotate: queries with the fewest green rows in CORRECTNESS_r*.json
    sort first, giving every registered query a hard-signal row across
    consecutive rounds.  Deterministic given the committed artifacts.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_green(row):
                counts[name] = counts.get(name, 0) + 1
    return counts


def _last_green_round() -> dict[str, int]:
    """Most recent round index (1-based over the sorted artifacts) in
    which each query had a green row. Staleness tiebreak: among
    queries with equal green-row counts, the one whose last green is
    OLDEST re-gates first — a query last verified in r1 whose module
    was since refactored needs fresh driver evidence more than one
    verified last round (r9 VERDICT task #5)."""
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for i, path in enumerate(
        sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))), start=1
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_green(row):
                last[name] = i
    return last


def _row_green(row: dict) -> bool:
    """Green = FULL oracle match (rows + schema + hash), or the best a
    rows-only query can achieve (err == "no_oracle" with a row count).
    A partial match (rows ok, hash bad) is a FAILURE and must keep
    priority for re-gating. Single definition — _coverage_counts and
    _failed_latest_round must never disagree about what green means."""
    return bool(
        (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            and row.get("err") is None
        )
        or (row.get("err") == "no_oracle" and row.get("spark_rows") is not None)
    )


def _failed_latest_round() -> set[str]:
    """Queries with a non-green row in the MOST RECENT driver
    artifact. These must re-gate before anything else: a recorded
    failure with a fix in the tree is worth more than first coverage
    of a new query."""
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    try:
        with open(paths[-1]) as f:
            rows = json.load(f)
    except (OSError, json.JSONDecodeError):
        return set()
    return {
        name
        for name, row in rows.items()
        if isinstance(row, dict) and not _row_green(row)
    }


def _rotated(names: list[str]) -> list[str]:
    counts = _coverage_counts()
    failed = _failed_latest_round()
    last = _last_green_round()
    # Failed-last-round first, then least-covered, then stalest last
    # green; registry order breaks remaining ties (stable sort).
    return sorted(
        names, key=lambda n: (n not in failed, counts.get(n, 0), last.get(n, 0))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-correctness-covered first (see _coverage_counts)."""
    qs = all_queries()
    return {name: qs[name] for name in _rotated(list(qs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys get the
    driver's weaker rows-only check.  Same rotation as queries()."""
    qs = all_queries()
    oracles = all_oracles()
    return {n: oracles[n] for n in _rotated(list(qs)) if n in oracles}


def skipped() -> dict[str, str]:
    """Metadata: implemented queries NOT registered in this
    environment, with the reason (currently only the Spark 4 v2-state
    query, which needs google.protobuf). Informational — the driver
    contract is entry/queries/oracle_sql."""
    from taps_spark.queries import skipped_queries

    return skipped_queries()
