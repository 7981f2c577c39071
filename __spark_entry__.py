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
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from taps_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from taps_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _artifact_scan() -> tuple[dict[str, int], dict[str, int], set[str], int]:
    """ONE pass over the committed CORRECTNESS_r*.json artifacts (they
    are the driver's per-round hard-signal record) returning
    (green-row counts, last-green round, latest-round failures,
    latest round number). Paths sort by the extracted round NUMBER —
    lexicographic order would file r100 between r10 and r11.
    Deterministic given the committed artifacts."""
    here = os.path.dirname(os.path.abspath(__file__))
    # fullmatch-filter BEFORE sorting: a stray glob hit with no round
    # number (e.g. CORRECTNESS_retry.json) must be ignored, not crash
    # the rotation at import time (r11 ADVICE).
    matched = [
        (p, re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p)))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    ]
    rounds = {p: int(m.group(1)) for p, m in matched if m}
    paths = sorted(rounds, key=rounds.get)
    counts: dict[str, int] = {}
    last: dict[str, int] = {}
    failed: set[str] = set()
    latest = 0
    for path in paths:
        rnd = rounds[path]
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        latest = max(latest, rnd)
        is_latest = path is paths[-1]
        if is_latest:
            failed = set()
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if _row_green(row):
                counts[name] = counts.get(name, 0) + 1
                last[name] = rnd
            elif is_latest:
                failed.add(name)
    return counts, last, failed, latest


def _coverage_counts() -> dict[str, int]:
    """Green driver-correctness rows per query across past rounds."""
    return _artifact_scan()[0]


def _last_green_round() -> dict[str, int]:
    """Most recent round NUMBER in which each query had a green row."""
    return _artifact_scan()[1]


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
    return _artifact_scan()[2]


def _touched_since_seal() -> set[str]:
    """Queries whose implementing files changed since the previous
    seal, from the committed TOUCHED_QUERIES.json artifact (generated
    by tools/touched_queries.py at seal time — the driver environment
    has no git, so the list ships as data). Missing or malformed file
    → empty set: the tier degrades to a no-op, never an error."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "TOUCHED_QUERIES.json")) as f:
            data = json.load(f)
        return {n for n in data.get("queries", []) if isinstance(n, str)}
    except (OSError, json.JSONDecodeError, AttributeError):
        return set()


def _rotated(names: list[str]) -> list[str]:
    counts, last, failed, latest = _artifact_scan()
    touched = _touched_since_seal()
    # Priority: (1) failed-last-round, (2) queries with NO driver row
    # at all — zero hard signal outranks old-but-green signal plus
    # fresh local sweeps, so newcomers gate in their FIRST round and
    # a second zero-evidence backlog can never form (r11 VERDICT
    # task #1; supersedes the r10 latest-4 pivot) — then (3) queries
    # whose implementing files changed since the previous seal
    # (TOUCHED_QUERIES.json; r12 VERDICT task #2: an optimization
    # round's edits re-gate in the SAME round instead of waiting for
    # the LRU wheel), then (4) stalest last-green (LRU: every query
    # re-gates within ceil(N/50) rounds by construction), then (5)
    # least-covered; registry order breaks remaining ties (stable
    # sort). Stateless given the committed artifacts.
    return sorted(
        names,
        key=lambda n: (
            n not in failed,
            n in last,
            n not in touched,
            last.get(n, 0),
            counts.get(n, 0),
        ),
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
