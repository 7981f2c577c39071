"""Query registry — the single source of truth behind __spark_entry__.py.

Every implemented operator registers here as a named query:
    - a Spark callable (spark, sf_dir) -> DataFrame
    - optionally an ANSI-SQL oracle string DuckDB can run on the same
      parquet tables (views: region nation customer supplier part
      orders lineitem events documents embeddings)

Registration happens at import time via the @query decorator; importing
this package pulls in every query module.

Determinism contract (the driver hashes values order-insensitively but
exactly): float-producing aggregates are rounded, hash inputs avoid
float formatting, timestamps run under session timezone UTC, and
column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}

#: Queries implemented but NOT registered in this environment, with the
#: reason (e.g. a missing optional runtime dependency). Surfaced via
#: skipped_queries() so the driver/judge can audit conditional entries.
SKIPPED: dict[str, str] = {}


def register_skip(name: str, reason: str) -> None:
    SKIPPED[name] = reason


def skipped_queries() -> dict[str, str]:
    """{query_name: why it is not registered here}. Empty when every
    conditional query's dependency is importable."""
    _load()
    return dict(SKIPPED)


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return {name: rq.fn for name, rq in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import every query module exactly once (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred so package import stays cheap and cycle-free.
    from taps_spark.queries import (  # noqa: F401
        advanced,
        dedup,
        events,
        governance,
        graph,
        profiling,
        reference,
        relational,
        similarity,
        streaming,
        text,
        tpch_more,
        udf_surface,
    )

    _LOADED = True
