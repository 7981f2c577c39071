"""Local full-registry correctness sweep — the driver's oracle gate,
uncapped.

The external driver samples at most ~50 registry entries per round for
CORRECTNESS_r{N}.json; this script runs EVERY registered query against
its DuckDB oracle at the driver's scale (sf0.01) with the driver's
comparison semantics (column names sorted, order-insensitive exact
values) and writes CORRECTNESS_LOCAL.json so each round carries hard
evidence for the whole registry, not just the sampled slice.

Usage: python tools/local_correctness.py [sf_dir] [out_path]
"""

from __future__ import annotations

import datetime
import json
import math
import os
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normval(v):
    """Normalize one cell to a (type-class, value) pair so the compare is
    dtype-strict like the driver's value hash: int64 1435 vs float64 1435.0
    is a FAIL here, not a Python `==` pass.  (The r5 escape:
    `pipeline_mix_apply`'s oracle shipped an uncast HUGEINT-sum as float64
    and this gate's plain `==` let it through while the driver's
    type-sensitive hash did not.)"""
    try:
        if v is None or (not isinstance(v, (list, tuple, dict, np.ndarray)) and pd.isna(v)):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return "NULL" if math.isnan(v) else ("f", float(v))
    if isinstance(v, Decimal):
        return ("d", v)
    if isinstance(v, (str, np.str_)):
        return ("s", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, np.ndarray):
        return ("a", tuple(_normval(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_normval(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((str(k), _normval(x)) for k, x in v.items())))
    # DATE cells intentionally normalize to DIFFERENT classes per
    # engine (Spark toPandas -> datetime.date 'D'; DuckDB fetch_df ->
    # datetime64 't'): the driver's hash is equally type-sensitive,
    # which is why every oracle-gated query outputs dates as formatted
    # STRINGS (date_format / STRFTIME). A raw-DATE output column
    # failing here is the gate doing its job, not a false positive.
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        return ("t", pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return ("D", v)
    return (type(v).__name__, v)


def _norm(rows):
    out = [tuple(_normval(v) for v in row) for row in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def changed_query_names(ref: str) -> set[str]:
    """Registry names whose source plausibly changed since `ref`: the
    query's DEFINING module changed, or any changed taps_spark module's
    basename is imported by the defining module (errs toward inclusion
    — an operators/ edit re-gates every query that imports it). This is
    the cheap registration gate from the r8 verdict: a query batch must
    never ship without a sweep of at least the changed slice."""
    import inspect
    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    changed = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "*.py"],
        capture_output=True,
        text=True,
        cwd=repo_root,
        check=True,
    ).stdout.split()
    changed_paths = {os.path.normpath(p) for p in changed}
    changed_basenames = {
        os.path.splitext(os.path.basename(p))[0]
        for p in changed_paths
        if p.startswith("taps_spark")
    }
    from taps_spark.queries import REGISTRY, _load

    _load()
    names: set[str] = set()
    src_cache: dict[str, str] = {}
    for name, rq in REGISTRY.items():
        f = inspect.getsourcefile(rq.fn)
        rel = os.path.relpath(f, repo_root) if f else ""
        if os.path.normpath(rel) in changed_paths:
            names.add(name)
            continue
        if f not in src_cache:
            with open(f) as fh:
                src_cache[f] = fh.read()
        if any(
            f"import {b}" in src_cache[f] or f".{b} import" in src_cache[f]
            for b in changed_basenames
        ):
            names.add(name)
    return names


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    if "--changed-since" in argv:
        i = argv.index("--changed-since")
        changed = changed_query_names(argv[i + 1])
        del argv[i : i + 2]
        only = changed if only is None else (only & changed)
        print(json.dumps({"changed_slice": sorted(only)}))
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else "CORRECTNESS_LOCAL.json"

    from pyspark.sql import SparkSession

    # Plain session on purpose: the external driver builds a conf-less
    # one, so engine tuning must happen inside the queries themselves.
    def fresh_session():
        # Force-clear the client-side singletons first: after a JVM
        # crash, plain getOrCreate() happily returns the DEAD session
        # (SparkContext._active_spark_context and the py4j gateway
        # survive on the Python side).
        from pyspark import SparkContext

        try:
            if SparkContext._active_spark_context is not None:
                SparkContext._active_spark_context.stop()
        except Exception:  # noqa: BLE001 — gateway already gone
            pass
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        s = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .appName("local_correctness")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_session()

    def jvm_dead(ex: Exception) -> bool:
        """A default-heap (1g) local JVM can die under 300+ queries of
        accumulated debris plus one heavy plan (r10: stats_kendall_tau
        at sf0.1 OOMed the sweep JVM at query ~208 and the remaining
        137 queries all recorded ConnectionRefusedError — bogus
        failures). Detect the death signature so the sweep restarts a
        fresh JVM and retries instead of cascading.

        Type-first classification (r11 ADVICE): a Py4JJavaError is an
        app-level Java exception — the gateway was alive enough to
        report it — so a genuine query failure whose Java traceback
        merely CONTAINS "Connection refused" (e.g. a JDBC target
        down) must NOT be misread as JVM death. Substring signatures
        apply only to the remaining wrapper types (pyspark re-raises
        gateway death through several of them)."""
        try:
            from py4j.protocol import Py4JJavaError, Py4JNetworkError
        except ImportError:  # pragma: no cover - py4j ships with pyspark
            Py4JJavaError = Py4JNetworkError = ()
        if isinstance(ex, (Py4JNetworkError, ConnectionRefusedError)):
            return True
        if isinstance(ex, Py4JJavaError):
            return False
        msg = f"{type(ex).__name__}: {ex}"
        return any(
            sig in msg
            for sig in (
                "ConnectionRefused",
                "Connection refused",
                "Answer from Java side is empty",
                "Py4JNetworkError",
                "Java gateway process exited",
            )
        )

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    if only is not None:
        qs = {n: f for n, f in qs.items() if n in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results, n_pass, n_rows_only, n_fail = {}, 0, 0, 0
    t0 = time.time()
    n_since_restart = 0
    for name, fn in qs.items():
        # Proactive JVM renewal: bound the debris a 1g default-heap
        # session accumulates over a 350-query sweep (see jvm_dead).
        if n_since_restart >= 120:
            spark = fresh_session()
            n_since_restart = 0
        n_since_restart += 1
        # Streaming queries are NOT skipped: the driver runs them
        # against their oracles, so the local gate must too (r2's
        # micros-vs-nanos event-time bug escaped through a skip here).
        try:
            try:
                spdf = fn(spark, sf_dir).toPandas()
            except Exception as ex:  # noqa: BLE001
                if not jvm_dead(ex):
                    raise
                # Dead JVM: restart once and retry this query fresh.
                # Log the swallowed exception first — if the death
                # classification was ever wrong, the original
                # traceback is the evidence (r11 ADVICE).
                print(
                    f"[{name}] JVM-death retry after "
                    f"{type(ex).__name__}: {ex}",
                    file=sys.stderr,
                )
                spark = fresh_session()
                n_since_restart = 1
                spdf = fn(spark, sf_dir).toPandas()
            if name not in osql:
                results[name] = {"status": "rows_only", "rows": len(spdf)}
                n_rows_only += 1
                continue
            ddf = con.execute(osql[name]).fetch_df()
            cols_ok = sorted(spdf.columns) == sorted(ddf.columns)
            cols = sorted(spdf.columns)
            values_ok = cols_ok and _norm(
                spdf[cols].itertuples(index=False, name=None)
            ) == _norm(ddf[cols].itertuples(index=False, name=None))
            status = "pass" if (cols_ok and values_ok) else "FAIL"
            results[name] = {
                "status": status,
                "rows": len(spdf),
                "oracle_rows": len(ddf),
                "schema_match": cols_ok,
                "values_match": values_ok,
            }
            n_pass += status == "pass"
            n_fail += status == "FAIL"
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"status": "FAIL", "error": f"{type(ex).__name__}: {ex}"[:300]}
            n_fail += 1

    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "wall_seconds": round(time.time() - t0, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in artifact.items() if k != "results"}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
