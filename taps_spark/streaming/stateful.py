"""Custom stateful streaming operator: applyInPandasWithState.

The engine's extension point for operators Structured Streaming's
built-ins can't express (per-key accumulators with custom merge/
timeout logic). Demonstrated with a per-user running-stats operator
whose single-batch output is SQL-checkable (the batch oracle computes
the same totals), so the harness gates even the stateful path.

Scale: state lives in the state store partitioned by user key — one
shuffle on the key per micro-batch; Arrow-batched pandas per group,
never a whole-partition collect.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from taps_spark.streaming.jobs import read_events_stream, run_to_memory

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": round(total, 2)}]
    )


def stream_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event count + value total maintained as custom
    streaming state; with the fixture's single AvailableNow batch the
    emitted rows are the final totals (== the batch aggregation)."""
    from taps_spark.streaming.jobs import STREAM_PYTHON_STATE_PARTITIONS

    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(
        stats, "update", state_partitions=STREAM_PYTHON_STATE_PARTITIONS
    )


def stream_user_stats_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-user accumulator on the NEW arbitrary-state API
    (transformWithStateInPandas, Spark 4): typed ValueState in the
    RocksDB-backed store instead of a single tuple, explicit
    processor lifecycle (init/handleInputRows/close).

    Scale story identical to applyInPandasWithState (state
    hash-partitioned by key, Arrow batches per group), but the v2 API
    adds independently-evolvable named state variables, state TTL,
    and timers — the surface production stateful pipelines need.

    Registered CONDITIONALLY as `events_stream_stateful_user_stats_v2`
    (taps_spark/queries/streaming.py): the v2 API serializes state
    metadata over protobuf, so the registry entry activates only where
    `google.protobuf` imports; in this container (no protobuf, installs
    off-limits) the name appears in queries.skipped_queries() with the
    reason instead, and tests/test_streaming_semantics.py importorskips.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("acc", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "sum_value": round(total, 2)}]
            )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    stats = ev.groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    # Per-group Python-state stream: sized like the other
    # applyInPandasWithState operators (cost gradient is Python group
    # calls, the opposite of the JVM-stateful default — jobs.py law;
    # r12 ADVICE consistency fix, untestable in this container where
    # protobuf is absent and the query is skip-registered).
    from taps_spark.streaming.jobs import STREAM_PYTHON_STATE_PARTITIONS

    return run_to_memory(
        stats, "update", state_partitions=STREAM_PYTHON_STATE_PARTITIONS
    )


# ---------------------------------------------------------------------------
# v2-state semantics twin: TTL + timer-style finalization on the v1 API.
# ---------------------------------------------------------------------------

TTL_TWIN_OUTPUT_SCHEMA = (
    "user_id bigint, generation int, n_events bigint, "
    "sum_value_micros bigint, expired boolean, seq int"
)
TTL_TWIN_STATE_SCHEMA = "days array<int>, ns array<bigint>, vs array<bigint>, seq int"

#: state generations split when a user's active-day gap exceeds this —
#: the event-time TTL clock of the twin (see stream_state_ttl_twin).
TTL_DAYS = 2

_TWIN_SRC_DIRS: dict[tuple[str, str], str] = {}

#: Every mkdtemp split dir ever created, removed at interpreter exit —
#: the memo itself only deletes dirs it evicts (stale applicationId).
_TWIN_DIR_CLEANUP: set[str] = set()


def _cleanup_twin_dirs() -> None:
    import shutil

    for d in _TWIN_DIR_CLEANUP:
        shutil.rmtree(d, ignore_errors=True)


import atexit as _atexit

_atexit.register(_cleanup_twin_dirs)


def _ttl_twin_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user day-bucketed accumulator with event-time TTL semantics.

    State = the pending per-day aggregates (day, n, sum-of-micros
    quanta) plus a per-key batch sequence — exactly what a v2
    (transformWithStateInPandas) processor keeps as ValueState-with-TTL
    plus registered timers: each day bucket is a pending aggregate
    whose 'timer' fires when a later day arrives more than TTL_DAYS
    past it, closing the generation. Emission recomputes the
    generation breakdown from state every batch (update mode); the
    final per-key emission (max seq) is the complete answer, which
    makes the output independent of micro-batch arrival ORDER — the
    property that lets a deterministic batch oracle gate a
    multi-micro-batch stateful stream."""
    days, ns, vs, seq = state.get if state.exists else ([], [], [], 0)
    acc = {int(d): (int(n), int(v)) for d, n, v in zip(days, ns, vs)}
    for pdf in pdfs:
        # A group's batch slice is a handful of rows (events/users/
        # n_files ≈ 13 at sf0.1), but this function runs once per
        # (user × micro-batch) — 7,500 calls at sf0.1 — so per-call
        # pandas machinery IS the operator's cost. A plain zip loop
        # over the two columns replaces pdf.groupby + per-day
        # fillna/astype/sum chains (~4 pandas object constructions
        # per day bucket) with dict arithmetic (guide §4.2 inverted:
        # when frames are this small, the vectorization fixed cost
        # exceeds the loop it saves).
        for d, q in zip(
            pdf["day"].astype("int64").to_numpy().tolist(),
            pdf["q"].fillna(0).astype("int64").to_numpy().tolist(),
        ):
            n0, v0 = acc.get(d, (0, 0))
            acc[d] = (n0 + 1, v0 + q)
    seq += 1
    days = sorted(acc)
    state.update(
        (days, [acc[d][0] for d in days], [acc[d][1] for d in days], seq)
    )
    gens: list[tuple[int, int, int]] = []
    gen = g_n = g_v = 0
    prev = None
    for d in days:
        if prev is not None and d - prev > TTL_DAYS:
            gens.append((gen, g_n, g_v))
            gen, g_n, g_v = gen + 1, 0, 0
        g_n += acc[d][0]
        g_v += acc[d][1]
        prev = d
    gens.append((gen, g_n, g_v))
    last = gens[-1][0]
    # dict-of-columns beats one dict per row: pandas builds each
    # column in one shot instead of inferring per-row (same 7,500
    # calls/sf0.1 argument as the accumulator loop above).
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(gens),
            "generation": [g for g, _, _ in gens],
            "n_events": [n for _, n, _ in gens],
            "sum_value_micros": [v for _, _, v in gens],
            "expired": [g < last for g, _, _ in gens],
            "seq": [seq] * len(gens),
        }
    )


def stream_state_ttl_twin(
    spark: SparkSession, sf_dir: str, n_files: int = 5
) -> DataFrame:
    """Executable semantics twin of v2 arbitrary state's TTL/timer
    surface on the v1 `applyInPandasWithState` path (VERDICT r7 task
    #3: `transformWithStateInPandas` itself stays protobuf-blocked in
    this container, so the TTL/timer SEMANTICS get running, driver-
    gateable evidence here, and the guarded v2 registration stays for
    when the env unblocks).

    The events fixture is split into `n_files` round-robin files and
    streamed ONE FILE PER MICRO-BATCH (real cross-batch state carry:
    every user's buckets accumulate across ~n_files batches), through
    a per-user processor whose state generations expire on a
    >TTL_DAYS event-time gap — v2's ValueState TTL with the fixture's
    event time as the clock, the deterministic choice (a wall-clock
    TTL could never be oracle-checked). `expired` marks generations
    closed by the TTL — the rows a v2 timer callback would have
    emitted at expiry.

    Scale: state is per-user day-aggregates (bounded by the TTL
    horizon in production, where expired generations are emitted and
    dropped), hash-partitioned by user in the state store; one
    shuffle per micro-batch; Arrow-batched per group.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from taps_spark.io.tables import load_table

    import os

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if cache_key not in _TWIN_SRC_DIRS:
        import shutil
        import tempfile

        # Evict (and delete on disk) split dirs from any OTHER
        # applicationId: a stopped context never reads them again, and
        # un-evicted mkdtemp dirs leak per session (r8 ADVICE).
        for k in [k for k in _TWIN_SRC_DIRS if k[0] != cache_key[0]]:
            shutil.rmtree(_TWIN_SRC_DIRS.pop(k), ignore_errors=True)
        d = tempfile.mkdtemp(prefix="taps_ttl_twin_")
        _TWIN_DIR_CLEANUP.add(d)
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "day"
            ),
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("q"),
            (F.col("event_id") % n_files).alias("_b"),
        )
        ev.repartition(n_files, "_b").drop("_b").write.mode("overwrite").parquet(d)
        _TWIN_SRC_DIRS[cache_key] = d
    src = _TWIN_SRC_DIRS[cache_key]

    raw = (
        spark.readStream.schema("user_id bigint, day int, q bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    updates = raw.groupBy("user_id").applyInPandasWithState(
        _ttl_twin_update,
        outputStructType=TTL_TWIN_OUTPUT_SCHEMA,
        stateStructType=TTL_TWIN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from taps_spark.streaming.jobs import STREAM_PYTHON_STATE_PARTITIONS

    tbl = run_to_memory(
        updates, "update", state_partitions=STREAM_PYTHON_STATE_PARTITIONS
    )
    w = Window.partitionBy("user_id")
    return (
        tbl.withColumn("_m", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("_m"))
        .select(
            "user_id", "generation", "n_events", "sum_value_micros", "expired"
        )
        .orderBy("user_id", "generation")
    )
