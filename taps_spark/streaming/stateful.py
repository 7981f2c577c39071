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
    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(stats, "update")


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
    return run_to_memory(stats, "update")
