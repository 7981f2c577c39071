"""Streaming query inventory — Structured Streaming jobs whose
results are gated by the same batch oracles as their batch twins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.queries import query
from taps_spark.queries.events import SLIDING_ORACLE as _SLIDING_ORACLE
from taps_spark.queries.events import HYPERTABLE_ORACLE as _HYPERTABLE_ORACLE
from taps_spark.queries.events import TUMBLING_ORACLE
from taps_spark.streaming.jobs import stream_session_window_agg, stream_tumbling_agg

SESSION_WINDOW_ORACLE = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts)              AS session_start,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query("events_stream_tumbling", oracle=TUMBLING_ORACLE)
def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation (file-source
    micro-batch, watermark, AvailableNow trigger, memory sink) —
    checked against the SAME DuckDB oracle as the batch form
    (events_tumbling_window), proving batch/stream semantic parity.
    """
    return stream_tumbling_agg(spark, sf_dir, minutes=10)


@query("events_stream_session_window", oracle=SESSION_WINDOW_ORACLE)
def events_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window streaming aggregation (30-min gap, state
    merging). Oracle is the gaps-and-islands SQL with the half-open
    `diff >= gap` boundary session_window defines."""
    return stream_session_window_agg(spark, sf_dir, gap_minutes=30)


USER_STATS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("events_stream_stateful_user_stats", oracle=USER_STATS_ORACLE)
def events_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running stats in the state store; the single-batch final
    emission equals the batch aggregation, which is the oracle. See
    taps_spark/streaming/stateful.py for the 100 TB state layout."""
    from taps_spark.streaming.stateful import stream_user_stats

    return stream_user_stats(spark, sf_dir).orderBy("user_id")


STATE_TTL_TWIN_ORACLE = """
WITH e AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS day,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS q
  FROM events
),
days AS (
  SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS v
  FROM e GROUP BY user_id, day
),
g AS (
  SELECT *,
         CASE WHEN day - LAG(day) OVER (PARTITION BY user_id ORDER BY day) > 2
              THEN 1 ELSE 0 END AS brk
  FROM days
),
gen AS (
  SELECT *,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS generation
  FROM g
)
SELECT user_id,
       CAST(generation AS INT) AS generation,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(v) AS BIGINT) AS sum_value_micros,
       generation < MAX(generation) OVER (PARTITION BY user_id) AS expired
FROM gen
GROUP BY user_id, generation
ORDER BY user_id, generation
"""


@query("events_stream_state_ttl_twin", oracle=STATE_TTL_TWIN_ORACLE)
def events_stream_state_ttl_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL + timer-finalization semantics of the v2 arbitrary-state
    API, executed on the v1 applyInPandasWithState path across REAL
    micro-batches (events split 5 ways, one file per trigger): per-user
    state generations expire on a >2-day event-time gap, `expired`
    marking the generations a v2 timer callback would have emitted at
    expiry. Gated by a gaps-and-islands batch oracle — exact integer
    micros folds end to end. See
    taps_spark/streaming/stateful.py:stream_state_ttl_twin."""
    from taps_spark.streaming.stateful import stream_state_ttl_twin

    return stream_state_ttl_twin(spark, sf_dir)


STREAM_JOIN_ORACLE = """
SELECT v.event_id AS view_event_id,
       c.event_id AS click_event_id,
       v.user_id,
       CAST((epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS delay_s
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 60 MINUTE
ORDER BY view_event_id, click_event_id
"""


# Spark 4 v2 arbitrary-state twin (transformWithStateInPandas) of the
# stateful query above. pyspark serializes v2 state metadata over
# protobuf, so the query registers ONLY where google.protobuf imports —
# this container lacks it (installs are off-limits), so here the entry
# lands in skipped_queries() with the reason, and self-activates
# unchanged the moment the environment gains protobuf.
try:
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

if _HAS_PROTOBUF:

    @query("events_stream_stateful_user_stats_v2", oracle=USER_STATS_ORACLE)
    def events_stream_stateful_user_stats_v2(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """transformWithStateInPandas (Spark 4 arbitrary-state v2 API):
        same per-user running stats as the applyInPandasWithState twin,
        held as typed ValueState in the RocksDB-backed store — gated by
        the same batch-aggregation oracle. See
        taps_spark/streaming/stateful.py:57 for the state layout."""
        from taps_spark.streaming.stateful import stream_user_stats_v2

        return stream_user_stats_v2(spark, sf_dir).orderBy("user_id")

else:
    from taps_spark.queries import register_skip

    register_skip(
        "events_stream_stateful_user_stats_v2",
        "transformWithStateInPandas needs google.protobuf (pyspark v2-state "
        "serialization), absent in this container; implementation at "
        "taps_spark/streaming/stateful.py:57 is tested via "
        "tests/test_streaming_semantics.py (importorskip) and registers "
        "automatically where protobuf is importable",
    )


@query("events_stream_stream_join", oracle=STREAM_JOIN_ORACLE)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (view→click attribution within 60
    minutes per user) with watermark-bounded state — checked against
    the equivalent batch interval-join SQL. See
    streaming/jobs.stream_stream_interval_join for the state-eviction
    story."""
    from taps_spark.streaming.jobs import stream_stream_interval_join

    return stream_stream_interval_join(spark, sf_dir, minutes=60).orderBy(
        "view_event_id", "click_event_id"
    )


@query("events_stream_foreach_batch", oracle=TUMBLING_ORACLE)
def events_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → idempotent keyed parquet append, run twice to
    prove replay safety (second pass appends 0 rows); the sink read
    back must equal the batch tumbling oracle. The streaming version
    of the reference's duplicate-PK repair made unnecessary
    (SURVEY §2a-18)."""
    from taps_spark.streaming.jobs import stream_foreach_batch_idempotent

    return stream_foreach_batch_idempotent(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )


@query("events_stream_sliding", oracle=_SLIDING_ORACLE)
def events_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation (15-min windows every
    5 min) — same map-side window expansion as the batch twin, gated
    by the same oracle."""
    from taps_spark.streaming.jobs import stream_sliding_agg

    return stream_sliding_agg(spark, sf_dir, 15, 5)


DEDUP_STREAM_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_stream_dedup", oracle=DEDUP_STREAM_ORACLE)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state: the stream unioned
    with itself (simulated at-least-once duplication) collapses back
    to exactly the batch per-type totals via
    dropDuplicatesWithinWatermark — state evicted at the watermark
    horizon, unlike dropDuplicates whose state grows forever. Oracle
    is the plain batch aggregate over the ORIGINAL (unduplicated)
    table: dedup must be exactly lossless."""
    from taps_spark.streaming.jobs import stream_dedup_within_watermark

    return stream_dedup_within_watermark(spark, sf_dir).orderBy("event_type")


@query("events_stream_continuous_rollup", oracle=_HYPERTABLE_ORACLE)
def events_stream_continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming continuous-aggregate maintenance: the stream
    merge-upserts hourly partials by key per micro-batch (run twice —
    replay must be a no-op), and daily finalizes from the
    materialized partials. Gated by the SAME oracle as the batch
    `events_hypertable_rollup`: incremental maintenance must be
    indistinguishable from recomputation."""
    from taps_spark.streaming.jobs import stream_continuous_rollup

    return stream_continuous_rollup(spark, sf_dir).orderBy("day", "event_type")


STATIC_ENRICH_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("events_stream_static_enrich", oracle=STATIC_ENRICH_ORACLE)
def events_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static broadcast join (per-micro-batch dimension
    enrichment, no join state) + downstream aggregate — the remaining
    streaming join shape next to stream-stream. Oracle is the batch
    join-aggregate over the same tables."""
    from taps_spark.streaming.jobs import stream_static_enrich

    return stream_static_enrich(spark, sf_dir)


STREAM_OUTER_JOIN_ORACLE = """
WITH v AS (
  SELECT event_id AS view_event_id, user_id, ts AS v_ts
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT event_id AS click_event_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
m AS (
  -- Spark's global watermark is the MIN across the two inputs'
  -- (max event time - delay): both sides gate outer emission.
  SELECT LEAST((SELECT MAX(v_ts) FROM v), (SELECT MAX(c_ts) FROM c)) AS mx
),
matched AS (
  SELECT v.view_event_id, c.click_event_id, v.user_id,
         CAST((epoch_us(c.c_ts) - epoch_us(v.v_ts)) // 1000000 AS BIGINT) AS delay_s
  FROM v JOIN c
    ON v.user_id = c.user_id
   AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 60 MINUTE
),
expired_unmatched AS (
  SELECT v.view_event_id, CAST(NULL AS BIGINT) AS click_event_id, v.user_id,
         CAST(NULL AS BIGINT) AS delay_s
  FROM v CROSS JOIN m
  WHERE NOT EXISTS (
          SELECT 1 FROM c
          WHERE c.user_id = v.user_id
            AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 60 MINUTE)
    AND v.v_ts + INTERVAL 60 MINUTE < m.mx - INTERVAL 2 HOUR
)
SELECT * FROM matched
UNION ALL
SELECT * FROM expired_unmatched
ORDER BY view_event_id, click_event_id
"""


@query("events_stream_outer_join", oracle=STREAM_OUTER_JOIN_ORACLE)
def events_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the delicate half of
    the streaming join family: matched (view, click) pairs emit
    immediately, while a view with no click emits its NULL row only
    when the watermark proves no future click can match (its 60-min
    join window has fallen behind the final GLOBAL watermark — which
    is the MIN over both inputs of max-event-time − the 2-hour
    delay, a multi-input subtlety sf0.001 exposed: the click stream's
    slower max held a view back). The oracle encodes that emission
    rule exactly: unmatched views emit iff
    v_ts + 60 min < least(max(v_ts), max(c_ts)) − 2 h — so this
    query pins Spark's outer state-eviction semantics against
    independent SQL, not just row plumbing.

    Scale: state per side is bounded by the watermark horizon exactly
    as the inner form (events_stream_stream_join); the outer rows add
    no state — they're emitted from evicted left state.
    """
    from taps_spark.streaming.jobs import read_events_stream, run_to_memory

    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user_id = c_user_id AND c_ts >= v_ts "
            "AND c_ts <= v_ts + INTERVAL 60 MINUTES"
        ),
        "left_outer",
    ).select(
        "view_event_id",
        "click_event_id",
        F.col("v_user_id").alias("user_id"),
        ((F.unix_micros("c_ts") - F.unix_micros("v_ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("delay_s"),
    )
    return run_to_memory(joined, "append").orderBy("view_event_id", "click_event_id")


STREAM_EXPECTATIONS_ORACLE = """
WITH m AS (
  -- RAW metrics; ROUND is display-only (see operators/expectations.py)
  SELECT
    CAST(AVG(CASE WHEN user_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS completeness_user_id,
    CAST(AVG(CASE WHEN event_type IN ('click','error','purchase','signup','view')
                  THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS domain_event_type,
    CAST(MAX(value) AS DOUBLE) AS max_value,
    CAST(AVG(CASE WHEN value >= 0 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS nonneg_value
  FROM events
)
SELECT 'completeness_user_id' AS check_name, ROUND(completeness_user_id, 6) AS metric,
       1.0 AS threshold, '>=' AS op, completeness_user_id >= 1.0 AS passed FROM m
UNION ALL
SELECT 'domain_event_type', ROUND(domain_event_type, 6), 1.0, '>=',
       domain_event_type >= 1.0 FROM m
UNION ALL
SELECT 'max_value', ROUND(max_value, 6), 1000.0, '<=', max_value <= 1000.0 FROM m
UNION ALL
SELECT 'nonneg_value', ROUND(nonneg_value, 6), 1.0, '>=', nonneg_value >= 1.0 FROM m
ORDER BY check_name
"""


@query("events_stream_expectations", oracle=STREAM_EXPECTATIONS_ORACLE)
def events_stream_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-on-streams: the constraint metrics accumulate as ONE
    stateful streaming aggregation (mergeable across micro-batches by
    construction), and the batch oracle gates the streaming verdict —
    stream state merge must equal a from-scratch batch pass."""
    from taps_spark.streaming.jobs import stream_expectations

    return stream_expectations(spark, sf_dir)


SESSION_DYNAMIC_GAP_ORACLE = """
WITH ends AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) + CASE WHEN event_type = 'error'
                             THEN 600000000 ELSE 1800000000 END AS ev_end,
         MAX(epoch_us(ts) + CASE WHEN event_type = 'error'
                                 THEN 600000000 ELSE 1800000000 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sess_end
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN sess_end IS NULL OR epoch_us(ts) >= sess_end
              THEN 1 ELSE 0 END AS new_s
  FROM ends
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts)              AS session_start,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query("events_stream_session_dynamic_gap", oracle=SESSION_DYNAMIC_GAP_ORACLE)
def events_stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap streaming sessionization (per-row timeout via the
    expression form of F.session_window); the oracle reproduces the
    interval-union merge with a running-max island detection — state
    merge across micro-batches must equal the batch interval union."""
    from taps_spark.streaming.jobs import stream_session_dynamic_gap

    return stream_session_dynamic_gap(spark, sf_dir).orderBy(
        "user_id", "session_start"
    )


HOURLY_TOPK_ORACLE = """
WITH counts AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour_start,
         event_type,
         COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT hour_start, event_type, n_events, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_start
                               ORDER BY n_events DESC, event_type) AS rank
  FROM counts
)
WHERE rank <= 3
ORDER BY hour_start, rank
"""


@query("events_stream_hourly_topk", oracle=HOURLY_TOPK_ORACLE)
def events_stream_hourly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k leaderboard: the stream maintains hourly
    per-type counts (watermarked tumbling windows — additive,
    merge-safe state); ranking happens on the materialized sink,
    because a rank is not incrementally maintainable under append
    semantics. Integer counts + lexicographic tiebreak make the
    result exactly oracle-checkable against the batch SQL."""
    from taps_spark.streaming.jobs import stream_hourly_topk

    return stream_hourly_topk(spark, sf_dir, k=3)


BASELINE_ALERT_ORACLE = """
WITH nd AS (
  SELECT CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days
  FROM events
),
baseline AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS tot
  FROM events GROUP BY 1, 2
),
hourly AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
           AS window_start,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2, 3
)
SELECT h.window_start, h.event_type, h.n_events,
       (b.tot * 1000) // nd.n_days AS expected_milli,
       (h.n_events * nd.n_days * 1000000) // b.tot AS ratio_ppm
FROM hourly h
JOIN baseline b ON b.event_type = h.event_type AND b.hod = h.hod
CROSS JOIN nd
WHERE 10 * h.n_events * nd.n_days > 13 * b.tot
ORDER BY h.window_start, h.event_type
"""


@query("events_stream_baseline_alert", oracle=BASELINE_ALERT_ORACLE)
def events_stream_baseline_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly anomaly alerts against a batch-trained
    (event_type, hour-of-day) baseline — the train-offline /
    score-online alerting topology: static baseline broadcast-joined
    into the stream BEFORE the windowed aggregation (the
    restriction-free stream-static shape), alert = window >30% above
    its slot's expectation, all-integer predicate so the batch DuckDB
    oracle gates the streaming path bit-for-bit.
    """
    from taps_spark.streaming.jobs import stream_baseline_anomaly_alert

    return stream_baseline_anomaly_alert(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )
