"""Event-analytics query inventory (SURVEY.md §2c) over the events
fixture — batch forms whose semantics match the streaming module's
(taps_spark/streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.operators.events import (
    session_stats,
    sliding_window_agg,
    tumbling_window_agg,
)
from taps_spark.queries import query

TUMBLING_ORACLE = """
SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("events_tumbling_window", oracle=TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event type.

    Uses F.window — identical epoch-aligned bucketing to Structured
    Streaming, so this batch query is also the oracle for the
    streaming variant (events_stream_tumbling).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return tumbling_window_agg(ev, minutes=10).orderBy("window_start", "event_type")


SLIDING_ORACLE = """
SELECT make_timestamp((epoch_us(ts) // 300000000 - j) * 300000000) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
CROSS JOIN (SELECT unnest(range(3)) AS j) ks
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("events_sliding_window", oracle=SLIDING_ORACLE)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute windows sliding every 5 minutes: each event expands
    into width/slide = 3 windows map-side (F.window), no self-join.
    The oracle reproduces the expansion with a 3-row cross join."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return sliding_window_agg(ev, width_minutes=15, slide_minutes=5).orderBy(
        "window_start", "event_type"
    )


SESSION_ORACLE = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       MIN(ts)              AS session_start,
       MAX(ts)              AS session_end,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@query("events_sessionize", oracle=SESSION_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap
    (gaps-and-islands: lag + cumulative flag sum — one shuffle on
    user_id, linear per user; microsecond-exact gap arithmetic).
    Matches Structured Streaming's session_window semantics for the
    same gap (streaming variant in taps_spark/streaming)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return session_stats(ev, gap_minutes=30).orderBy("user_id", "session_id")


TOP_USERS_ORACLE = """
SELECT user_id, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY user_id, event_type
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id) <= 3
ORDER BY event_type, n_events DESC, user_id
"""


@query("events_top_users_per_type", oracle=TOP_USERS_ORACLE)
def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per event type (grouped agg feeding a
    window top-k — the classic leaderboard shape)."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc(), "user_id")
    return (
        per_user.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("event_type", F.col("n_events").desc(), "user_id")
    )
