"""taps_spark — a PySpark-native analytics & transfer engine.

A from-scratch engine with the data-movement capabilities of
ricardochimal/taps (reference surveyed in /root/repo/SURVEY.md) plus a
full relational query core and LLM-data-pipeline operators (dedup,
similarity search, text analysis, event analytics, multimodal
plumbing), all expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, shuffle-conscious partitioning, broadcast-aware joins, and
Arrow-batched Pandas UDFs only where built-ins cannot express the
semantics.

Layout:
    session     — SparkSession construction/tuning helpers
    errors      — error taxonomy (parity: reference lib/taps/errors.rb)
    catalog     — table discovery, counts, name filters
    io          — sources (parquet/csv/json/jdbc scan planning), sinks
    transfer    — pull/push-style whole-dataset transfer jobs:
                  schema → data → verify, resume manifest, chunk planning
    operators   — relational wrappers + dedup/similarity/text/events
    streaming   — Structured Streaming jobs over the events table
    queries     — the registry that __spark_entry__.py exposes
"""

from taps_spark.version import __version__

__all__ = ["__version__"]
