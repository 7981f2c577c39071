"""Error taxonomy.

Parity: the reference defines BaseError / NotImplemented /
DuplicatePrimaryKeyError / CorruptedData / InvalidData and rethrows
them across the HTTP boundary (lib/taps/errors.rb:1-15,
lib/taps/server.rb:18-38). Here they are plain Python exceptions; the
"cross-process rethrow" machinery dissolves because the engine is one
logical process (driver) — executor errors surface through Spark's own
task-failure propagation.
"""

from __future__ import annotations


class TapsSparkError(Exception):
    """Base error for the engine (reference: Taps::BaseError)."""

    def __init__(self, message: str = "", *, original: Exception | None = None):
        super().__init__(message)
        self.original = original


class NotImplementedFeature(TapsSparkError):
    """A declared-but-unavailable feature (reference: Taps::NotImplemented)."""


class DuplicatePrimaryKeyError(TapsSparkError):
    """Sink detected rows whose primary key already exists at the target
    (reference: Taps::DuplicatePrimaryKeyError). The Spark-native
    answer is idempotent append (anti-join / MERGE) rather than a
    repair protocol — see taps_spark.io.sinks.append_idempotent.
    """


class CorruptedData(TapsSparkError):
    """Checksum mismatch between source and sink
    (reference: Taps::CorruptedData)."""


class InvalidData(TapsSparkError):
    """Data violates declared schema constraints — varchar overflow,
    integer out of range (reference: Taps::InvalidData raised at
    lib/taps/utils.rb:59-68 and lib/taps/data_stream.rb:206-213)."""
