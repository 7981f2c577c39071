"""Source↔sink checksum verification job.

Reference parity (#16): taps CRC32s every chunk in flight
(lib/taps/utils.rb:25-31, lib/taps/data_stream.rb:188-200) and
retries on CorruptedData (lib/taps/operation.rb:313-317). Inside
Spark the transport is already checksummed, so verification moves to
the endpoints: compute an order-insensitive digest of the source and
the sink and compare. One scan each side, no data movement between
them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from taps_spark.errors import CorruptedData
from taps_spark.io.sinks import checksum_frame


@dataclass(frozen=True)
class ChecksumReport:
    n_rows: tuple[int, int]
    xor_hash: tuple[int, int]
    sum_hash: tuple[int, int]

    @property
    def ok(self) -> bool:
        return (
            self.n_rows[0] == self.n_rows[1]
            and self.xor_hash[0] == self.xor_hash[1]
            and self.sum_hash[0] == self.sum_hash[1]
        )


def compare(source: DataFrame, sink: DataFrame, columns: list[str] | None = None) -> ChecksumReport:
    """Digest both sides over a common column set (sorted for
    determinism) and compare."""
    cols = columns or sorted(set(source.columns) & set(sink.columns))
    s = checksum_frame(source.select(*cols), cols).collect()[0]
    t = checksum_frame(sink.select(*cols), cols).collect()[0]
    return ChecksumReport(
        n_rows=(s["n_rows"], t["n_rows"]),
        xor_hash=(s["xor_hash"], t["xor_hash"]),
        sum_hash=(int(s["sum_hash"] or 0), int(t["sum_hash"] or 0)),
    )


def verify_or_raise(source: DataFrame, sink: DataFrame, table: str = "?") -> ChecksumReport:
    report = compare(source, sink)
    if not report.ok:
        raise CorruptedData(
            f"checksum mismatch for {table}: rows {report.n_rows}, "
            f"xor {report.xor_hash}, sum {report.sum_hash}"
        )
    return report
