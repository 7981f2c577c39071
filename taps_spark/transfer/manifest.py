"""Resume manifest: per-table transfer progress that survives crashes.

Reference parity (#17): taps serializes whole-operation state to
`op_YYYYmmddHHMM.dat` on SIGINT/error and `--resume` reconstructs the
operation, skipping completed tables (lib/taps/operation.rb:69-123,
lib/taps/cli.rb:175-193). The Spark engine keeps the same semantics
with a JSON manifest of completed tables + per-table row counts and
checksums. Mid-table state (the reference's offset/last-pk cursor,
lib/taps/data_stream.rb:15-25) is a per-table PK high-watermark:
chunked transfers record the last fully-written pk after every chunk,
and a resumed run reads only `pk > watermark` — pushed down to the
source scan — instead of re-reading from row 0. Idempotent sinks
(io/sinks.append_idempotent) keep even a mid-chunk crash safe.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from dataclasses import dataclass, field
from typing import Any


@dataclass
class TransferManifest:
    path: str
    completed: dict[str, dict[str, Any]] = field(default_factory=dict)
    watermarks: dict[str, int] = field(default_factory=dict)
    # Concurrent table transfers (TransferOperation.parallelism > 1)
    # mutate and flush from worker threads; one lock serializes both.
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False, compare=False)

    @classmethod
    def load(cls, path: str) -> "TransferManifest":
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            return cls(
                path=path,
                completed=data.get("completed", {}),
                watermarks={k: int(v) for k, v in data.get("watermarks", {}).items()},
            )
        return cls(path=path)

    def is_complete(self, table: str) -> bool:
        return table in self.completed

    def mark_complete(self, table: str, **info: Any) -> None:
        with self._lock:
            self.completed[table] = info
            # A completed table needs no cursor; drop it so a re-run
            # that forces re-transfer starts clean.
            self.watermarks.pop(table, None)
            self._flush()

    def watermark(self, table: str) -> int | None:
        """Last pk value fully written for an in-flight table, or
        None (reference cursor state, lib/taps/data_stream.rb:15-25)."""
        return self.watermarks.get(table)

    def set_watermark(self, table: str, pk_value: int) -> None:
        with self._lock:
            self.watermarks[table] = int(pk_value)
            self._flush()

    def _flush(self) -> None:
        """Atomic write (tmp + rename) — a crash mid-flush must never
        corrupt the manifest the next resume depends on."""
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest_")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"completed": self.completed, "watermarks": self.watermarks},
                    f,
                    indent=2,
                    default=str,
                )
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
