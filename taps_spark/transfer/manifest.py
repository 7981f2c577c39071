"""Resume manifest: per-table transfer progress that survives crashes.

Reference parity (#17): taps serializes whole-operation state to
`op_YYYYmmddHHMM.dat` on SIGINT/error and `--resume` reconstructs the
operation, skipping completed tables (lib/taps/operation.rb:69-123,
lib/taps/cli.rb:175-193). The Spark engine keeps the same semantics
with a JSON manifest of completed tables + per-table row counts and
checksums; idempotent sinks (io/sinks.append_idempotent) make the
"partially transferred table" case safe to simply re-run, so the
reference's mid-table cursor state (offset/last-pk) is unnecessary.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any


@dataclass
class TransferManifest:
    path: str
    completed: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "TransferManifest":
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            return cls(path=path, completed=data.get("completed", {}))
        return cls(path=path)

    def is_complete(self, table: str) -> bool:
        return table in self.completed

    def mark_complete(self, table: str, **info: Any) -> None:
        self.completed[table] = info
        self._flush()

    def _flush(self) -> None:
        """Atomic write (tmp + rename) — a crash mid-flush must never
        corrupt the manifest the next resume depends on."""
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest_")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"completed": self.completed}, f, indent=2, default=str)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
