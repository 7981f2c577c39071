"""Generate TOUCHED_QUERIES.json — the rotation's touched-since-seal
tier (r12 VERDICT task #2).

The driver correctness gate samples ~50 of ~380 registered queries per
round; after the r12 rotation change, failed and zero-evidence queries
gate first. This artifact adds the third tier: queries whose
implementing files changed since the previous seal, so every query an
optimization round touches gets a fresh driver oracle row in the SAME
round. Generated at seal time (git is available here; the driver
environment only reads the committed JSON):

    python tools/touched_queries.py <previous-seal-ref>

The name resolution errs toward inclusion (an operators/ edit re-gates
every query importing that module) — see
local_correctness.changed_query_names, which this reuses.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_correctness import changed_query_names  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/touched_queries.py <git-ref> [out.json]")
        return 2
    ref = sys.argv[1]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(here, "TOUCHED_QUERIES.json")
    )
    names = sorted(changed_query_names(ref))
    with open(out_path, "w") as f:
        json.dump({"since": ref, "queries": names}, f, indent=1)
        f.write("\n")
    print(json.dumps({"since": ref, "n_touched": len(names), "out": out_path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
