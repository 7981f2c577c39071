"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> q1,q2,...
Writes plans/<tag>/<query>_<suffix>.txt for each query (the
optimization-round evidence files: suffix = before|after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from taps_spark.queries import all_queries
    from taps_spark.session import get_spark

    spark = get_spark("taps_spark_plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = qe.explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
