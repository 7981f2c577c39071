"""VERDICT r12 task #9 — re-profile the sf0.1 inverse scalers on a 10×
fixture (tools/make_scale_fixture.py output) at 32 vs 8 cores.

At sf0.1 the whole suite ran FASTER at 8 cores on the driver box, so
core-ratios ≈1 there mean "tiny tasks", not "serial operator". This
instrument decides which is which: per query, fresh subprocess
sessions at local[32] and local[8] (shuffle partitions = cores, the
bench's own sizing law), interleaved 32/8/32/8 so box throttling lands
evenly, min-of-2 per side. ratio = min8 / min32 (>1 ⇒ cores help).

Usage: python tools/scale9_r13.py [sf_dir] [out.json] [q1,q2,...]
Worker:  python tools/scale9_r13.py --worker <sf_dir> <cores> <query>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "pipeline_corpus_prep",
    "dedup_canonical_pick",
    "text_bm25_search",
    "events_hypertable_rollup",
    "similarity_ann_ivf",
    "stats_kendall_tau",
]


def worker(sf_dir: str, cores: int, name: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"scale9_{name}_{cores}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from taps_spark.queries import all_queries

    fn = all_queries()[name]
    fn(spark, sf_dir).count()  # warm (JVM+codegen), not timed
    t0 = time.monotonic()
    n = fn(spark, sf_dir).count()
    print(f"RESULT {time.monotonic() - t0:.3f} {n}", flush=True)
    spark.stop()
    return 0


def main() -> int:
    if sys.argv[1:2] == ["--worker"]:
        return worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale9_r13.json"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_QUERIES

    results: dict = {}
    for name in names:
        times: dict = {32: [], 8: []}
        for rep in range(2):
            for cores in (32, 8):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     sf_dir, str(cores), name],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
                if not line:
                    print(f"{name} c{cores} rep{rep} FAILED:\n{p.stderr[-2000:]}")
                    times[cores].append(None)
                    continue
                dt = float(line[0].split()[1])
                times[cores].append(dt)
                print(f"{name:28s} c{cores:2d} rep{rep} {dt:8.2f}s", flush=True)
        ok32 = [t for t in times[32] if t is not None]
        ok8 = [t for t in times[8] if t is not None]
        entry = {
            "t32": ok32, "t8": ok8,
            "min32": min(ok32) if ok32 else None,
            "min8": min(ok8) if ok8 else None,
        }
        if ok32 and ok8:
            entry["ratio_8_over_32"] = round(min(ok8) / min(ok32), 3)
        results[name] = entry
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
