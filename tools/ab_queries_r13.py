"""Fixed-commit interleaved A/B of whole registered queries across two
checkouts (r13 adjudication instrument, extending the r10 protocol and
tools/ab_kendall_r13.py to arbitrary queries).

Two resident worker processes — one per checkout — each hold a warm
SparkSession (local[16], shuffle 16, UI off) and execute one named
query per request (full execution via df.count(), no display collect).
The parent strictly serializes execution and alternates which side
goes first every rep, so CPU-credit throttling and page-cache warmth
land evenly on both sides. Medians AND mins are reported per
(side, query); on this box only same-session interleaved medians/mins
are credible evidence (BASELINE.md, round-12 throttling writeup).

Usage:
  python tools/ab_queries_r13.py --b-root /tmp/wt_r12seal \
      --queries q1,q2 --reps 6 [--sf-dir /root/testdata/sf0.1] [--out f.json]
Worker mode (internal): python tools/ab_queries_r13.py --worker <root>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def worker(root: str) -> int:
    sys.path.insert(0, root)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"ab_worker_{os.path.basename(root)}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from taps_spark.queries import all_queries

    qs = all_queries()
    print("READY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "QUIT":
            break
        t0 = time.monotonic()
        n = qs[name](spark, SF_DIR).count()
        print(f"DONE {time.monotonic() - t0:.3f} {n}", flush=True)
    spark.stop()
    return 0


def start(root: str) -> subprocess.Popen:
    env = dict(os.environ)
    # Each worker must import taps_spark from ITS checkout only.
    env["PYTHONPATH"] = root
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", root],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=root,
        env=env,
    )
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError(f"worker {root} died during startup")
        if line.strip() == "READY":
            return p


def run_one(p: subprocess.Popen, name: str) -> float:
    p.stdin.write(name + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError(f"worker died on {name}")
        if line.startswith("DONE "):
            return float(line.split()[1])


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        return worker(argv[1])

    def opt(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            return argv[i + 1]
        return default

    b_root = opt("--b-root")
    names = opt("--queries").split(",")
    reps = int(opt("--reps", "6"))
    out = opt("--out", "/tmp/ab_queries_r13.json")
    a_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    pa, pb = start(a_root), start(b_root)
    res: dict[str, dict[str, list[float]]] = {
        n: {"A_head": [], "B_seal": []} for n in names
    }
    try:
        for rep in range(reps):
            order = [("A_head", pa), ("B_seal", pb)]
            if rep % 2:
                order.reverse()
            for side, p in order:
                for n in names:
                    res[n][side].append(round(run_one(p, n), 3))
            print(f"rep {rep + 1}/{reps} done", flush=True)
    finally:
        for p in (pa, pb):
            try:
                p.stdin.write("QUIT\n")
                p.stdin.flush()
            except Exception:
                pass
        for p in (pa, pb):
            p.wait(timeout=60)

    summary = {}
    for n in names:
        s = {}
        for side, xs in res[n].items():
            xs_s = sorted(xs)
            s[side] = {
                "median": round(xs_s[len(xs_s) // 2], 3),
                "min": round(xs_s[0], 3),
                "samples": xs,
            }
        summary[n] = s
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    for n in names:
        a, b = summary[n]["A_head"], summary[n]["B_seal"]
        print(
            f"{n:40s} head med {a['median']:6.2f} min {a['min']:6.2f}"
            f" | seal med {b['median']:6.2f} min {b['min']:6.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
