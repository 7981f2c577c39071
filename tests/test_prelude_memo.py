"""Memo-integrity guard for the shared LSH prelude cache (VERDICT r8
task #6): hits and misses of `_PRELUDE_CACHE` must never change what a
consumer query returns — across warm reuse in one session, across a
PROCESS RESTART (fresh JVM, fresh cache), and across a change of
sf_dir in the same session (the stale-sf hazard the applicationId+
abspath key exists to prevent)."""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from taps_spark.queries import REGISTRY, _load  # noqa: E402
from taps_spark.queries import dedup as dedup_queries  # noqa: E402

CONSUMER = "dedup_lsh_verified_pairs"

_COLD_SCRIPT = """
import hashlib, json, sys
sys.path.insert(0, {repo!r})
from taps_spark.session import get_spark
from taps_spark.queries import REGISTRY, _load
_load()
spark = get_spark("prelude_memo_cold")
rows = REGISTRY[{consumer!r}].fn(spark, {sf_dir!r}).collect()
norm = sorted(tuple(str(x) for x in r) for r in rows)
print("HASH:" + hashlib.md5(json.dumps(norm).encode()).hexdigest())
spark.stop()
"""


def _result_hash(spark, sf_dir: str) -> str:
    _load()
    rows = REGISTRY[CONSUMER].fn(spark, sf_dir).collect()
    norm = sorted(tuple(str(x) for x in r) for r in rows)
    return hashlib.md5(json.dumps(norm).encode()).hexdigest()


def test_memo_warm_hit_is_byte_identical(spark, sf_dir):
    """Cold build vs warm memo hit in one session: identical output."""
    dedup_queries._PRELUDE_CACHE.clear()
    cold = _result_hash(spark, sf_dir)
    assert dedup_queries._PRELUDE_CACHE, "cold run should populate the memo"
    warm = _result_hash(spark, sf_dir)
    assert warm == cold


def test_memo_survives_process_restart(spark, sf_dir):
    """A FRESH PROCESS (new JVM, empty memo, new applicationId) must
    produce the same output hash as this session's memo-warm run —
    the exact guarantee a materialized-artifact cache owes its
    consumers. ~40 s: one subprocess SparkSession."""
    warm = _result_hash(spark, sf_dir)
    script = _COLD_SCRIPT.format(repo=REPO, consumer=CONSUMER, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    ).stdout
    cold = [ln for ln in out.splitlines() if ln.startswith("HASH:")]
    assert cold, f"cold subprocess printed no hash; stdout={out[-500:]}"
    assert cold[0].removeprefix("HASH:") == warm


def test_memo_keys_distinguish_sf_dirs(spark, sf_dir, tmp_path):
    """Stale-sf hazard: after warming the memo at sf_dir, querying a
    DIFFERENT directory with identical relative layout must rebuild
    (miss), not reuse — asserted on both the key set and the output
    (the copy has one document dropped, so group counts shift)."""
    import pyarrow.parquet as pq

    dedup_queries._PRELUDE_CACHE.clear()
    h_orig = _result_hash(spark, sf_dir)
    keys_before = set(dedup_queries._PRELUDE_CACHE)

    alt = tmp_path / "sf_alt"
    alt.mkdir()
    for name in ("documents",):
        t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        pq.write_table(t.slice(1), str(alt / f"{name}.parquet"))

    h_alt = _result_hash(spark, str(alt))
    keys_after = set(dedup_queries._PRELUDE_CACHE)
    new_keys = keys_after - keys_before
    assert new_keys, "alt sf_dir must MISS the memo and insert new keys"
    assert all(os.path.abspath(str(alt)) in k for k in new_keys)
    assert keys_before <= keys_after, "same-app entries must not be evicted"
    # Dropping doc 0 (a member of at least one dup group at sf0.001)
    # must change the verified-pairs output; if it doesn't, the memo
    # served stale frames.
    assert h_alt != h_orig


def test_eviction_drops_only_other_apps(spark, sf_dir):
    """_evict_stale_prelude removes exactly the foreign-app entries."""
    dedup_queries._PRELUDE_CACHE.clear()
    _result_hash(spark, sf_dir)
    live = set(dedup_queries._PRELUDE_CACHE)
    assert live
    fake = ("prelude", "app-from-a-stopped-context", "/nowhere", 1, 1, 1)
    dedup_queries._PRELUDE_CACHE[fake] = None
    dedup_queries._evict_stale_prelude(spark.sparkContext.applicationId)
    assert fake not in dedup_queries._PRELUDE_CACHE
    assert set(dedup_queries._PRELUDE_CACHE) == live
