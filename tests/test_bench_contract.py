"""Contract tests for bench.py's driver-facing stdout line.

The external driver tail-captures the last ~2000 characters of
bench.py's stdout and parses the final line as JSON. BENCH_r08/r09
both recorded "parsed": null when the full line overflowed that
window; the compact-last-line + overflow fallback exists to make
that impossible again. These tests pin the fallback (r11 VERDICT
task #7) without starting Spark.
"""

from __future__ import annotations

import json

from bench import compact_line


def _assert_contract(parsed: dict) -> None:
    assert parsed["metric"] == "headline_query_wall_seconds"
    assert isinstance(parsed["value"], (int, float))
    assert parsed["unit"] == "sec"
    assert parsed["runs"] == 3
    assert parsed["sf"] == 0.1


def test_compact_line_normal_keeps_per_query_map():
    mins = {f"q{i}": 1.5 for i in range(40)}
    line = compact_line(mins, 3, 0.1)
    assert len(line) < 1900
    parsed = json.loads(line)
    _assert_contract(parsed)
    assert parsed["queries"] == mins
    assert parsed["value"] == round(sum(mins.values()), 3)


def test_compact_line_overflow_drops_map_but_still_parses():
    # ~300 queries with long names: the full map would blow well past
    # the driver's 2000-char tail window.
    mins = {f"query_with_a_rather_long_name_{i:04d}": 1.234 for i in range(300)}
    full = json.dumps({"queries": mins}, separators=(",", ":"))
    assert len(full) > 2000  # the scenario the guard exists for
    line = compact_line(mins, 3, 0.1)
    assert len(line) < 1900
    parsed = json.loads(line)
    _assert_contract(parsed)
    assert "queries" not in parsed
    assert parsed["queries_in"] == "BENCH_LOCAL.json"
    assert parsed["value"] == round(sum(mins.values()), 3)
