"""The driver parses bench.py's FINAL stdout line out of a ~2000-char tail.

These tests pin the compact-record contract without running Spark: every
benched query gets a stable short key from the frozen legend, the line fits
the tail budget, and "total" survives (the only key prior rounds' records
carry, so cross-round comparison never sees a drop).
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def _fake_timings() -> dict[str, float]:
    # worst-case-ish values: every query takes double digits of seconds
    return {name: 10.0 + i / 1000.0 for i, name in enumerate(bench.BENCH_QUERIES)} | {
        "streaming_sync": 12.345
    }


def test_legend_covers_all_benched_queries_uniquely():
    legend = bench._short_names()
    names = bench.BENCH_QUERIES + ["streaming_sync"]
    missing = [n for n in names if n not in legend]
    assert not missing, f"legend missing {missing}"
    shorts = [legend[n] for n in names]
    assert len(set(shorts)) == len(shorts), "short-name collision"
    assert "total" not in shorts and "rest" not in shorts


def test_legend_file_is_frozen_source_of_truth():
    path = os.path.join(_REPO, "bench_short_names.json")
    with open(path) as f:
        frozen = json.load(f)
    legend = bench._short_names()
    for name in bench.BENCH_QUERIES + ["streaming_sync"]:
        assert legend[name] == frozen[name], name


def test_compact_final_line_fits_tail_and_keeps_total():
    timings = _fake_timings()
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
    }
    compact = bench._compact_record(out, timings)
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench._TAIL_BUDGET, len(line)
    assert compact["queries"]["total"] == out["value"]
    assert compact["metric"] == "headline_queries_total_sec"
    assert compact["unit"] == "sec"
    # every benched query is represented (no silent fallback to "rest")
    legend = bench._short_names()
    for name in timings:
        assert legend[name] in compact["queries"], name


def test_compact_record_survives_unfrozen_new_query():
    timings = _fake_timings() | {"zz_totally_new_query_name": 1.0}
    out = {"metric": "headline_queries_total_sec", "value": 1.0, "unit": "sec", "sf": 0.1}
    compact = bench._compact_record(out, timings)
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench._TAIL_BUDGET
    # new name got a key that collides with nothing
    assert len(set(compact["queries"])) == len(compact["queries"])
