"""bench.py driver-tail formatting: the compact JSON line must fit the
driver's 2000-char stdout capture, degrading by dropping tail suspect
names first, then tail load verdicts, with counts — never silently."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parents[1] / "bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench", bench)
spec.loader.exec_module(bench)


def _out(n_suspect=0, n_load=0, qlen=40):
    return {
        "metric": "headline_suite_total_sec", "value": 12.345,
        "unit": "sec", "sf": 0.1,
        "queries": {f"row_{i:02d}": 1.234 for i in range(qlen)},
        "suspect": [f"suspect_row_name_{i:02d}" for i in range(n_suspect)],
        "load_start": 1.23,
        "load": {f"suspect_row_name_{i:02d}":
                 {"load_ok": True, "max_loadavg": 9.87, "rerun_min": 1.234}
                 for i in range(n_load)},
        "detail": "BENCH_LOCAL.json",
    }


def test_compact_line_fits_untouched_when_small():
    out = _out(n_suspect=3, n_load=3)
    line = bench._compact_line(out)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    assert len(parsed["suspect"]) == 3 and len(parsed["load"]) == 3
    assert "n_suspect_dropped" not in parsed


def test_compact_line_drops_suspects_then_load_with_counts():
    out = _out(n_suspect=60, n_load=20)
    line = bench._compact_line(out)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    # suspects drain before any load verdict goes
    if parsed["load"]:
        assert parsed["suspect"] == []
    dropped = (parsed.get("n_suspect_dropped", 0)
               + parsed.get("n_load_dropped", 0))
    kept = len(parsed["suspect"]) + len(parsed["load"])
    assert dropped + kept == 80
    # headline queries and the verdict scaffolding always survive
    assert len(parsed["queries"]) == 40
    assert parsed["load_start"] == 1.23
