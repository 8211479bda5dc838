"""CLI end-to-end regression: prepare -> index -> search as a user would
run them (fresh interpreter per command, like the reference's shell
entry points)."""

from __future__ import annotations

import os
import subprocess
import sys


def run_cli(*args: str) -> str:
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "big_data_assignment_2_spark", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_index_then_search(tmp_path):
    ix = str(tmp_path / "ix")
    out = run_cli("index", "--out", ix)
    assert "indexed 31 terms" in out
    out = run_cli("search", "vector query stream", "--index", ix, "-k", "3")
    lines = [l for l in out.splitlines() if l.strip().startswith(("1.", "2.", "3."))]
    assert len(lines) == 3 and "score=" in lines[0]
