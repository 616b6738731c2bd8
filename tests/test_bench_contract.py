"""Driver-parseability contract for bench.py.

The driver captures only the TAIL of bench stdout and parses the last
line — three rounds of BENCH_r{N}.json came back `parsed: null` before
the summary-last rule landed. This test runs the real bench CLI
end-to-end (sf0.001, 1 rep) and pins:
  - exit 0;
  - the LAST stdout line is a standalone JSON object with the driver's
    expected fields;
  - the full record (with the per-query map) is also present on stdout
    and in BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_summary_is_last_stdout_line(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_CPUS="8",
        # keep the committed sf0.1 BENCH_LOCAL.json out of reach
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "BENCH_LOCAL.json"),
        # Python workers unpickle package UDFs: the repo must be on
        # PYTHONPATH when bench runs outside the repo cwd
        PYTHONPATH="/root/repo",
    )
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # must not depend on repo cwd
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert lines, "no stdout"
    summary = json.loads(lines[-1])  # the driver's tail-parse target
    assert summary["metric"] == "declared_queries_total_wall"
    assert summary["unit"] == "sec"
    assert summary["value"] > 0
    assert summary["n_queries"] >= 170
    assert summary["sf"] == 0.001
    # r14 verdict #1: the PER-QUERY MEDIAN MAP must ride the summary
    # (last) line itself — anything printed earlier is lost to the
    # driver's tail-of-stdout capture (PERF_r14.per_query came back
    # empty because the map only appeared on an earlier line)
    assert len(summary["queries"]) == summary["n_queries"]
    assert all(v >= 0 for v in summary["queries"].values())
    # full record precedes it, and the redirected on-disk copy matches
    full = json.loads(lines[-2])
    assert len(full["queries"]) == summary["n_queries"]
    assert full["queries"] == summary["queries"]
    disk = json.loads((tmp_path / "BENCH_LOCAL.json").read_text())
    assert disk["queries"] == full["queries"]
    # self-adjudication evidence (r13 verdict #1): host load at start
    # and end present everywhere; the per-query rep spread
    # [min, median, max] is FILE-ONLY (r14 verdict #1 — printing it
    # scrolled the per-query map out of the driver's tail capture)
    assert "spread" not in full
    assert set(disk["spread"]) == set(disk["queries"])
    for q, (lo, med, hi) in disk["spread"].items():
        assert lo <= med <= hi
        assert med == disk["queries"][q]
    for rec in (full, disk):
        assert len(rec["load_start"]) == 3
        assert len(rec["load_end"]) == 3
    assert len(summary["load_start"]) == 3
    assert len(summary["load_end"]) == 3
