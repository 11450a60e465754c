"""bench.py crash resilience: a raylet death mid-run must never void the
perf artifact (BENCH_r03 was `rc: 1, parsed: null` from one transient
crash). The harness runs timed sections in a supervised child — one retry
in a fresh process, partial-JSON flush after every section, salvage of the
last partial when both attempts die."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env: dict) -> tuple[int, dict]:
    env = dict(
        os.environ,
        RAY_GRAFT_DOCS="1000",
        RAY_GRAFT_CPUS="2",
        BENCH_HEADLINE_ONLY="1",
        BENCH_BUILD_RUNS="1",
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        # the pytest session owns a Ray cluster; the bench child must start
        # its own local one
        RAY_ADDRESS="local",
        **extra_env,
    )
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=540)
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")]
    return proc.returncode, (json.loads(line[-1]) if line else {})


def test_bench_survives_one_crash_then_salvages(tmp_path):
    marker = str(tmp_path / "crashed_once")
    rc, out = _run({"BENCH_INJECT_CRASH": marker})
    # first attempt died at the first flush; the retry produced a full run
    assert rc == 0
    assert out.get("bench_attempts") == 2
    assert not out.get("partial")
    assert out["value"] > 0

    rc, out = _run({"BENCH_INJECT_CRASH": "always"})
    # both attempts died: the salvaged partial still carries the headline
    assert rc == 0
    assert out.get("partial") is True
    assert out.get("bench_attempts") == 2
    assert out["value"] > 0
    assert "index_build" in out["queries"]
