"""bench.py is a driver-facing contract: smoke the CLI itself."""

import json
import os
import subprocess
import sys


def test_bench_headline_smoke():
    env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001",
               RAY_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd="/root/repo", env=env, timeout=400)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "headline_pipelines_total"
    assert out["unit"] == "sec"
    assert out["num_cpus"] == 4
    assert out["sf"] == 0.001
    assert set(out["queries"]) >= {"extract_interleaved", "exact_dedup",
                                   "token_count"}
    assert out["rows"]["extract_interleaved"] > 0
    assert out["extract_docs_per_sec"] > 0


def test_bench_kernel_smoke():
    env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--kernel"], capture_output=True,
        text=True, cwd="/root/repo", env=env, timeout=200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == "kernel_microbench"
    assert out["parse_mb_per_sec"] > 0.5
