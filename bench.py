"""Benchmark harness (driver contract).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "num_cpus": N}

--scaling: runs the headline extraction pipeline twice in fresh subprocesses
(num_cpus=8 then num_cpus=32) over the same input and reports throughput at
both plus scaling efficiency (the sandbox substitute for the north rule's
N-vs-4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

HEADLINE_QUERIES = [
    "extract_interleaved",   # flagship: build corpus -> parse -> extract
    "exact_dedup",
    "minhash_pairs",
    "ann_brute_topk",
    "token_count",
    "quality_counts",
    "lang_id",
    "fingerprint",
]


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _consume(result) -> int:
    """Drain a query result without materializing it on the driver."""
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            n = 0
            for batch in result.iter_batches(batch_format="pyarrow",
                                             batch_size=4096):
                n += len(batch)
            return n
    except ImportError:
        pass
    return len(result)


def run_queries(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        rows[name] = _consume(fn(sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return {"timings": timings, "rows": rows}


def main_bench() -> None:
    t0 = time.perf_counter()
    res = run_queries(SF_DIR, NUM_CPUS, HEADLINE_QUERIES)
    total = round(time.perf_counter() - t0, 3)
    n_docs = res["rows"].get("fingerprint") or 0
    out = {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "rows": res["rows"],
        "docs": n_docs,
        "extract_docs_per_sec": round(
            n_docs / res["timings"]["extract_interleaved"], 2)
        if res["timings"].get("extract_interleaved") else None,
        "sf": _sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
    }
    print(json.dumps(out))
    import ray
    ray.shutdown()


def _child_extract(num_cpus: int) -> None:
    """Run ONLY the flagship extraction at a given parallelism; print JSON."""
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    fn = entrymod.queries()["extract_interleaved"]
    # warm the Ray session with a trivial pass so startup cost is excluded
    ray.data.range(8).map_batches(lambda b: b).count()
    t0 = time.perf_counter()
    n = _consume(fn(SF_DIR))
    dt = time.perf_counter() - t0
    docs = n // 2  # two spans per doc in the generated corpus
    print(json.dumps({"num_cpus": num_cpus, "rows": n, "docs": docs,
                      "secs": round(dt, 3),
                      "docs_per_sec": round(docs / dt, 2)}))
    ray.shutdown()


def main_scaling() -> None:
    results = []
    for n in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child-extract",
             str(n)],
            capture_output=True, text=True, check=False,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        if proc.returncode != 0 or not line:
            print(json.dumps({"error": "child failed", "num_cpus": n,
                              "stderr": proc.stderr[-2000:]}))
            sys.exit(1)
        results.append(json.loads(line))
    t_n, t_4n = results[0], results[1]
    eff = (t_4n["docs_per_sec"] / t_n["docs_per_sec"]) / (32 / 8)
    out = {
        "metric": "scaling_efficiency_extract",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cpus": 8,
        "4n_cpus": 32,
        "docs_per_sec_n": t_n["docs_per_sec"],
        "docs_per_sec_4n": t_4n["docs_per_sec"],
        "secs_n": t_n["secs"],
        "secs_4n": t_4n["secs"],
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child-extract":
        _child_extract(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    else:
        main_bench()
