"""Clean-window watcher for official scaling recordings.

Probes the 32-process busyloop speedup every ~2 minutes; when it clears
the >=29 bar (the BASELINE.md protocol for official numbers on this
box), fires `bench.py --scaling` once and appends the JSON line to
/tmp/scaling_official.jsonl, then exits. Leave it running in the
background; fold the capture into BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/scaling_official.jsonl"
BAR = 29.0

if REPO not in sys.path:
    sys.path.insert(0, REPO)
import bench as _bench  # noqa: E402  (after sys.path setup)


def health() -> float:
    return float(_bench._host_health())


def main() -> int:
    deadline = time.time() + float(
        os.environ.get("WATCH_MAX_SECS", 4 * 3600))
    while time.time() < deadline:
        h = health()
        line = {"ts": time.time(), "health": h}
        print(json.dumps(line), flush=True)
        if h >= BAR:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling"],
                capture_output=True, text=True, cwd=REPO)
            rec = proc.stdout.strip().splitlines()[-1] \
                if proc.stdout.strip() else json.dumps(
                    {"error": proc.stderr[-500:]})
            with open(OUT, "a") as fh:
                fh.write(rec + "\n")
            print("CAPTURED:", rec, flush=True)
            return 0
        time.sleep(120)
    print("no clean window before deadline", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
