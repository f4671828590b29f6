"""Per-partition checkpoint manifest with lineage + throughput metrics.

App-level resumability (nothing in Ray Data provides this — SURVEY.md §4.2):
- output is partitioned parquet, one directory per input shard, never one
  giant file
- a JSON manifest records, per completed shard: input files (lineage),
  docs, spans, bytes, wall seconds, output path
- writes are idempotent: manifest updates go write-then-rename, and a shard
  directory is re-created from scratch on retry (safe because the parse
  kernel is deterministic and side-effect-free)
- resume = read manifest, skip completed shards
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class ShardRecord:
    shard_id: str
    input_files: list[str]
    output_path: str
    docs: int = 0
    spans: int = 0
    output_bytes: int = 0
    wall_secs: float = 0.0
    completed_at: float = 0.0


class RunManifest:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "_manifest.json")
        self._records: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._records = json.load(f).get("shards", {})

    def completed(self) -> set[str]:
        return set(self._records)

    def record(self, shard_id: str) -> Optional[dict]:
        return self._records.get(shard_id)

    def shard_output_dir(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, f"shard={shard_id}")

    def begin_shard(self, shard_id: str) -> str:
        """Fresh output dir for a shard (clears partial results from a
        previous failed attempt)."""
        path = self.shard_output_dir(shard_id)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return path

    def mark_complete(self, record: ShardRecord) -> None:
        record.completed_at = time.time()
        self._records[record.shard_id] = asdict(record)
        self._flush()

    def _flush(self) -> None:
        payload = {
            "version": 1,
            "shards": self._records,
            "totals": self.totals(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.out_dir, suffix=".manifest.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)  # atomic write-then-rename
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def totals(self) -> dict:
        docs = sum(r["docs"] for r in self._records.values())
        spans = sum(r["spans"] for r in self._records.values())
        secs = sum(r["wall_secs"] for r in self._records.values())
        out_bytes = sum(r["output_bytes"] for r in self._records.values())
        return {
            "shards": len(self._records),
            "docs": docs,
            "spans": spans,
            "output_bytes": out_bytes,
            "wall_secs": round(secs, 3),
            "docs_per_sec": round(docs / secs, 2) if secs else 0.0,
        }
