"""Resumable driver for the extraction pipeline.

Processes input parquet files in shards (waves of files); each shard streams
through `extract_dataset` and lands in its own output directory; the
manifest records lineage + metrics and completed shards are skipped on
restart. At 100 TB the shard is the retry/resume unit (thousands of input
files -> hundreds of shards); within a shard Ray Data streams with
backpressure and retries tasks on its own.

Must not call ray.init()/shutdown(): callers own the Ray session.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import pyarrow.dataset as pads

from ..kernel.extract import ExtractConfig
from ..state.manifest import RunManifest, ShardRecord
from .extract_pipeline import extract_dataset


def _shard_files(files: Sequence[str], shard_size: int) -> list[tuple[str, list[str]]]:
    shards = []
    for i in range(0, len(files), shard_size):
        chunk = sorted(files[i:i + shard_size])
        name = os.path.splitext(os.path.basename(chunk[0]))[0]
        shards.append((f"{i // shard_size:05d}-{name}", chunk))
    return shards


def run_extract(input_files: Sequence[str], out_dir: str, *,
                config: Optional[ExtractConfig] = None,
                shard_size: int = 64,
                batch_size: int = 64,
                concurrency=None,
                mega_threshold: Optional[int] = None) -> dict:
    """Run (or resume) extraction over input parquet files. Returns the
    manifest totals."""
    import ray.data

    from .extract_pipeline import extract_from_parquet

    all_schema = pads.dataset(list(input_files), format="parquet").schema
    if "doc_id" not in all_schema.names or "spans" not in all_schema.names:
        raise ValueError(
            "input is not an interleaved corpus: expected columns "
            "(doc_id, spans[, doc_bytes]) per sources/corpus.CORPUS_SCHEMA, "
            f"got {all_schema.names}. Build one with "
            "sources.corpus.interleave_rows / BuildInterleaved first.")
    manifest = RunManifest(out_dir)
    done = manifest.completed()
    kwargs = {}
    if mega_threshold is not None:
        kwargs["mega_threshold"] = mega_threshold
    for shard_id, files in _shard_files(list(input_files), shard_size):
        if shard_id in done:
            continue
        out_path = manifest.begin_shard(shard_id)
        start = time.perf_counter()
        schema = pads.dataset(files, format="parquet").schema
        if "doc_bytes" in schema.names:
            # ingest-stamped corpus: footer-prescan skew routing, single scan
            result = extract_from_parquet(files, config=config,
                                          batch_size=batch_size,
                                          on_error="skip", **kwargs)
        else:
            ds = ray.data.read_parquet(files)
            result = extract_dataset(ds, config=config, batch_size=batch_size,
                                     concurrency=concurrency,
                                     on_error="skip", **kwargs)
        result.write_parquet(out_path)
        wall = time.perf_counter() - start
        try:
            stats_txt = result.stats()[:4000]
        except Exception:
            stats_txt = ""
        with open(os.path.join(out_path, "_stats.txt"), "w") as f:
            f.write(stats_txt)
        frag = pads.dataset(out_path, format="parquet")
        docs = frag.count_rows()
        spans = 0
        out_bytes = 0
        for f in frag.files:
            out_bytes += os.path.getsize(f)
        try:
            import pyarrow.compute as pc
            tbl = frag.to_table(columns=["n_spans"])
            spans = int(pc.sum(tbl.column("n_spans")).as_py() or 0)
        except Exception:
            spans = 0
        manifest.mark_complete(ShardRecord(
            shard_id=shard_id, input_files=list(files),
            output_path=out_path, docs=docs, spans=spans,
            output_bytes=out_bytes, wall_secs=wall))
    return manifest.totals()
