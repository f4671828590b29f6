"""The flagship extraction pipeline (SURVEY.md §7.1).

    corpus (doc_id, spans)
      ├─ tag: doc_bytes (vectorized arrow kernel)
      ├─ SMALL branch (vast majority): ParseExtract tasks (per-worker
      │  extractor cache) — no shuffle
      └─ MEGA branch (skew tail): split at span boundaries -> (doc_id, part)
         -> ParseExtract -> groupby(doc_id).map_groups(reassemble)
           [the ONLY shuffle in the pipeline, touching only the skew tail]
      └─ union -> sink

Scale notes (100 TB / 256 nodes):
- The two branches are separate consumers of the tagged dataset; Ray Data
  executes the upstream read twice, but the read is a cheap columnar scan
  with row-group pruning while the expensive work (parse) is paid exactly
  once per document. At ingest scale, store ``doc_bytes`` as a top-level
  column so ``read_parquet(filter=...)`` prunes at the source and the double
  scan disappears entirely.
- Mega documents are split at SPAN boundaries only — parser state cannot
  cross an HTML payload (SURVEY.md §2.10) — so a 1 GB doc with many spans
  fans out across the cluster and is reassembled by a doc_id-hash shuffle
  whose volume is only the skew tail, not the corpus.
- No stage materializes the dataset; everything streams with backpressure.
- Memory sizing: blocks stay at the DataContext default target
  (128 MB) — right for ~1-100 KB text documents, where a whole-block
  batch x 32 workers is well inside a worker heap. Pipelines that carry
  LARGE BINARY payloads must not inherit this: the media stages cap
  ``batch_size`` (64 rows, stages/media.py) so batch x concurrency stays
  bounded regardless of payload size, and an ingest of multi-MB documents
  should lower ``DataContext.target_max_block_size`` proportionally
  rather than rely on the skew router alone.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.extract import ExtractConfig
from ..sources.corpus import SPANS_OUT_TYPE, SPANS_TYPE
from ..stages.parse_extract import ParseExtract, parse_extract_batch

DEFAULT_MEGA_THRESHOLD = 4 << 20   # docs larger than this are split
DEFAULT_PART_TARGET = 1 << 20      # target bytes per split part


def tag_doc_bytes(batch: pa.Table) -> pa.Table:
    """Append a ``doc_bytes`` column = total HTML payload bytes per doc.
    Pure-arrow + numpy (no Python per-row loop)."""
    if "doc_bytes" in batch.column_names:
        return batch  # stamped at ingest
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    if len(batch) == 0:
        return batch.append_column("doc_bytes", pa.array([], pa.int64()))
    flat = pc.list_flatten(spans)
    text_lens = pc.binary_length(pc.struct_field(flat, "text")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    # reduceat quirks: empty lists repeat the next segment and indices must
    # stay in range — pad with one zero and mask empties afterwards
    padded = np.concatenate([text_lens, [0]])
    starts = np.minimum(starts, len(padded) - 1)
    sums = np.add.reduceat(padded, starts)
    sums = np.where(lengths == 0, 0, sums)
    return batch.append_column("doc_bytes", pa.array(sums, pa.int64()))


def _filter_small(batch: pa.Table, threshold: int) -> pa.Table:
    mask = pc.less_equal(batch.column("doc_bytes"), threshold)
    if pc.all(mask).as_py():  # common case: zero-copy column drop only
        return batch.drop_columns(["doc_bytes"])
    return batch.filter(mask).drop_columns(["doc_bytes"])


def _filter_mega(batch: pa.Table, threshold: int) -> pa.Table:
    mask = pc.greater(batch.column("doc_bytes"), threshold)
    return batch.filter(mask).drop_columns(["doc_bytes"])


def split_mega_batch(batch: pa.Table, part_target: int) -> pa.Table:
    """Split each mega-doc's span list into parts at span boundaries.
    Output rows: (doc_id, part_idx, spans)."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_lists = batch.column("spans").to_pylist()
    out_ids: list[str] = []
    out_part: list[int] = []
    out_spans: list[list[dict]] = []
    for doc_id, spans in zip(doc_ids, spans_lists):
        spans = sorted(spans or [], key=lambda s: s.get("offset", 0))
        part: list[dict] = []
        part_bytes = 0
        part_idx = 0
        for span in spans:
            part.append(span)
            part_bytes += len(span.get("text") or "")
            if part_bytes >= part_target:
                out_ids.append(doc_id)
                out_part.append(part_idx)
                out_spans.append(part)
                part, part_bytes = [], 0
                part_idx += 1
        if part or part_idx == 0:
            out_ids.append(doc_id)
            out_part.append(part_idx)
            out_spans.append(part)
    return pa.Table.from_arrays(
        [pa.array(out_ids, pa.string()),
         pa.array(out_part, pa.int32()),
         pa.array(out_spans, SPANS_TYPE)],
        names=["doc_id", "part_idx", "spans"])


def reassemble_group(group: pa.Table) -> pa.Table:
    """map_groups kernel: concat a doc's part outputs in part order and
    re-number span order densely (the groupby-doc_id aggregate-sort step of
    the north rule)."""
    order_idx = pc.sort_indices(group.column("part_idx"))
    group = group.take(order_idx)
    spans_parts = group.column("spans_out").to_pylist()
    merged: list[dict] = []
    for part in spans_parts:
        merged.extend(part or [])
    for i, span in enumerate(merged):
        span["order"] = i
    doc_id = group.column("doc_id")[0].as_py()
    n_chars = sum(len(s["text"]) for s in merged)
    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()),
         pa.array([merged], SPANS_OUT_TYPE),
         pa.array([len(merged)], pa.int32()),
         pa.array([n_chars], pa.int64())],
        names=["doc_id", "spans_out", "n_spans", "n_chars"])


def extract_dataset(ds, *, config: Optional[ExtractConfig] = None,
                    mega_threshold: int = DEFAULT_MEGA_THRESHOLD,
                    part_target: int = DEFAULT_PART_TARGET,
                    batch_size=None,
                    concurrency=None,
                    on_error: str = "raise"):
    """corpus Dataset -> extracted Dataset (doc_id, spans_out, n_spans,
    n_chars). Lazy; consume with write_parquet / iter_batches."""
    import ray.data  # local import: library code must not own a Ray session

    # Parse stages run as TASKS with a per-worker-process extractor cache
    # (see stages.parse_extract.parse_extract_batch): same load-once
    # semantics as an actor pool, but tasks fuse with adjacent map_batches,
    # reuse warm workers across pipeline executions, and scale elastically
    # without pool spin-up. `concurrency` is kept for API compatibility and
    # ignored.
    del concurrency
    tagged = ds.map_batches(tag_doc_bytes, batch_format="pyarrow")

    small = tagged.map_batches(
        _filter_small, fn_kwargs={"threshold": mega_threshold},
        batch_format="pyarrow")
    small_out = small.map_batches(
        parse_extract_batch,
        fn_kwargs={"config": config, "on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size)

    mega = tagged.map_batches(
        _filter_mega, fn_kwargs={"threshold": mega_threshold},
        batch_format="pyarrow")
    mega_parts = mega.map_batches(
        split_mega_batch, fn_kwargs={"part_target": part_target},
        batch_format="pyarrow")
    mega_parsed = mega_parts.map_batches(
        parse_extract_batch, fn_kwargs={
            "config": config, "passthrough_cols": ("part_idx",),
            "on_error": on_error},
        batch_format="pyarrow", batch_size=4)
    mega_out = mega_parsed.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pyarrow")

    return small_out.union(mega_out)


def files_with_mega_docs(paths, threshold: int) -> list[str]:
    """Parquet-footer prescan: which files contain docs above the skew
    threshold, per row-group statistics on the ingest-stamped ``doc_bytes``
    column. Metadata-only — no data pages are read. At 100 TB this footer
    sweep is itself parallelizable (one task per few thousand files), but it
    is milliseconds per file either way."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(paths, format="parquet")
    hits: list[str] = []
    for frag in dataset.get_fragments():
        frag.ensure_complete_metadata()
        has_mega = False
        for rg in frag.row_groups:
            stats = (rg.statistics or {}).get("doc_bytes")
            if stats is None or stats.get("max") is None or \
                    stats["max"] > threshold:
                has_mega = True
                break
        if has_mega:
            hits.append(frag.path)
    return hits


def _row_group_items(paths) -> list[dict]:
    """One work item per parquet row group — the fused-read task list.
    Metadata-only (footers); each item is also the unit of per-partition
    lineage for resumable runs."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(paths, format="parquet")
    items: list[dict] = []
    for frag in dataset.get_fragments():
        frag.ensure_complete_metadata()
        for rg in frag.row_groups:
            items.append({"path": frag.path, "rg": rg.id})
    return items


def _read_filter_parse(batch: pa.Table, *, threshold: int,
                       config, on_error: str) -> pa.Table:
    """Fused read+parse task body: read the row groups named by the work
    items, drop mega docs (the mega branch re-reads only their files), and
    parse — one task, no raw-bytes round trip through the object store."""
    import pyarrow.parquet as pq

    outs = []
    for path, rg in zip(batch.column("path").to_pylist(),
                        batch.column("rg").to_pylist()):
        t = pq.ParquetFile(path).read_row_group(rg)
        t = _filter_small(t, threshold=threshold)
        outs.append(parse_extract_batch(t, config=config,
                                        on_error=on_error))
    return pa.concat_tables(outs)


def extract_from_parquet(paths, *, config: Optional[ExtractConfig] = None,
                         mega_threshold: int = DEFAULT_MEGA_THRESHOLD,
                         part_target: int = DEFAULT_PART_TARGET,
                         batch_size=None,
                         override_num_blocks: Optional[int] = None,
                         fused: bool = True,
                         rgs_per_task: int = 4,
                         on_error: str = "raise"):
    """Extraction over a corpus whose ``doc_bytes`` column was stamped at
    ingest (sources.corpus.CORPUS_SCHEMA). The skew tail is routed at the
    READ: a metadata-only footer prescan finds the files that contain mega
    docs; only those are re-read by the mega branch (and when the corpus has
    no skew tail the union/shuffle machinery is skipped entirely, leaving a
    pure single-scan streaming pipeline). This is the production read path;
    ``extract_dataset`` handles arbitrary in-memory Datasets.

    ``fused=True`` (default) drives the small branch from a row-group work
    list: each task reads its row groups with pyarrow and parses them in
    the same process, so the raw HTML payload never round-trips through the
    object store (Ray 2.49 keeps ReadParquet as its own operator and ships
    every block between the read and map stages — ~20% of small-branch wall
    time on the 6M-doc scaling corpus). ``rgs_per_task`` sets task
    granularity; ``override_num_blocks``/``batch_size`` apply only to the
    non-fused path."""
    import ray.data

    mega_files = files_with_mega_docs(paths, mega_threshold)

    if fused:
        items = _row_group_items(paths)
        small_out = ray.data.from_items(items).map_batches(
            _read_filter_parse,
            fn_kwargs={"threshold": mega_threshold, "config": config,
                       "on_error": on_error},
            batch_format="pyarrow", batch_size=rgs_per_task)
    else:
        kw = {}
        if override_num_blocks is not None:
            kw["override_num_blocks"] = override_num_blocks
        small = ray.data.read_parquet(paths, **kw)
        small_out = small.map_batches(
            _filter_small, fn_kwargs={"threshold": mega_threshold},
            batch_format="pyarrow").map_batches(
            parse_extract_batch,
            fn_kwargs={"config": config, "on_error": on_error},
            batch_format="pyarrow", batch_size=batch_size)
    if not mega_files:
        return small_out

    mega = ray.data.read_parquet(mega_files)
    mega_parts = mega.map_batches(
        _filter_mega, fn_kwargs={"threshold": mega_threshold},
        batch_format="pyarrow").map_batches(
        split_mega_batch, fn_kwargs={"part_target": part_target},
        batch_format="pyarrow")
    mega_parsed = mega_parts.map_batches(
        parse_extract_batch, fn_kwargs={
            "config": config, "passthrough_cols": ("part_idx",),
            "on_error": on_error},
        batch_format="pyarrow", batch_size=4)
    mega_out = mega_parsed.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pyarrow")
    return small_out.union(mega_out)


def _drop_doc_bytes(batch: pa.Table) -> pa.Table:
    if "doc_bytes" in batch.column_names:
        return batch.drop_columns(["doc_bytes"])
    return batch
