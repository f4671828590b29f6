"""Span-sequence validation join (SURVEY.md §2.5: the engine's only
cross-document join): compare an extraction run against golden spans on
``doc_id`` and report per-document equality of (kind, text, media_ref,
order).

Pattern: both sides are tagged with a side column and unioned, then ONE
groupby(doc_id) brings each document's two span sequences together —
a hash-shuffle join without materializing either side. The shuffle payload
is the span sequences themselves, which is unavoidable for value equality;
for cheap re-validation, compare ``span_digest`` columns instead (digest
computed inside map_batches, shuffle moves 16 bytes/doc).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..sources.corpus import SPANS_OUT_TYPE


def _digest_spans(spans: list[dict]) -> str:
    h = hashlib.blake2b(digest_size=16)
    for s in spans or []:
        h.update(repr((s.get("kind"), s.get("text"), s.get("media_ref"),
                       s.get("order"))).encode("utf-8"))
    return h.hexdigest()


def add_span_digest(batch: pa.Table, spans_col: str = "spans_out") -> pa.Table:
    spans = batch.column(spans_col).to_pylist()
    return pa.Table.from_arrays(
        [batch.column("doc_id"),
         pa.array([_digest_spans(s) for s in spans], pa.string())],
        names=["doc_id", "span_digest"])


def _tag_side(batch: pa.Table, side: str) -> pa.Table:
    return batch.append_column(
        "side", pa.array([side] * len(batch), pa.string()))


def _compare_group(group: pa.Table) -> pa.Table:
    doc_id = group.column("doc_id")[0].as_py()
    sides = group.column("side").to_pylist()
    digests = group.column("span_digest").to_pylist()
    got = {s: d for s, d in zip(sides, digests)}
    status = "match"
    if "golden" not in got:
        status = "unexpected_doc"
    elif "run" not in got:
        status = "missing_doc"
    elif got["golden"] != got["run"]:
        status = "span_mismatch"
    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()), pa.array([status], pa.string())],
        names=["doc_id", "status"])


def validate_spans(run_ds, golden_ds):
    """Dataset x Dataset -> Dataset (doc_id, status) with status in
    {match, span_mismatch, missing_doc, unexpected_doc}. Both inputs need
    (doc_id, spans_out)."""
    run_d = run_ds.map_batches(add_span_digest, batch_format="pyarrow") \
        .map_batches(_tag_side, fn_kwargs={"side": "run"},
                     batch_format="pyarrow")
    gold_d = golden_ds.map_batches(add_span_digest, batch_format="pyarrow") \
        .map_batches(_tag_side, fn_kwargs={"side": "golden"},
                     batch_format="pyarrow")
    return run_d.union(gold_d).groupby("doc_id").map_groups(
        _compare_group, batch_format="pyarrow")


def validation_summary(run_ds, golden_ds) -> dict:
    """Driver-side rollup: counts per status + overall pass flag."""
    statuses = validate_spans(run_ds, golden_ds)
    from ray.data.aggregate import Count
    rows = statuses.groupby("status").aggregate(Count()).take_all()
    counts = {r["status"]: r["count()"] for r in rows}
    total = sum(counts.values())
    return {
        "docs": total,
        "counts": counts,
        "pass": set(counts) <= {"match"},
    }
