"""Validation-join tests (span-sequence equality vs golden)."""

import pyarrow as pa
import pyarrow.parquet as pq

from htmlreader_ray.pipelines.validate import (validate_spans,
                                               validation_summary)
from htmlreader_ray.sources.corpus import SPANS_OUT_TYPE


def spans_tbl(rows):
    return pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], SPANS_OUT_TYPE)],
        names=["doc_id", "spans_out"])


def sp(kind, text="", ref="", order=0):
    return {"kind": kind, "text": text, "media_ref": ref, "order": order}


def test_validate_statuses(ray_session):
    import ray.data
    golden = spans_tbl([
        ("d1", [sp("text", "a"), sp("media", "", "m://x", 1)]),
        ("d2", [sp("text", "b")]),
        ("d3", [sp("text", "c")]),
    ])
    run = spans_tbl([
        ("d1", [sp("text", "a"), sp("media", "", "m://x", 1)]),  # match
        ("d2", [sp("text", "DIFFERENT")]),                       # mismatch
        ("d4", [sp("text", "z")]),                               # unexpected
    ])
    out = validate_spans(ray.data.from_arrow(run),
                         ray.data.from_arrow(golden)).take_all()
    statuses = {r["doc_id"]: r["status"] for r in out}
    assert statuses == {"d1": "match", "d2": "span_mismatch",
                        "d3": "missing_doc", "d4": "unexpected_doc"}


def test_validation_summary_against_golden_fixture(ray_session):
    """End-to-end: re-extract sf0.001 and validate against the frozen
    golden — the full north-rule verification loop as a pipeline."""
    import ray.data
    from htmlreader_ray.sources.corpus import BuildInterleaved
    from htmlreader_ray.pipelines.extract_pipeline import extract_dataset
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    run = extract_dataset(docs.map_batches(BuildInterleaved(),
                                           batch_format="pyarrow"))
    golden = ray.data.read_parquet("tests/golden/extract_sf0.001.parquet")
    summary = validation_summary(run, golden)
    assert summary["pass"], summary
    assert summary["docs"] == 500
