"""Frozen golden span fixtures: the F1 invariant (span-sequence equality on
kind/text/media_ref/order) against outputs frozen at round 1 — catches
regressions that move kernel and oracle together."""

import pyarrow.parquet as pq

from htmlreader_ray.sources.corpus import BuildInterleaved
from htmlreader_ray.stages.parse_extract import ParseExtract

GOLDEN = "tests/golden/extract_sf0.001.parquet"


def test_span_sequences_match_golden():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    got = ParseExtract()(BuildInterleaved()(docs))
    golden = pq.read_table(GOLDEN)
    want = {r["doc_id"]: r["spans_out"] for r in golden.to_pylist()}
    assert got.num_rows == golden.num_rows
    mismatches = []
    for r in got.to_pylist():
        if r["spans_out"] != want[r["doc_id"]]:
            mismatches.append(r["doc_id"])
    assert not mismatches, f"span-sequence drift in {mismatches[:5]}"


def test_multispan_sequences_match_golden():
    from htmlreader_ray.sources.corpus import BuildInterleavedMulti
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    got = ParseExtract()(BuildInterleavedMulti()(docs))
    golden = pq.read_table("tests/golden/extract_multispan_sf0.001.parquet")
    want = {r["doc_id"]: r["spans_out"] for r in golden.to_pylist()}
    drift = [r["doc_id"] for r in got.to_pylist()
             if r["spans_out"] != want[r["doc_id"]]]
    assert not drift, drift[:5]
