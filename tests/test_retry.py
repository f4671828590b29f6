"""Retry safety: the parse kernel is deterministic and side-effect-free
(SURVEY.md §4.2 / stages/parse_extract.py docstring), so Ray task retries
must yield identical results. Pins the production pattern: transient task
failures are retried via ray_remote_args(retry_exceptions), while
per-document poison is absorbed by ParseExtract(on_error="skip")."""

import pyarrow as pa


def test_transient_task_failure_retried(ray_session, tmp_path):
    import ray.data as rd

    flag = tmp_path / "failed_once"

    def flaky(batch: pa.Table) -> pa.Table:
        if not flag.exists():
            flag.write_text("x")
            raise RuntimeError("injected transient failure")
        return batch

    ds = rd.range(1000, override_num_blocks=4).map_batches(
        flaky, batch_format="pyarrow",
        retry_exceptions=True, max_retries=3)
    assert ds.count() == 1000


def test_parse_extract_retry_is_deterministic(ray_session):
    import ray.data as rd
    from htmlreader_ray.sources.corpus import BuildInterleaved
    from htmlreader_ray.stages.parse_extract import parse_extract_batch

    docs = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": [f"doc {i} body text with words" for i in range(20)]})

    def run():
        ds = rd.from_arrow(docs).map_batches(
            BuildInterleaved(), batch_format="pyarrow")
        out = ds.map_batches(parse_extract_batch, batch_format="pyarrow")
        return sorted(
            (r["doc_id"], tuple((s["kind"], s["text"]) for s in r["spans_out"]))
            for r in out.take_all())

    assert run() == run()


def _poison_table():
    from htmlreader_ray.sources.corpus import SPAN_TYPE

    spans = [[{"kind": "text", "text": "<p>ok</p>", "media_ref": "",
               "offset": 0}] for _ in range(5)]
    return pa.table({"doc_id": pa.array(list(range(5)), pa.int64()),
                     "spans": pa.array(spans, pa.list_(SPAN_TYPE))})


def _assert_poison_contained(pe, out):
    # the poisoned doc degrades to an empty span list; the other four
    # documents are unaffected and the error is counted, not raised
    assert out.num_rows == 5
    assert pe.errors == 1
    n_spans = out.column("n_spans").to_pylist()
    assert n_spans[0] == 0 and all(n == 1 for n in n_spans[1:])


def test_poison_document_fails_alone():
    """Per-doc fallback path: with the C batch entry disabled, a document
    whose extract_html raises is absorbed alone (on_error='skip')."""
    from htmlreader_ray.stages.parse_extract import ParseExtract

    pe = ParseExtract(on_error="skip")
    real = pe.extractor.extract_html

    def poisoned(html):
        if html == "<p>ok</p>" and poisoned.bomb:
            poisoned.bomb -= 1
            raise ValueError("poison document")
        return real(html)

    poisoned.bomb = 1  # exactly the first document explodes
    pe.extractor.extract_html = poisoned
    # force the per-doc path: the batched C entries never raise per doc,
    # so the poison must flow through the extract_html fallback
    pe.extractor.extract_html_many_arrow = lambda arr: None
    pe.extractor.extract_html_many = lambda texts: None
    out = pe(_poison_table())
    _assert_poison_contained(pe, out)


def test_poison_document_fails_alone_batched():
    """Batched path: a null slot from extract_html_many (C parser bailed
    AND the per-doc Python re-run raised) routes to on_error per doc."""
    from htmlreader_ray.stages.parse_extract import ParseExtract

    pe = ParseExtract(on_error="skip")
    real_many = pe.extractor.extract_html_many

    def poisoned_many(texts):
        arr = real_many(texts)
        if arr is None:        # C entry unavailable: emulate its contract
            arr = pa.array([pe.extractor.extract_html(t or "")
                            for t in texts], pa.string())
        if len(arr) and poisoned_many.bomb:
            poisoned_many.bomb -= 1
            vals = arr.to_pylist()
            vals[0] = None     # first doc: both parse attempts failed
            arr = pa.array(vals, pa.string())
        return arr

    poisoned_many.bomb = 1
    pe.extractor.extract_html_many_arrow = lambda arr: None
    pe.extractor.extract_html_many = poisoned_many
    out = pe(_poison_table())
    _assert_poison_contained(pe, out)


def test_poison_document_fails_alone_arrow():
    """Arrow-buffer path: a null slot from extract_html_many_arrow (C
    parse bailed AND the per-doc Python re-run raised) routes to
    on_error per doc, identically to the list path."""
    from htmlreader_ray.stages.parse_extract import ParseExtract

    pe = ParseExtract(on_error="skip")
    real_arrow = pe.extractor.extract_html_many_arrow

    def poisoned_arrow(arr):
        out = real_arrow(arr)
        if out is None:        # C entry unavailable: emulate its contract
            out = pa.array([pe.extractor.extract_html(t or "")
                            for t in (arr.combine_chunks().to_pylist()
                                      if isinstance(arr, pa.ChunkedArray)
                                      else arr.to_pylist())], pa.string())
        if len(out) and poisoned_arrow.bomb:
            poisoned_arrow.bomb -= 1
            vals = out.to_pylist()
            vals[0] = None     # first doc: both parse attempts failed
            out = pa.array(vals, pa.string())
        return out

    poisoned_arrow.bomb = 1
    pe.extractor.extract_html_many_arrow = poisoned_arrow
    out = pe(_poison_table())
    _assert_poison_contained(pe, out)
