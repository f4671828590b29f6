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


def test_poison_document_fails_alone():
    from htmlreader_ray.stages.parse_extract import ParseExtract
    from htmlreader_ray.sources.corpus import SPAN_TYPE

    spans = [[{"kind": "text", "text": "<p>ok</p>", "media_ref": "",
               "offset": 0}] for _ in range(5)]
    t = pa.table({"doc_id": pa.array(list(range(5)), pa.int64()),
                  "spans": pa.array(spans, pa.list_(SPAN_TYPE))})
    pe = ParseExtract(on_error="skip")

    real = pe.extractor.extract_html

    def poisoned(html):
        if html == "<p>ok</p>" and poisoned.bomb:
            poisoned.bomb -= 1
            raise ValueError("poison document")
        return real(html)

    poisoned.bomb = 1  # exactly the first document explodes
    pe.extractor.extract_html = poisoned
    out = pe(t)
    # the poisoned doc degrades to an empty span list; the other four
    # documents are unaffected and the error is counted, not raised
    assert out.num_rows == 5
    assert pe.errors == 1
    n_spans = out.column("n_spans").to_pylist()
    assert n_spans[0] == 0 and all(n == 1 for n in n_spans[1:])
