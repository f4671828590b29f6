"""Ray Data pipeline integration tests (small scale, session-scoped Ray)."""

import os
import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from htmlreader_ray.pipelines.extract_pipeline import (extract_dataset,
                                                       split_mega_batch,
                                                       tag_doc_bytes)
from htmlreader_ray.sources.corpus import (CORPUS_SCHEMA, SPANS_TYPE,
                                           BuildInterleaved, interleave_rows)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


def test_tag_doc_bytes_vectorized():
    tbl = interleave_rows([1, 2], ["short", "x" * 100])
    tagged = tag_doc_bytes(tbl)
    vals = tagged.column("doc_bytes").to_pylist()
    assert vals[0] > 0 and vals[1] > vals[0]
    # empty spans row (untagged input: tag stage computes the column)
    empty = pa.Table.from_arrays(
        [pa.array(["d"], pa.string()), pa.array([[]], SPANS_TYPE)],
        names=["doc_id", "spans"])
    assert tag_doc_bytes(empty).column("doc_bytes").to_pylist() == [0]
    # pre-stamped input passes through untouched
    assert tag_doc_bytes(tagged) is tagged


def test_split_mega_batch_boundaries():
    spans = [{"kind": "text", "text": "a" * 100, "media_ref": "",
              "offset": i} for i in range(10)]
    tbl = pa.Table.from_arrays(
        [pa.array(["big"], pa.string()), pa.array([spans], SPANS_TYPE)],
        names=["doc_id", "spans"])
    out = split_mega_batch(tbl, part_target=250)
    # 10 * 100 bytes at 250/part -> parts of 3,3,3,1 spans
    parts = out.column("part_idx").to_pylist()
    assert parts == [0, 1, 2, 3]
    sizes = [len(s) for s in out.column("spans").to_pylist()]
    assert sum(sizes) == 10
    # never splits inside a span
    assert all(sz >= 1 for sz in sizes)


def test_end_to_end_with_mega_docs(ray_session, docs_table, tmp_path):
    import ray.data
    ds = ray.data.from_arrow(docs_table.slice(0, 60)).map_batches(
        BuildInterleaved(), batch_format="pyarrow")
    # threshold tiny so EVERY doc takes the mega path: exercises span split,
    # parse-of-parts, groupby(doc_id) reassembly and the union
    out = extract_dataset(ds, mega_threshold=100, part_target=400,
                          concurrency=(1, 2))
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert len(rows) == 60
    for r in docs_table.slice(0, 60).to_pylist():
        key = f"doc-{r['doc_id']:08d}"
        spans = rows[key]["spans_out"]
        want = re.sub(r"\s+", " ", r["text"]).strip()
        assert spans[0]["kind"] == "text" and spans[0]["text"] == want
        assert spans[1]["kind"] == "media"
        assert [s["order"] for s in spans] == list(range(len(spans)))


def test_run_extract_resume(ray_session, docs_table, tmp_path):
    from htmlreader_ray.pipelines.run import run_extract
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    tbl = interleave_rows(
        docs_table.column("doc_id").to_pylist()[:40],
        docs_table.column("text").to_pylist()[:40])
    pq.write_table(tbl, corpus_dir / "part0.parquet")
    pq.write_table(tbl, corpus_dir / "part1.parquet")
    out_dir = str(tmp_path / "out")
    files = sorted(str(p) for p in corpus_dir.iterdir())
    totals = run_extract(files, out_dir, shard_size=1)
    assert totals["shards"] == 2
    assert totals["docs"] == 80
    # resume: no work left
    totals2 = run_extract(files, out_dir, shard_size=1)
    assert totals2 == run_extract(files, out_dir, shard_size=1)
    manifest = os.path.join(out_dir, "_manifest.json")
    assert os.path.exists(manifest)


def test_run_extract_rejects_non_corpus_schema(docs_table, tmp_path):
    """A raw (doc_id, text, ...) table is not the interleaved corpus; the
    driver must fail fast with a schema error, not crash inside a UDF."""
    from htmlreader_ray.pipelines.run import run_extract
    path = tmp_path / "raw.parquet"
    pq.write_table(docs_table, path)
    with pytest.raises(ValueError, match="interleaved corpus"):
        run_extract([str(path)], str(tmp_path / "out"))


def test_extract_from_parquet_pruned_read(ray_session, docs_table, tmp_path):
    """The production read path: doc_bytes stamped at ingest, small/mega
    routing pushed into the parquet scan."""
    import re
    from htmlreader_ray.pipelines.extract_pipeline import extract_from_parquet
    corpus = interleave_rows(
        docs_table.column("doc_id").to_pylist()[:50],
        docs_table.column("text").to_pylist()[:50])
    path = tmp_path / "corpus.parquet"
    pq.write_table(corpus, path)
    out = extract_from_parquet([str(path)], mega_threshold=1200,
                               part_target=600)
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert len(rows) == 50
    for r in docs_table.slice(0, 50).to_pylist():
        key = f"doc-{r['doc_id']:08d}"
        want = re.sub(r"\s+", " ", r["text"]).strip()
        spans = rows[key]["spans_out"]
        assert spans[0]["text"] == want
        assert [s["order"] for s in spans] == list(range(len(spans)))


def test_media_decode_stage(ray_session):
    import ray.data
    from htmlreader_ray.stages.media import MediaDecode
    tbl = pa.Table.from_arrays(
        [pa.array(["d1", "d2", "d3"]),
         pa.array(["media://img/a.png", "media://aud/b.wav",
                   "media://doc/c.pdf"])],
        names=["doc_id", "media_ref"])
    ds = ray.data.from_arrow(tbl).map_batches(
        MediaDecode, fn_constructor_kwargs={}, batch_format="pyarrow",
        batch_size=16, concurrency=(1, 2))
    rows = ds.take_all()
    kinds = {r["media_ref"]: r["meta"]["media_type"] for r in rows}
    assert kinds == {"media://img/a.png": "image",
                     "media://aud/b.wav": "audio",
                     "media://doc/c.pdf": "pdf"}
    assert all(not r["meta"]["decoded"] for r in rows)


def test_media_decode_strict_raises():
    from htmlreader_ray.stages.media import MediaDecode
    with pytest.raises(NotImplementedError):
        MediaDecode(strict=True)


def test_extract_paths_equivalent(ray_session, docs_table, tmp_path):
    """extract_dataset (generic) and extract_from_parquet (pruned read)
    must produce identical span sequences."""
    import ray.data
    from htmlreader_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           extract_from_parquet)
    corpus = interleave_rows(
        docs_table.column("doc_id").to_pylist()[:40],
        docs_table.column("text").to_pylist()[:40])
    path = tmp_path / "c.parquet"
    pq.write_table(corpus, path)
    a = {r["doc_id"]: r["spans_out"]
         for r in extract_dataset(ray.data.read_parquet(str(path))).take_all()}
    b = {r["doc_id"]: r["spans_out"]
         for r in extract_from_parquet([str(path)]).take_all()}
    assert a == b


def test_extract_fused_matches_nonfused(ray_session, docs_table, tmp_path):
    """The fused read+parse path (row-group work items, default) and the
    ReadParquet->map path must produce identical span sequences, including
    when some docs route through the mega split/reassemble branch."""
    from htmlreader_ray.pipelines.extract_pipeline import extract_from_parquet
    ids = docs_table.column("doc_id").to_pylist()[:40]
    texts = docs_table.column("text").to_pylist()[:40]
    texts[3] = texts[3] * 400   # force a mega doc past a tiny threshold
    corpus = interleave_rows(ids, texts)
    path = tmp_path / "c.parquet"
    pq.write_table(corpus, path, row_group_size=7)  # several rgs per file
    kw = {"mega_threshold": 20_000, "part_target": 5_000}
    a = {r["doc_id"]: r["spans_out"]
         for r in extract_from_parquet([str(path)], **kw).take_all()}
    b = {r["doc_id"]: r["spans_out"]
         for r in extract_from_parquet([str(path)], fused=False,
                                       **kw).take_all()}
    assert a == b and len(a) == 40


def test_run_extract_resumes_after_partial_failure(ray_session, docs_table,
                                                   tmp_path):
    """A shard directory left behind by a crashed attempt is rebuilt from
    scratch; completed shards are skipped."""
    from htmlreader_ray.pipelines.run import run_extract
    from htmlreader_ray.state.manifest import RunManifest
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    tbl = interleave_rows(
        docs_table.column("doc_id").to_pylist()[:30],
        docs_table.column("text").to_pylist()[:30])
    pq.write_table(tbl, corpus_dir / "a.parquet")
    pq.write_table(tbl, corpus_dir / "b.parquet")
    out_dir = str(tmp_path / "out")
    files = sorted(str(p) for p in corpus_dir.iterdir())
    # simulate a crashed first attempt: stale partial output, no manifest row
    stale = RunManifest(out_dir).shard_output_dir("00000-a")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    totals = run_extract(files, out_dir, shard_size=1)
    assert totals["shards"] == 2 and totals["docs"] == 60
    # the stale junk file must be gone (shard rebuilt cleanly)
    assert not os.path.exists(os.path.join(stale, "junk.parquet"))


def test_io_shim_parquet_roundtrip(ray_session, docs_table, tmp_path):
    from htmlreader_ray.sources.io import (corpus_format, read_corpus,
                                           write_corpus)
    import ray.data
    assert corpus_format() in ("parquet", "lance")
    tbl = interleave_rows(
        docs_table.column("doc_id").to_pylist()[:10],
        docs_table.column("text").to_pylist()[:10])
    path = str(tmp_path / "shim_out")
    write_corpus(ray.data.from_arrow(tbl), path)
    back = read_corpus(path)
    assert back.count() == 10
    assert set(back.schema().names) >= {"doc_id", "spans", "doc_bytes"}


def test_pdf_layout_parse_stage(ray_session):
    import ray.data
    from htmlreader_ray.stages.media import PdfLayoutParse
    tbl = pa.Table.from_arrays(
        [pa.array(["d1", "d2"]),
         pa.array(["media://doc/a.pdf", "media://doc/b.pdf"])],
        names=["doc_id", "media_ref"])
    ds = ray.data.from_arrow(tbl).map_batches(
        PdfLayoutParse, fn_constructor_kwargs={}, batch_format="pyarrow",
        batch_size=16, concurrency=(1, 2))
    rows = ds.take_all()
    assert len(rows) >= 2
    for r in rows:
        assert r["kind"] in ("heading", "text", "table", "figure")
        x0, y0, x1, y1 = r["bbox"]
        assert 0 <= x0 < x1 <= 1 and 0 <= y0 < y1 <= 1.01
    # per-doc block ordering is (page, block_idx) monotone
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["page"], r["block_idx"]))
    for seq in by_doc.values():
        assert seq == sorted(seq)
    # deterministic across invocations
    rows2 = ray.data.from_arrow(tbl).map_batches(
        PdfLayoutParse, fn_constructor_kwargs={}, batch_format="pyarrow",
        concurrency=(1, 2)).take_all()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_poison_doc_skip_mode():
    """on_error='skip': a document whose extraction raises yields an empty
    span list instead of failing the batch."""
    from unittest import mock
    from htmlreader_ray.stages.parse_extract import ParseExtract
    tbl = interleave_rows([1, 2, 3], ["ok one", "ok two", "ok three"])
    pe = ParseExtract(on_error="skip")
    real = pe.extractor.extract_html

    def poisoned(html):
        if "ok two" in html:
            raise RuntimeError("poison")
        return real(html)

    # the C batch paths cannot raise — per-doc raises come from the Python
    # fallback (C bail -> Python parse), so force that path for the test
    with mock.patch.object(pe.extractor, "extract_html_many_arrow",
                           lambda arr: None), \
            mock.patch.object(pe.extractor, "extract_html_many",
                              lambda texts: None), \
            mock.patch.object(pe.extractor, "extract_html", poisoned):
        out = pe(tbl)
    ns = out.column("n_spans").to_pylist()
    assert ns[0] > 0 and ns[1] == 0 and ns[2] > 0
    assert pe.errors == 1
    # raise mode propagates
    pe2 = ParseExtract(on_error="raise")
    with mock.patch.object(pe2.extractor, "extract_html_many_arrow",
                           lambda arr: None), \
            mock.patch.object(pe2.extractor, "extract_html_many",
                              lambda texts: None), \
            mock.patch.object(pe2.extractor, "extract_html",
                              side_effect=RuntimeError("poison")):
        with pytest.raises(RuntimeError):
            pe2(tbl)


def test_mega_doc_default_thresholds(ray_session):
    """A 12 MB doc crosses the DEFAULT mega threshold (4 MB) and flows
    split->parse->reassemble with span order preserved."""
    chunk_words = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
                   "sed do eiusmod tempor incididunt ut labore ") * 2300
    spans = []
    for k in range(12):
        spans.append({"kind": "text",
                      "text": f"<article><p>part{k:02d} {chunk_words}"
                              f"</p></article>",
                      "media_ref": "", "offset": k * 2})
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"media://img/{k}.png",
                      "offset": k * 2 + 1})
    tbl = pa.Table.from_arrays(
        [pa.array(["mega-1"], pa.string()), pa.array([spans], SPANS_TYPE)],
        names=["doc_id", "spans"])
    import ray.data
    out = extract_dataset(ray.data.from_arrow(tbl)).take_all()
    assert len(out) == 1
    got = out[0]["spans_out"]
    assert len(got) == 24
    assert [s["order"] for s in got] == list(range(24))
    for k in range(12):
        assert got[2 * k]["kind"] == "text"
        assert got[2 * k]["text"].startswith(f"part{k:02d} lorem")
        assert got[2 * k + 1]["media_ref"] == f"media://img/{k}.png"
