"""Interleaved text+media document corpus (BASELINE.json ``input_hint``).

Schema:
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Deterministic builders that turn the driver's ``documents`` table (or any
(id, text) pairs) into interleaved HTML+media documents whose correct
extraction is known BY CONSTRUCTION: every template embeds the source text so
that the extraction kernel provably returns the whitespace-collapsed source
text — making the pipeline's end-to-end output verifiable against a plain SQL
oracle (``trim(regexp_replace(text,'\\s+',' ','g'))``) while still exercising
the parser surface (doctypes/quirks, misnesting + adoption agency, tables +
foster parenting, entities, RCDATA/RAWTEXT, SVG foreign content — the same
families the reference's conformance corpus stresses, SURVEY.md §5).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])
SPANS_TYPE = pa.list_(SPAN_TYPE)

CORPUS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPANS_TYPE),
    # total HTML payload bytes, stamped at ingest so downstream readers can
    # route the skew tail with parquet row-group pruning instead of a
    # second full scan (extract_from_parquet)
    ("doc_bytes", pa.int64()),
])

SPAN_OUT_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("order", pa.int32()),
])
SPANS_OUT_TYPE = pa.list_(SPAN_OUT_TYPE)


def _esc(text: str) -> str:
    """Minimal markup escape for embedding source text in generated HTML."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


_BOILER_NAV = (
    "<nav class=menu><ul><li><a href=/>Home</a><li><a href=/a>Archive</a>"
    "<li><a href=/c>Contact&nbsp;Us</a></ul></nav>"
)
_BOILER_HEAD = (
    "<header id=masthead><h1>Site &mdash; Title</h1>"
    "<script>var x = '</div>' + \"<b>\";</script>"
    "<style>.menu a { color: #f00; }</style></header>"
)
_BOILER_FOOT = (
    "<footer><p>&copy; 2026 Example <a href=/tos>Terms</a></p></footer>"
    "<aside class=sidebar><ul><li><a href=/1>Related one</a>"
    "<li><a href=/2>Related two</a></ul></aside>"
)


def build_page(doc_key: int, text: str) -> str:
    """Deterministic HTML page embedding ``text`` as the main content.

    Template family rotates on ``doc_key`` so corpora exercise quirks modes,
    adoption-agency misnesting, foster-parenting-adjacent tables, entities
    and foreign content — while extraction always returns collapse(text).
    """
    body = _esc(text)
    variant = doc_key % 5
    if variant == 0:
        main = f"<article><p>{body}</p></article>"
        doctype = "<!DOCTYPE html>"
    elif variant == 1:
        # table layout wrapper (exercises in-table modes)
        main = (f"<table class=layout><tbody><tr><td>"
                f"<article><p>{body}</p></article></td></tr></tbody></table>")
        doctype = "<!DOCTYPE html>"
    elif variant == 2:
        # misnested formatting -> adoption agency runs
        cut = len(body) // 2
        while cut < len(body) and body[cut] != " ":
            cut += 1
        # <b><i>...</b>...</i> misnesting makes the adoption agency run while
        # preserving the text content exactly
        main = (f"<article><p>{body[:cut]}<b><i>{body[cut:]}"
                f"</b></i></p></article>")
        doctype = ("<!DOCTYPE html PUBLIC "
                   '"-//W3C//DTD HTML 4.01 Transitional//EN" '
                   '"http://www.w3.org/TR/html4/loose.dtd">')
    elif variant == 3:
        # quirks mode (no doctype) + svg foreign content in removed aside
        main = (f"<div id=main><p>{body}</p>"
                f"<svg aria-hidden=true width=10><circle r=5 /></svg></div>")
        doctype = ""
    else:
        # RCDATA title + entity-heavy comments
        main = (f"<!-- decorative --- comment --><article><p>{body}</p>"
                f"</article><!--[if IE]>legacy<![endif]-->")
        doctype = "<!doctype HTML>"
    title = f"Doc {doc_key}"
    return (
        f"{doctype}<html><head><meta charset=utf-8>"
        f"<title>{title} &raquo; corpus</title></head><body>"
        f"{_BOILER_NAV}{_BOILER_HEAD}\n{main}\n{_BOILER_FOOT}</body></html>"
    )


def interleave_rows(doc_keys, texts, *, media_every: int = 1) -> pa.Table:
    """Build the interleaved corpus table from (key, text) pairs.

    Layout per doc: [text-span(html)] then, for every doc where
    ``key % media_every == 0``, a media span referencing a deterministic
    media object. (Always true with the default media_every=1, keeping the
    SQL oracle a simple UNION ALL.)
    """
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    doc_bytes: list[int] = []
    for key, text in zip(doc_keys, texts):
        key = int(key)
        spans = [{
            "kind": "text",
            "text": build_page(key, text or ""),
            "media_ref": "",
            "offset": 0,
        }]
        if media_every and key % media_every == 0:
            spans.append({
                "kind": "media",
                "text": "",
                "media_ref": f"media://img/{key:08d}.png",
                "offset": 1,
            })
        doc_ids.append(f"doc-{key:08d}")
        spans_col.append(spans)
        doc_bytes.append(sum(len(s["text"]) for s in spans))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.array(spans_col, SPANS_TYPE),
         pa.array(doc_bytes, pa.int64())],
        schema=CORPUS_SCHEMA)


def interleave_rows_multi(doc_keys, texts) -> pa.Table:
    """Multi-span layout: the document's words are split in half around a
    media span — [html(first half), media, html(second half)] — so the
    output span sequence exercises cross-span ordering. The split point
    ((n_words+1)//2) is chosen to be reproducible in plain SQL."""
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    doc_bytes: list[int] = []
    for key, text in zip(doc_keys, texts):
        key = int(key)
        words = (text or "").split()
        half = (len(words) + 1) // 2
        first = " ".join(words[:half])
        second = " ".join(words[half:])
        spans = [
            {"kind": "text", "text": build_page(key, first),
             "media_ref": "", "offset": 0},
            {"kind": "media", "text": "",
             "media_ref": f"media://img/{key:08d}.png", "offset": 1},
            {"kind": "text", "text": build_page(key + 1, second),
             "media_ref": "", "offset": 2},
        ]
        doc_ids.append(f"doc-{key:08d}")
        spans_col.append(spans)
        doc_bytes.append(sum(len(s["text"]) for s in spans))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.array(spans_col, SPANS_TYPE),
         pa.array(doc_bytes, pa.int64())],
        schema=CORPUS_SCHEMA)


class BuildInterleavedMulti:
    """map_batches callable for the multi-span corpus."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return interleave_rows_multi(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist())


class BuildInterleaved:
    """map_batches callable: documents table batch -> interleaved corpus batch.

    Stateless + vectorizable enough to run as tasks; kept as a class so the
    media cadence is configured once.
    """

    def __init__(self, media_every: int = 1, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.media_every = media_every
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        return interleave_rows(keys, texts, media_every=self.media_every)
