"""Query-surface stage callables used by __ray_entry__.py.

Each is a map_batches-shaped callable (pyarrow in/out). Classes hold
compiled state (selectors, extractors) built once per actor; plain functions
are stateless tasks. Every query here corresponds to an operator row in
SURVEY.md §2 or a training-data component; the DuckDB oracles live in
__ray_entry__.oracle_sql().
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel import (parse, parse_bytes, parse_fragment, serialize,
                      serialize_fragment)
from ..kernel.extract import Extractor
from ..kernel.selector import compile_selector
from ..sources.corpus import build_page, interleave_rows
from ..stages.parse_extract import ParseExtract


def _esc(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


from ..stages.task_cache import as_task  # re-exported for __ray_entry__


# ---------------------------------------------------------------- flagship

def explode_spans_out(batch: pa.Table) -> pa.Table:
    """(doc_id, spans_out, ...) -> one row per span. Pure Arrow kernels
    (list_flatten + parent-index take) — this runs over the FULL flagship
    output, so a per-row Python loop here would be a hot-path sin."""
    spans = batch.column("spans_out")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    ids = pc.take(batch.column("doc_id"), parent)
    return pa.Table.from_arrays(
        [ids.cast(pa.string()),
         pc.struct_field(flat, "order").cast(pa.int64()),
         pc.struct_field(flat, "kind").cast(pa.string()),
         pc.struct_field(flat, "text").cast(pa.string()),
         pc.struct_field(flat, "media_ref").cast(pa.string())],
        names=["doc_id", "span_order", "kind", "text", "media_ref"])


# ------------------------------------------------------------- parse heads

class TextContentRoundtrip:
    """M14: wrap text in a div, full parse, textContent of body."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            doc = parse(f"<div id=c>{_esc(t or '')}</div>")
            body = doc.body_element
            out.append(body.text_content if body is not None else "")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(out, pa.string())],
            names=["doc_id", "text_content"])


class SelectorCounts:
    """P1-P5 over the generated page; selectors compiled once per actor."""

    def __init__(self) -> None:
        self.sel_links = compile_selector("a[href]")
        self.sel_li = compile_selector("li")
        self.sel_p = compile_selector("p")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_links, n_li, n_p = [], [], []
        for key, t in zip(ids, texts):
            doc = parse(build_page(int(key), t or ""))
            links = li = p = 0
            for node in doc.elements_in_tree_order():
                if self.sel_links.matches(node):
                    links += 1
                if self.sel_li.matches(node):
                    li += 1
                if self.sel_p.matches(node):
                    p += 1
            n_links.append(links)
            n_li.append(li)
            n_p.append(p)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(n_links, pa.int64()),
             pa.array(n_li, pa.int64()), pa.array(n_p, pa.int64())],
            names=["doc_id", "n_links", "n_list_items", "n_paragraphs"])


def ref_links_block(doc_key: int) -> str:
    """Deterministic per-doc external-link block appended to the generated
    page for the link-graph queries: 1-3 links whose raw hrefs exercise
    every normalization rule (uppercase scheme/host, default vs explicit
    port, bare trailing '?', fragment). The SQL oracle regenerates the
    same strings from doc_id arithmetic."""
    out = []
    for j in range(doc_key % 3 + 1):
        h = (doc_key * 7 + j) % 10
        scheme = "HTTPS" if j % 2 == 0 else "http"
        port = ":443" if j % 2 == 0 else ":80"
        query = "?" if j % 3 == 2 else f"?x={doc_key % 13}"
        out.append(f'<p class=ref><a href="{scheme}://H{h}.Example.COM'
                   f'{port}/P/{j}{query}#s{j}">ref {j}</a></p>')
    return "".join(out)


class TableCells:
    """Data-table extraction through the real in-table insertion
    modes: a deterministic table (implied </tr>/</td> everywhere, a
    <th> header row, doc_id%3+4 data cells laid 2 per row) parses and
    re-emits as the (doc_id, r, c, cell) grid — the tabular-extraction
    use case (reference: HTMLReader table handling,
    Sources/HTMLParser.m in-table modes). The oracle regenerates the
    grid from doc_id arithmetic, so a broken implied end tag or a
    misplaced foster parent scrambles the coordinates."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_r, out_c, out_t = [], [], [], []
        for key in ids:
            d = int(key)
            n = d % 3 + 4
            cells = "".join(
                ("<tr>" if i % 2 == 0 else "")
                + f"<td>c{d}-{i}" for i in range(n))
            page = (f"<!DOCTYPE html><html><body><table id=t>"
                    f"<tr><th>h0<th>h1{cells}</table></body></html>")
            doc = parse(page)
            table = next(el for el in doc.elements_in_tree_order()
                         if el.tag == "table")
            r = 0
            for el in table.elements_in_tree_order():
                if el.tag == "tr":
                    c = 0
                    for cell in el.children:
                        if getattr(cell, "tag", None) in ("td", "th"):
                            out_id.append(key)
                            out_r.append(r)
                            out_c.append(c)
                            out_t.append(cell.text_content)
                            c += 1
                    r += 1
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_r, pa.int64()),
             pa.array(out_c, pa.int64()),
             pa.array(out_t, pa.string())],
            names=["doc_id", "r", "c", "cell"])


class ControlsCensus:
    """Form-control census through the :disabled CASCADE (a disabled
    <fieldset> disables its descendant controls — reference selector
    semantics, Sources/HTMLSelector.m): doc_id%3+1 inputs inside a
    fieldset disabled when doc_id is odd, a select with doc_id%4+1
    options, and a button disabled when doc_id%5==0."""

    def __init__(self) -> None:
        self.all_sel = compile_selector(
            "input, select, option, button, fieldset")
        self.dis_sel = compile_selector(":disabled")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_n, out_d = [], [], []
        for key in ids:
            d = int(key)
            fs_dis = " disabled" if d % 2 == 1 else ""
            btn_dis = " disabled" if d % 5 == 0 else ""
            inputs = "".join(f"<input id=i{j}>"
                             for j in range(d % 3 + 1))
            opts = "".join(f"<option>o{j}</option>"
                           for j in range(d % 4 + 1))
            page = (f"<!DOCTYPE html><html><body><form>"
                    f"<fieldset{fs_dis}>{inputs}</fieldset>"
                    f"<select>{opts}</select>"
                    f"<button{btn_dis}>go</button>"
                    f"</form></body></html>")
            doc = parse(page)
            n = nd = 0
            for el in doc.elements_in_tree_order():
                if self.all_sel.matches(el):
                    n += 1
                    if self.dis_sel.matches(el):
                        nd += 1
            out_id.append(key)
            out_n.append(n)
            out_d.append(nd)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_n, pa.int64()),
             pa.array(out_d, pa.int64())],
            names=["doc_id", "n_controls", "n_disabled"])


class ForeignContentCensus:
    """Foreign-content namespace census: generated pages with an SVG
    island (doc_id%2+1 circles + a text), a MathML island (mi +
    doc_id%3+1 mns + an annotation-xml text/html INTEGRATION POINT
    holding an HTML <p>) — counts per namespace prove the tree
    builder switched in and out of foreign content at the right
    places (reference foreign-content rules,
    Sources/HTMLParser.m in-foreign-content)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import MATHML_NS, SVG_NS

        ids = batch.column("doc_id").to_pylist()
        out = ([], [], [], [])
        for key in ids:
            d = int(key)
            circles = "<circle r=1 />" * (d % 2 + 1)
            mns = "".join(f"<mn>{j}</mn>" for j in range(d % 3 + 1))
            page = (f"<!DOCTYPE html><html><body>"
                    f"<svg viewBox=\"0 0 1 1\">{circles}"
                    f"<text>t</text></svg>"
                    f"<math><mi>x</mi>{mns}"
                    f"<annotation-xml encoding=\"text/html\">"
                    f"<p>ip</p></annotation-xml></math>"
                    f"</body></html>")
            doc = parse(page)
            n_svg = n_math = n_p = 0
            for el in doc.elements_in_tree_order():
                if el.namespace == SVG_NS:
                    n_svg += 1
                elif el.namespace == MATHML_NS:
                    n_math += 1
                elif el.tag == "p":
                    n_p += 1
            out[0].append(key)
            out[1].append(n_svg)
            out[2].append(n_math)
            out[3].append(n_p)
        return pa.Table.from_arrays(
            [pa.array(out[0], pa.int64()),
             pa.array(out[1], pa.int64()),
             pa.array(out[2], pa.int64()),
             pa.array(out[3], pa.int64())],
            names=["doc_id", "n_svg", "n_math", "n_html_ip"])


class ScriptingFlagDiff:
    """The scripting-flag semantics as a graded diff: <noscript> is
    RAWTEXT when scripting is on (reference parity,
    Sources/HTMLParser.m:500/914) but parses its children when off —
    the same page parsed both ways must differ by exactly the
    construction-known element count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_on, out_off = [], [], []
        for key in ids:
            d = int(key)
            extra = "<em>e</em>" * (d % 3)
            page = (f"<!DOCTYPE html><html><body><noscript>"
                    f"<p>a</p><span>b</span>{extra}"
                    f"</noscript></body></html>")
            n_on = sum(1 for _ in parse(
                page, scripting=True).elements_in_tree_order())
            n_off = sum(1 for _ in parse(
                page, scripting=False).elements_in_tree_order())
            out_id.append(key)
            out_on.append(n_on)
            out_off.append(n_off)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_on, pa.int64()),
             pa.array(out_off, pa.int64())],
            names=["doc_id", "n_elems_on", "n_elems_off"])


class TemplateCensus:
    """<template> parse census — the IN TEMPLATE insertion mode lets
    bare <li> live directly under template content (no implied <ul>,
    no foster move) while the sibling real list behaves normally.
    The reference SKIPS template.dat; this repo implements it, and
    this query pins it through the graded gate: (doc_id, n_tpl_items
    = d%3+1, n_list_items = d%2+1), classified by nearest-template
    ancestry."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_t, out_l = [], [], []
        for key in ids:
            d = int(key)
            tpl = "<li>t</li>" * (d % 3 + 1)
            real = "<li>r</li>" * (d % 2 + 1)
            page = (f"<!DOCTYPE html><html><body>"
                    f"<template>{tpl}</template>"
                    f"<ul>{real}</ul></body></html>")
            doc = parse(page)
            n_t = n_l = 0
            for el in doc.elements_in_tree_order():
                if el.tag != "li":
                    continue
                p, in_tpl = el.parent, False
                while p is not None:
                    if getattr(p, "tag", None) == "template":
                        in_tpl = True
                        break
                    p = p.parent
                if in_tpl:
                    n_t += 1
                else:
                    n_l += 1
            out_id.append(key)
            out_t.append(n_t)
            out_l.append(n_l)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_t, pa.int64()),
             pa.array(out_l, pa.int64())],
            names=["doc_id", "n_tpl_items", "n_list_items"])


_ENTITY_CASES = ("&notit;", "&#x110000;", "&#0;", "&amp;lt;",
                 "&Uuml", "&copy=Z")


class EntityEdgeCases:
    """Char-ref decoder edge branches through the graded gate: legacy
    no-semicolon longest-prefix matches (&notit; → ¬it;, &Uuml → Ü,
    &copy=Z → ©=Z in TEXT context), out-of-range and NUL numeric refs
    (→ U+FFFD), and double-escaping (&amp;lt; → literal &lt;) —
    reference entity table semantics (Sources/HTMLTokenizer.m
    character-reference state)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_t = [], []
        for key in ids:
            case = _ENTITY_CASES[int(key) % len(_ENTITY_CASES)]
            doc = parse(f"<!DOCTYPE html><html><body><p>X{case}Y</p>"
                        f"</body></html>")
            p = next(el for el in doc.elements_in_tree_order()
                     if el.tag == "p")
            out_id.append(key)
            out_t.append(p.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_t, pa.string())],
            names=["doc_id", "decoded"])


_AAA_CASES = ("<p>1<b>2<i>3</b>4</i>5</p>",
              "<b><p>x</b>y</p>",
              "<a>1<p>2<a>3</p>")


class AdoptionCensus:
    """Adoption-agency node-multiplication census: the three classic
    misnesting shapes (formatting split, block-in-formatting clone,
    nested <a>) cycled per doc; the resulting element counts are
    spec-determined (i splits to 2, b clones to 2, a triples) —
    reference adoption agency, Sources/HTMLParser.m:1422."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_b", "n_i", "n_a", "n_p")}
        for key in ids:
            case = _AAA_CASES[int(key) % 3]
            doc = parse(f"<!DOCTYPE html><html><body>{case}"
                        f"</body></html>")
            cnt = {"b": 0, "i": 0, "a": 0, "p": 0}
            for el in doc.elements_in_tree_order():
                if el.tag in cnt:
                    cnt[el.tag] += 1
            cols["doc_id"].append(key)
            cols["n_b"].append(cnt["b"])
            cols["n_i"].append(cnt["i"])
            cols["n_a"].append(cnt["a"])
            cols["n_p"].append(cnt["p"])
        return pa.Table.from_arrays(
            [pa.array(cols[k], pa.int64()) for k in
             ("doc_id", "n_b", "n_i", "n_a", "n_p")],
            names=["doc_id", "n_b", "n_i", "n_a", "n_p"])


class RawtextPayloadLen:
    """RAWTEXT fidelity through the gate: script/style bodies with
    embedded fake end tags ('</b>', CSS comments) must survive
    verbatim — lengths are construction-known (17 + d%7 script,
    8 + d%5 style). Reference RAWTEXT/script-data states,
    Sources/HTMLTokenizer.m."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_s, out_c = [], [], []
        for key in ids:
            d = int(key)
            sbody = 'var a = "</b>";//' + "x" * (d % 7)
            cbody = ".c{}/*" + "y" * (d % 5) + "*/"
            page = (f"<!DOCTYPE html><html><head>"
                    f"<script>{sbody}</script>"
                    f"<style>{cbody}</style>"
                    f"</head><body>z</body></html>")
            doc = parse(page)
            sl = cl = -1
            for el in doc.elements_in_tree_order():
                if el.tag == "script":
                    sl = len(el.text_content)
                elif el.tag == "style":
                    cl = len(el.text_content)
            out_id.append(key)
            out_s.append(sl)
            out_c.append(cl)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_s, pa.int64()),
             pa.array(out_c, pa.int64())],
            names=["doc_id", "script_len", "style_len"])


_ATTR_CASES = (
    ("<div a=1 a=2 b c='3'>x</div>", "div"),
    ("<div x=a/b y=c&amp;d z>x</div>", "div"),
    ("<br/ ><input checked>", "input"),
    ("<div A=UP aB=2>x</div>", "div"),
)


class AttrEdgeCensus:
    """Attribute-tokenizer edge census: duplicate attribute (FIRST
    wins), empty/boolean values, '/' inside an unquoted value,
    entity decoding in values, self-closing solidus on a void, and
    ASCII-only name folding — reference attribute states,
    Sources/HTMLTokenizer.m:193-201. Emits the parsed attribute dict
    as a sorted k=v CSV per cycled case."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_csv = [], []
        for key in ids:
            frag, want = _ATTR_CASES[int(key) % len(_ATTR_CASES)]
            doc = parse(f"<!DOCTYPE html><html><body>{frag}"
                        f"</body></html>")
            el = next(e for e in doc.elements_in_tree_order()
                      if e.tag == want)
            csv = ",".join(f"{k}={v}" for k, v in
                           sorted(el.attrs.items()))
            out_id.append(key)
            out_csv.append(csv)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_csv, pa.string())],
            names=["doc_id", "attrs_csv"])


_REL_CASES = ("a/b.html", "../x", "/abs", "?q=1", "#frag")


class BaseHrefResolve:
    """Relative-URL resolution against the document's <base href> —
    the link-pipeline step after extraction: the base element is
    located through the real parser (head parsing), each relative
    form (path, dot-dot, absolute path, query-only, fragment-only)
    resolves per RFC 3986 (stdlib urljoin). Base host varies by
    doc_id%5; oracle regenerates the resolved strings."""

    def __init__(self) -> None:
        self.sel = compile_selector("base[href]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from urllib.parse import urljoin

        ids = batch.column("doc_id").to_pylist()
        out_id, out_rel, out_res = [], [], []
        for key in ids:
            k = int(key) % 5
            page = (f"<!DOCTYPE html><html><head>"
                    f'<base href="https://b{k}.example.com/dir/sub/">'
                    f"</head><body>x</body></html>")
            doc = parse(page)
            base = next(el for el in doc.elements_in_tree_order()
                        if self.sel.matches(el))
            href = base.attrs.get("href", "")
            for rel in _REL_CASES:
                out_id.append(key)
                out_rel.append(rel)
                out_res.append(urljoin(href, rel))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_rel, pa.string()),
             pa.array(out_res, pa.string())],
            names=["doc_id", "rel", "resolved"])


class SrcsetCandidates:
    """srcset candidate parsing — the responsive-image selection
    input of an image-pipeline: per doc an <img srcset> with three
    candidates (1x, (d%3+2)x, 640w) parses through the real
    attribute tokenizer and splits into (url, descriptor) rows."""

    def __init__(self) -> None:
        self.sel = compile_selector("img[srcset]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_u, out_d = [], [], []
        for key in ids:
            d = int(key)
            srcset = (f"img{d}-a.jpg 1x, img{d}-b.jpg {d % 3 + 2}x, "
                      f"img{d}-c.jpg 640w")
            page = (f"<!DOCTYPE html><html><body>"
                    f'<img srcset="{srcset}" alt=x>'
                    f"</body></html>")
            doc = parse(page)
            img = next(el for el in doc.elements_in_tree_order()
                       if self.sel.matches(el))
            for cand in img.attrs.get("srcset", "").split(","):
                parts = cand.split()
                out_id.append(key)
                out_u.append(parts[0])
                out_d.append(parts[1] if len(parts) > 1 else "")
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_u, pa.string()),
             pa.array(out_d, pa.string())],
            names=["doc_id", "url", "descriptor"])


_ROBOTS_CASES = ("index, follow", "noindex", "nofollow",
                 "noindex, nofollow", "NOINDEX,NoFollow")


class MetaRobotsFlags:
    """Page-level crawl-directive extraction (the curation gate that
    keeps noindex pages out of a corpus): <meta name=robots> content
    parses through the real head parser, directives split on commas,
    ASCII-case-insensitively matched."""

    def __init__(self) -> None:
        self.sel = compile_selector('meta[name="robots"]')

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_ni, out_nf = [], [], []
        for key in ids:
            content = _ROBOTS_CASES[int(key) % len(_ROBOTS_CASES)]
            page = (f"<!DOCTYPE html><html><head>"
                    f'<meta name=robots content="{content}">'
                    f"</head><body>x</body></html>")
            doc = parse(page)
            meta = next(el for el in doc.elements_in_tree_order()
                        if self.sel.matches(el))
            toks = [t.strip().lower() for t in
                    meta.attrs.get("content", "").split(",")]
            out_id.append(key)
            out_ni.append(1 if "noindex" in toks else 0)
            out_nf.append(1 if "nofollow" in toks else 0)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_ni, pa.int64()),
             pa.array(out_nf, pa.int64())],
            names=["doc_id", "noindex", "nofollow"])


class OpenGraphExtract:
    """Social-card metadata extraction: og:title / og:image meta
    properties located by attribute selector through the real
    parser (entity decoding included: the title embeds &amp;)."""

    def __init__(self) -> None:
        self.sel_t = compile_selector('meta[property="og:title"]')
        self.sel_i = compile_selector('meta[property="og:image"]')

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_t, out_i = [], [], []
        for key in ids:
            d = int(key)
            page = (f"<!DOCTYPE html><html><head>"
                    f'<meta property="og:title" '
                    f'content="Doc {d} &amp; more">'
                    f'<meta property="og:image" '
                    f'content="https://img.example.com/{d % 100}.png">'
                    f"</head><body>x</body></html>")
            doc = parse(page)
            title = image = ""
            for el in doc.elements_in_tree_order():
                if self.sel_t.matches(el):
                    title = el.attrs.get("content", "")
                elif self.sel_i.matches(el):
                    image = el.attrs.get("content", "")
            out_id.append(key)
            out_t.append(title)
            out_i.append(image)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_t, pa.string()),
             pa.array(out_i, pa.string())],
            names=["doc_id", "og_title", "og_image"])


class AnchorDepths:
    """Anchor tree-DEPTH census over the generated pages: for every
    a[href] count its Element ancestors and emit the per-doc
    (depth, n_anchors) histogram. By construction the depths are
    template-constant — nav/aside anchors sit at depth 5
    (a<li<ul<nav|aside<body<html), the footer Terms link at 4, and the
    ref-block links at 3 with multiplicity doc_id%3+1 — so the oracle
    is a pure UNION ALL over doc_id arithmetic while the value still
    crosses the real tokenizer + tree builder (implied <li> end tags,
    quirks-mode variants)."""

    def __init__(self) -> None:
        self.sel = compile_selector("a[href]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Element

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_depth, out_n = [], [], []
        for key, t in zip(ids, texts):
            page = build_page(int(key), t or "").replace(
                "</body>", ref_links_block(int(key)) + "</body>")
            doc = parse(page)
            counts: dict = {}
            for node in doc.elements_in_tree_order():
                if self.sel.matches(node):
                    d = 0
                    p = node.parent
                    while isinstance(p, Element):
                        d += 1
                        p = p.parent
                    counts[d] = counts.get(d, 0) + 1
            for d in sorted(counts):
                out_id.append(key)
                out_depth.append(d)
                out_n.append(counts[d])
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_depth, pa.int64()),
             pa.array(out_n, pa.int64())],
            names=["doc_id", "depth", "n_anchors"])


class ListNestingCensus:
    """Nested-list census through implied </li> end tags: each page is
    D = doc_id%3+1 <ul> levels deep with k = doc_id%2+2 items per
    level and NO </li> anywhere — the in-body "<li> start tag closes
    an open <li>" rule (reference: Sources/HTMLParser.m li handling)
    is what keeps same-level items siblings, and the nested <ul> rides
    inside the LAST item of each level. The oracle regenerates every
    figure from doc_id arithmetic: a broken implied-end-tag path
    chains li-in-li and shifts leaf_depth; a broken nesting path
    shifts max_list_depth; a foster-parenting bug moves leaf_text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Element

        ids = batch.column("doc_id").to_pylist()
        out_id, out_nli, out_mld = [], [], []
        out_leafd, out_txt = [], []
        for key in ids:
            d = int(key)
            levels = d % 3 + 1
            k = d % 2 + 2
            parts = []
            for lvl in range(levels):
                items = "".join(f"<li>L{lvl}i{j}"
                                for j in range(k - 1))
                parts.append(f"<ul>{items}<li>")
            page = ("<!DOCTYPE html><html><body>"
                    + "".join(parts) + f"leaf{d}"
                    + "</ul>" * levels + "</body></html>")
            doc = parse(page)
            n_li = max_ul = leaf_depth = 0
            leaf_text = ""
            for el in doc.elements_in_tree_order():
                if el.tag != "li":
                    continue
                n_li += 1
                uls = depth = 0
                p = el.parent
                while isinstance(p, Element):
                    depth += 1
                    if p.tag in ("ul", "ol"):
                        uls += 1
                    p = p.parent
                if uls >= max_ul:
                    # tree order: the LAST li at max list depth is the
                    # leaf item carrying the text payload
                    max_ul = uls
                    leaf_depth = depth
                    leaf_text = el.text_content
            out_id.append(key)
            out_nli.append(n_li)
            out_mld.append(max_ul)
            out_leafd.append(leaf_depth)
            out_txt.append(leaf_text)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_nli, pa.int64()),
             pa.array(out_mld, pa.int64()),
             pa.array(out_leafd, pa.int64()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "n_li", "max_list_depth",
                   "leaf_depth", "leaf_text"])


class PCloseCensus:
    """<p>-implied-close census: m = doc_id%4+2 consecutive <p> tags
    (each closes its predecessor), then an <h2> (headings close an
    open p), then one more <p> closed by a <div> — the in-body
    "element that closes a p in button scope" family (reference:
    Sources/HTMLParser.m in-body p handling). A parser that nests
    instead of closing changes n_body_children and the div/h2 no
    longer sit as body siblings; the oracle is doc_id arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Element

        ids = batch.column("doc_id").to_pylist()
        out_id, out_np, out_nb, out_lp, out_dv = [], [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 4 + 2
            ps = "".join(f"<p>t{d}-{j}" for j in range(m))
            page = (f"<!DOCTYPE html><html><body>{ps}"
                    f"<h2>tail{d}</h2><p>open{d}"
                    f"<div>inside{d}</div></body></html>")
            doc = parse(page)
            n_p = 0
            last_p = div_text = ""
            n_body = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    n_p += 1
                    last_p = el.text_content
                elif el.tag == "div":
                    div_text = el.text_content
                elif el.tag == "body":
                    n_body = sum(1 for c in el.children
                                 if isinstance(c, Element))
            out_id.append(key)
            out_np.append(n_p)
            out_nb.append(n_body)
            out_lp.append(last_p)
            out_dv.append(div_text)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_np, pa.int64()),
             pa.array(out_nb, pa.int64()),
             pa.array(out_lp, pa.string()),
             pa.array(out_dv, pa.string())],
            names=["doc_id", "n_p", "n_body_children",
                   "last_p_text", "div_text"])


class AfeReconstructCensus:
    """Active-formatting-element RECONSTRUCTION census (distinct from
    the adoption-agency misnesting census): <p><b><i> opened once,
    then m = doc_id%3+1 paragraphs each CLOSED with </p> — popping p
    removes the open b/i from the stack while the AFE list keeps
    them, so every later paragraph's text must re-clone b>i
    (reference: HTMLReader AFE reconstruction,
    Sources/HTMLParser.m). The stray </b> then removes only b from
    the AFE list (adoption agency's not-in-stack early exit) so the
    trailing body text reconstructs i ALONE. Expected per doc:
    n_b = m, n_i = m+1, the last i holds the tail text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_b, out_i, out_t = [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            ps = f"<p><b><i>w{d}-0</p>" + "".join(
                f"<p>w{d}-{j}</p>" for j in range(1, m))
            page = (f"<!DOCTYPE html><html><body>{ps}</b>"
                    f"tail{d}</body></html>")
            doc = parse(page)
            nb = ni = 0
            last_i = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "b":
                    nb += 1
                elif el.tag == "i":
                    ni += 1
                    last_i = el.text_content
            out_id.append(key)
            out_b.append(nb)
            out_i.append(ni)
            out_t.append(last_i)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_b, pa.int64()),
             pa.array(out_i, pa.int64()),
             pa.array(out_t, pa.string())],
            names=["doc_id", "n_b", "n_i", "last_i_text"])


class PreNewlineCensus:
    """The leading-newline-drop rule: a newline immediately after
    <pre> or <textarea> is skipped by the tree builder (reference:
    HTMLReader pre/textarea handling per WHATWG). Pages alternate a
    leading newline by doc_id parity; the oracle regenerates the
    exact text both ways, so a parser that drops the newline
    unconditionally (or never) diverges on half the corpus."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_pre, out_ta, out_len = [], [], [], []
        for key in ids:
            d = int(key)
            nl = "\n" if d % 2 == 0 else ""
            page = (f"<!DOCTYPE html><html><body>"
                    f"<pre>{nl}A{d}\nB</pre>"
                    f"<textarea>{nl}T{d}</textarea></body></html>")
            doc = parse(page)
            pre = ta = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "pre":
                    pre = el.text_content
                elif el.tag == "textarea":
                    ta = el.text_content
            out_id.append(key)
            out_pre.append(pre)
            out_ta.append(ta)
            out_len.append(len(pre))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_pre, pa.string()),
             pa.array(out_ta, pa.string()),
             pa.array(out_len, pa.int64())],
            names=["doc_id", "pre_text", "ta_text", "pre_len"])


class SvgCaseAdjustCensus:
    """Foreign-content case ADJUSTMENT census: SVG child tags and
    attributes whose spec-canonical form is camelCase must be
    adjusted from their lowercased tokenizer form (reference:
    HTMLReader foreign-content tag/attribute adjustment tables,
    Sources/HTMLParser.m; kernel/constants.py mirrors the WHATWG
    tables). Pages cycle five adjusted tags and five adjusted
    attributes by doc_id%5; the oracle regenerates the canonical
    names, so a parser that skips the adjustment tables (or applies
    them outside foreign content) diverges on every row."""

    TAGS = ["textpath", "foreignobject", "lineargradient",
            "clippath", "feblend"]
    TAGS_ADJ = ["textPath", "foreignObject", "linearGradient",
                "clipPath", "feBlend"]
    ATTRS = ["preserveaspectratio", "patternunits",
             "gradienttransform", "stddeviation", "viewbox"]
    ATTRS_ADJ = ["preserveAspectRatio", "patternUnits",
                 "gradientTransform", "stdDeviation", "viewBox"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_tag, out_an, out_av = [], [], [], []
        for key in ids:
            d = int(key)
            raw_t = self.TAGS[d % 5]
            raw_a = self.ATTRS[d % 5]
            page = (f"<!DOCTYPE html><html><body>"
                    f"<svg {raw_a}=\"v{d}\">"
                    f"<{raw_t}>x</{raw_t}></svg></body></html>")
            doc = parse(page)
            child_tag = attr_name = attr_val = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "svg":
                    for k, v in el.attrs.items():
                        attr_name, attr_val = k, v
                elif el.tag not in ("html", "head", "body"):
                    child_tag = el.tag
            out_id.append(key)
            out_tag.append(child_tag)
            out_an.append(attr_name)
            out_av.append(attr_val)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_tag, pa.string()),
             pa.array(out_an, pa.string()),
             pa.array(out_av, pa.string())],
            names=["doc_id", "child_tag", "attr_name", "attr_value"])


class CdataForeignCensus:
    """CDATA-section dichotomy: <![CDATA[...]]> is character data ONLY
    inside foreign content (markup and entity refs stay literal); in
    HTML content it is a BOGUS COMMENT whose data keeps the
    '[CDATA[..]]' wrapper (reference: HTMLReader tokenizer CDATA
    handling per WHATWG; Sources/HTMLTokenizer.m). Each page carries
    one of each plus a marker comment; the oracle regenerates the
    svg text (with literal '<x>' and '&amp;'), the bogus-comment
    data, and the comment count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Comment

        ids = batch.column("doc_id").to_pylist()
        out_id, out_svg, out_bog, out_nc = [], [], [], []
        for key in ids:
            d = int(key)
            page = (f"<!DOCTYPE html><html><body>"
                    f"<svg><![CDATA[c{d} <x> &amp;]]></svg>"
                    f"<![CDATA[h{d}]]><!--m{d}--></body></html>")
            doc = parse(page)
            svg_text = bogus = ""
            n_comments = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "svg":
                    svg_text = el.text_content
            for node in doc.tree_order():
                if isinstance(node, Comment):
                    n_comments += 1
                    if node.data.startswith("[CDATA["):
                        bogus = node.data
            out_id.append(key)
            out_svg.append(svg_text)
            out_bog.append(bogus)
            out_nc.append(n_comments)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_svg, pa.string()),
             pa.array(out_bog, pa.string()),
             pa.array(out_nc, pa.int64())],
            names=["doc_id", "svg_text", "bogus_comment",
                   "n_comments"])


class SelectScopeCensus:
    """The 'in select' insertion mode through the real parser
    (reference: HTMLReader tree construction per WHATWG; option
    auto-close, optgroup pops option, and the two select-scope exits):
    even docs append <input> inside the select — the spec treats it
    as </select> then reprocesses, so the input and the <i> tail
    land as BODY siblings; odd docs nest a second <select>, which
    acts as a bare </select> (NOT reprocessed), leaving the next
    <option> at body level. Option counts, body child counts, the
    input's value attr, and the last body child's text are all
    arithmetic in doc_id, so the oracle regenerates them."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_no, out_nb, out_iv, out_lt = [], [], [], [], []
        for key in ids:
            d = int(key)
            if d % 2 == 0:
                m = d % 3 + 1
                opts = "".join(f"<option>o{d}_{i}" for i in range(m))
                page = (f"<!DOCTYPE html><html><body>"
                        f"<select>{opts}<optgroup><option>g{d}"
                        f"<input value=\"v{d}\"><i>tail{d}</i>"
                        f"</body></html>")
            else:
                page = (f"<!DOCTYPE html><html><body>"
                        f"<select><option>a{d}<select><option>b{d}"
                        f"</body></html>")
            doc = parse(page)
            n_options = 0
            input_value = ""
            body = None
            for el in doc.elements_in_tree_order():
                if el.tag == "option":
                    n_options += 1
                elif el.tag == "input":
                    input_value = el.attrs.get("value", "")
                elif el.tag == "body":
                    body = el
            kids = [c for c in body.children
                    if hasattr(c, "tag")]
            out_id.append(key)
            out_no.append(n_options)
            out_nb.append(len(kids))
            out_iv.append(input_value)
            out_lt.append(kids[-1].text_content if kids else "")
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_no, pa.int64()),
             pa.array(out_nb, pa.int64()),
             pa.array(out_iv, pa.string()),
             pa.array(out_lt, pa.string())],
            names=["doc_id", "n_options", "n_body_children",
                   "input_value", "last_text"])


class RubyImpliedCensus:
    """Ruby-annotation implied end tags through the real parser
    (reference: HTMLReader tree construction per WHATWG 'in body'
    rb/rt/rtc/rp rules): each <rb>/<rt> start tag generates implied
    end tags for the open one, <rp> closes the trailing <rt>, and
    </ruby> closes <rp> — so m=(d%3+1) rb/rt pairs plus one rp end
    up as 2m+1 FLAT children of <ruby>, never nested. Counts and
    texts are arithmetic in doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_rb, out_kids, out_rp, out_tail = [], [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            pairs = "".join(f"<rb>b{d}_{i}<rt>t{d}_{i}"
                            for i in range(m))
            page = (f"<!DOCTYPE html><html><body>"
                    f"<ruby>{pairs}<rp>p{d}</ruby>"
                    f"<span>s{d}</span></body></html>")
            doc = parse(page)
            n_rb = 0
            ruby_kids = 0
            rp_text = tail = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "rb":
                    n_rb += 1
                elif el.tag == "ruby":
                    ruby_kids = sum(1 for c in el.children
                                    if hasattr(c, "tag"))
                elif el.tag == "rp":
                    rp_text = el.text_content
                elif el.tag == "span":
                    tail = el.text_content
            out_id.append(key)
            out_rb.append(n_rb)
            out_kids.append(ruby_kids)
            out_rp.append(rp_text)
            out_tail.append(tail)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_rb, pa.int64()),
             pa.array(out_kids, pa.int64()),
             pa.array(out_rp, pa.string()),
             pa.array(out_tail, pa.string())],
            names=["doc_id", "n_rb", "n_ruby_children", "rp_text",
                   "tail_text"])


class PlaintextCensus:
    """The <plaintext> one-way door through the real tokenizer
    (reference: HTMLReader tokenizer PLAINTEXT state per WHATWG):
    the start tag closes the open <p>, then EVERYTHING to EOF —
    tags, entity refs, even </body></html> — is literal character
    data with no decoding and no end tag. The oracle regenerates the
    swallowed text (including the literal '&amp;' and the trailing
    '</body></html>') by string concat."""

    SUFFIX = " <b>not-a-tag</b> &amp; literal</body></html>"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_pt, out_p, out_nb = [], [], [], []
        for key in ids:
            d = int(key)
            page = (f"<!DOCTYPE html><html><body><p>pre{d}"
                    f"<plaintext>raw{d}{self.SUFFIX}")
            doc = parse(page)
            pt = ptxt = ""
            n_body = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "plaintext":
                    pt = el.text_content
                elif el.tag == "p":
                    ptxt = el.text_content
                elif el.tag == "body":
                    n_body = sum(1 for c in el.children
                                 if hasattr(c, "tag"))
            out_id.append(key)
            out_pt.append(pt)
            out_p.append(ptxt)
            out_nb.append(n_body)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_pt, pa.string()),
             pa.array(out_p, pa.string()),
             pa.array(out_nb, pa.int64())],
            names=["doc_id", "plaintext_text", "p_text",
                   "n_body_children"])


class VoidOddityCensus:
    """Void-element oddities through the real parser (reference:
    HTMLReader tree construction per WHATWG 'in body'): an <image>
    start tag is RENAMED to img and reprocessed (no image element
    ever exists), an </br> END tag inserts a <br> element, and <wbr>
    is a void insert — so m=(d%3+1) </br>s become m real <br>
    children and the text runs merge around them. Counts and the
    img src are arithmetic in doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_src, out_br, out_img_bad, out_txt = \
            [], [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            brs = "</br>" * m
            page = (f"<!DOCTYPE html><html><body>"
                    f"<image src=\"i{d}.png\">x{d}{brs}<wbr>tail{d}"
                    f"</body></html>")
            doc = parse(page)
            src = ""
            n_br = n_image = 0
            body_text = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "img":
                    src = el.attrs.get("src", "")
                elif el.tag == "br":
                    n_br += 1
                elif el.tag == "image":
                    n_image += 1
                elif el.tag == "body":
                    body_text = el.text_content
            out_id.append(key)
            out_src.append(src)
            out_br.append(n_br)
            out_img_bad.append(n_image)
            out_txt.append(body_text)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_src, pa.string()),
             pa.array(out_br, pa.int64()),
             pa.array(out_img_bad, pa.int64()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "img_src", "n_br", "n_image_tags",
                   "body_text"])


class FramesetCensus:
    """Frameset documents and the frameset-ok flag through the real
    parser (reference: HTMLParser.m 'after head'/'in body' frameset
    arms, incl. the line-593 subtlety that an EXPLICIT <body> start
    tag sets frameset-ok to not-ok): v0 is a real frameset doc
    (nested frameset, two frames, noframes RAWTEXT kept literal);
    v1 has an explicit <body> so a later <frameset> is ignored even
    though only whitespace-ish text ran; v2 has NO body tag, so the
    frameset replaces the implied body. Counts/texts arithmetic in
    doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_nf, out_body, out_nft, out_src = [], [], [], [], []
        for key in ids:
            d = int(key)
            v = d % 3
            if v == 0:
                page = (f"<!DOCTYPE html><html>"
                        f"<frameset cols=\"50%,50%\">"
                        f"<frame src=\"a{d}.html\">"
                        f"<frameset rows=\"2\">"
                        f"<frame src=\"b{d}.html\"></frameset>"
                        f"<noframes>nf{d} <i>raw</i></noframes>"
                        f"</frameset></html>")
            elif v == 1:
                page = (f"<!DOCTYPE html><html><body>tx{d}"
                        f"<frameset><frame src=\"c{d}.html\">"
                        f"</frameset></body></html>")
            else:
                page = (f"<!DOCTYPE html><html> "
                        f"<frameset><frame src=\"c{d}.html\">"
                        f"</frameset></html>")
            doc = parse(page)
            n_frames = has_body = 0
            nf_text = first_src = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "frame":
                    n_frames += 1
                    if not first_src:
                        first_src = el.attrs.get("src", "")
                elif el.tag == "body":
                    has_body = 1
                elif el.tag == "noframes":
                    nf_text = el.text_content
            out_id.append(key)
            out_nf.append(n_frames)
            out_body.append(has_body)
            out_nft.append(nf_text)
            out_src.append(first_src)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_nf, pa.int64()),
             pa.array(out_body, pa.int64()),
             pa.array(out_nft, pa.string()),
             pa.array(out_src, pa.string())],
            names=["doc_id", "n_frames", "has_body", "noframes_text",
                   "first_frame_src"])


class DdDtImpliedCensus:
    """Definition-list implied end tags through the real parser
    (reference: HTMLParser.m dd/dt 'frame' loop per WHATWG): <dt> and
    <dd> close the open one even THROUGH intervening non-special
    containers — the final <dt> here closes a dd holding an open
    <div> — and </dl> generates the last implied close. m=(d%3+1)
    dt/dd pairs plus an extra dd(div) and a closing dt land flat:
    n_dt = m+1, dl children = 2m+2, the div stays nested in its dd.
    All arithmetic in doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_dt, out_kids, out_par, out_last = [], [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            items = "".join(f"<dt>t{d}_{i}<dd>d{d}_{i}"
                            for i in range(m))
            page = (f"<!DOCTYPE html><body><dl>{items}"
                    f"<dd><div>x{d}<dt>last{d}</dl>tail{d}</body>")
            doc = parse(page)
            n_dt = 0
            dl_kids = 0
            div_parent = last_dt = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "dt":
                    n_dt += 1
                    last_dt = el.text_content
                elif el.tag == "dl":
                    dl_kids = sum(1 for c in el.children
                                  if hasattr(c, "tag"))
                elif el.tag == "div":
                    div_parent = el.parent.tag
            out_id.append(key)
            out_dt.append(n_dt)
            out_kids.append(dl_kids)
            out_par.append(div_parent)
            out_last.append(last_dt)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_dt, pa.int64()),
             pa.array(out_kids, pa.int64()),
             pa.array(out_par, pa.string()),
             pa.array(out_last, pa.string())],
            names=["doc_id", "n_dt", "n_dl_children", "div_parent",
                   "last_dt_text"])


class DuplicateAttrCensus:
    """Attribute-parsing corners through the real tokenizer
    (reference: HTMLTokenizer.m attribute accumulation): duplicate
    attribute names are DROPPED (first occurrence wins), names fold
    ASCII-case (CLASS/DATA-X), a value-less attribute yields the
    empty string, and attributes on an END tag are ignored entirely.
    The surviving attr dict is fully arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {k: [] for k in ("doc_id", "id_value", "class_value",
                               "datax_value", "checked_value",
                               "n_attrs", "text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<div checked id="first{d}" id="second{d}" '
                    f'CLASS="c{d}" class="dup" DATA-X="u{d}">t{d}'
                    f'</div id="end{d}">')
            doc = parse(page)
            for el in doc.elements_in_tree_order():
                if el.tag == "div":
                    out["doc_id"].append(key)
                    out["id_value"].append(el.attrs.get("id", "?"))
                    out["class_value"].append(
                        el.attrs.get("class", "?"))
                    out["datax_value"].append(
                        el.attrs.get("data-x", "?"))
                    out["checked_value"].append(
                        el.attrs.get("checked", "?"))
                    out["n_attrs"].append(len(el.attrs))
                    out["text"].append(el.text_content)
        return pa.Table.from_arrays(
            [pa.array(out["doc_id"], pa.int64()),
             pa.array(out["id_value"], pa.string()),
             pa.array(out["class_value"], pa.string()),
             pa.array(out["datax_value"], pa.string()),
             pa.array(out["checked_value"], pa.string()),
             pa.array(out["n_attrs"], pa.int64()),
             pa.array(out["text"], pa.string())],
            names=["doc_id", "id_value", "class_value", "datax_value",
                   "checked_value", "n_attrs", "text"])


_C1_CASES = ("&#128;", "&#x80;", "&#150;", "&#158;", "&#x9F;",
             "&#xD800;", "&#x1F600;")


class C1CharrefCensus:
    """Numeric character-reference remapping through the real
    tokenizer (reference: HTMLTokenizer.m numeric-reference state per
    WHATWG): C1-control codepoints 0x80-0x9F remap through the
    Windows-1252 table (128→€, 150→–, 158→ž, 0x9F→Ÿ), surrogates
    collapse to U+FFFD, and astral refs (&#x1F600;) decode directly —
    in BOTH text and attribute-value context. The oracle regenerates
    the decoded char with chr() per doc_id%7."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_txt, out_attr = [], [], []
        for key in ids:
            case = _C1_CASES[int(key) % len(_C1_CASES)]
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<p title="A{case}B">X{case}Y</p>')
            p = next(el for el in doc.elements_in_tree_order()
                     if el.tag == "p")
            out_id.append(key)
            out_txt.append(p.text_content)
            out_attr.append(p.attrs.get("title", ""))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_txt, pa.string()),
             pa.array(out_attr, pa.string())],
            names=["doc_id", "decoded_text", "decoded_attr"])


class BodyAttrMergeCensus:
    """Second <body>/<html> start tags through the real parser
    (reference: HTMLParser.m 'in body' body/html arms per WHATWG):
    the duplicate tag is a parse error whose attributes MERGE onto
    the existing element — only names not already present are added,
    existing values never overridden, and exactly one body/html
    element exists. Every surviving attribute is arithmetic in
    doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "html_lang", "html_dir",
                                "html_data", "body_class",
                                "body_title", "n_bodies")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><html lang="en" data-a="h{d}">'
                    f'<body class="c{d}" id="b{d}">x{d}'
                    f'<body class="OVERRIDE" title="t{d}">'
                    f'<html data-a="IGNORED" dir="rtl">y{d}'
                    f'</body></html>')
            doc = parse(page)
            n_bodies = 0
            html_el = body_el = None
            for el in doc.elements_in_tree_order():
                if el.tag == "html":
                    html_el = el
                elif el.tag == "body":
                    body_el = el
                    n_bodies += 1
            cols["doc_id"].append(key)
            cols["html_lang"].append(html_el.attrs.get("lang", "?"))
            cols["html_dir"].append(html_el.attrs.get("dir", "?"))
            cols["html_data"].append(
                html_el.attrs.get("data-a", "?"))
            cols["body_class"].append(
                body_el.attrs.get("class", "?"))
            cols["body_title"].append(
                body_el.attrs.get("title", "?"))
            cols["n_bodies"].append(n_bodies)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["html_lang"], pa.string()),
             pa.array(cols["html_dir"], pa.string()),
             pa.array(cols["html_data"], pa.string()),
             pa.array(cols["body_class"], pa.string()),
             pa.array(cols["body_title"], pa.string()),
             pa.array(cols["n_bodies"], pa.int64())],
            names=["doc_id", "html_lang", "html_dir", "html_data",
                   "body_class", "body_title", "n_bodies"])


class FormPointerCensus:
    """The form-element pointer through the real parser (reference:
    HTMLParser.m form arms per WHATWG): a nested <form> start tag is
    IGNORED while the pointer is set (no element, no attrs), </form>
    clears the pointer without disturbing the open <p>, and a <form>
    inside <table> is the special insert-and-pop-immediately branch —
    an EMPTY form child of the table while the <tr> builds a
    synthesized tbody. All pinned by arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_forms", "first_form_id",
                                "table_form_id", "table_form_nkids",
                                "input_parent", "td_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<form id="f{d}a"><p>x{d}'
                    f'<form id="IGNORED"><input name="i{d}">'
                    f'</form><p>y{d}</form>'
                    f'<table><form id="tf{d}"><tr><td>z{d}</table>'
                    f'</body>')
            doc = parse(page)
            n_forms = 0
            first_id = table_id = input_parent = td_text = ""
            table_nkids = -1
            for el in doc.elements_in_tree_order():
                if el.tag == "form":
                    n_forms += 1
                    fid = el.attrs.get("id", "")
                    if el.parent.tag == "table":
                        table_id = fid
                        table_nkids = len(el.children)
                    elif not first_id:
                        first_id = fid
                elif el.tag == "input":
                    input_parent = el.parent.tag
                elif el.tag == "td":
                    td_text = el.text_content
            cols["doc_id"].append(key)
            cols["n_forms"].append(n_forms)
            cols["first_form_id"].append(first_id)
            cols["table_form_id"].append(table_id)
            cols["table_form_nkids"].append(table_nkids)
            cols["input_parent"].append(input_parent)
            cols["td_text"].append(td_text)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_forms"], pa.int64()),
             pa.array(cols["first_form_id"], pa.string()),
             pa.array(cols["table_form_id"], pa.string()),
             pa.array(cols["table_form_nkids"], pa.int64()),
             pa.array(cols["input_parent"], pa.string()),
             pa.array(cols["td_text"], pa.string())],
            names=["doc_id", "n_forms", "first_form_id",
                   "table_form_id", "table_form_nkids",
                   "input_parent", "td_text"])


class CommentEdgeCensus:
    """Comment-state edge exits through the real tokenizer
    (reference: HTMLTokenizer.m comment-start/-end/-end-bang states
    per WHATWG): abrupt <!--> and <!---> close empty, a nested <!--
    stays literal in the data, --!> closes, y--- keeps one dash,
    </% opens a BOGUS comment, and <?pi?> becomes a bogus comment
    with the '?' kept. Data strings regenerate by doc_id%7."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Comment

        ids = batch.column("doc_id").to_pylist()
        out_id, out_data, out_n = [], [], []
        for key in ids:
            d = int(key)
            case = d % 7
            frag = ("<!-->", "<!--->",
                    f"<!-- a{d}<!-- b -->", f"<!--x{d}--!>",
                    f"<!--y{d}--->", f"</%c{d}>",
                    f"<?pi{d} data?>")[case]
            doc = parse(f"<!DOCTYPE html><body><p>a</p>{frag}"
                        f"<p>b</p>")
            datas = [n.data for n in doc.tree_order()
                     if isinstance(n, Comment)]
            out_id.append(key)
            out_data.append(datas[0] if datas else "?")
            out_n.append(len(datas))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_data, pa.string()),
             pa.array(out_n, pa.int64())],
            names=["doc_id", "comment_data", "n_comments"])


class CaptionColgroupCensus:
    """Caption and column-group handling through the real parser
    (reference: HTMLParser.m 'in caption'/'in column group' modes per
    WHATWG): </caption> generates implied end tags (the open <p>
    closes inside it), an explicit <colgroup> holds m=(d%3+1) <col>
    voids, a STRAY <col> after it synthesizes a SECOND colgroup, and
    the <tr> builds a synthesized tbody. All counts arithmetic in
    doc_id for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "caption_text",
                                "n_colgroups", "n_cols", "td_text",
                                "n_tbody")}
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            colrun = "<col>" * m
            page = (f'<!DOCTYPE html><body><table>'
                    f'<caption>cap{d}<p>in{d}</caption>'
                    f'<colgroup>{colrun}</colgroup>'
                    f'<col width="9">'
                    f'<tr><td>c{d}</table>')
            doc = parse(page)
            cap = td = ""
            n_cg = n_col = n_tb = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "caption":
                    cap = el.text_content
                elif el.tag == "colgroup":
                    n_cg += 1
                elif el.tag == "col":
                    n_col += 1
                elif el.tag == "td":
                    td = el.text_content
                elif el.tag == "tbody":
                    n_tb += 1
            cols["doc_id"].append(key)
            cols["caption_text"].append(cap)
            cols["n_colgroups"].append(n_cg)
            cols["n_cols"].append(n_col)
            cols["td_text"].append(td)
            cols["n_tbody"].append(n_tb)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["caption_text"], pa.string()),
             pa.array(cols["n_colgroups"], pa.int64()),
             pa.array(cols["n_cols"], pa.int64()),
             pa.array(cols["td_text"], pa.string()),
             pa.array(cols["n_tbody"], pa.int64())],
            names=["doc_id", "caption_text", "n_colgroups", "n_cols",
                   "td_text", "n_tbody"])


class RcdataRawtextCensus:
    """The RCDATA/RAWTEXT dichotomy in body context through the real
    tokenizer (reference: HTMLTokenizer.m RCDATA vs RAWTEXT states):
    <title> (RCDATA, legal anywhere) DECODES character references but
    keeps markup literal, while <iframe>/<noembed> (RAWTEXT) keep
    both literal. Each element's text regenerates by concat; the
    title's '&amp;' collapses to '&', the others keep it."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_t, out_i, out_n = [], [], [], []
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<title>t{d} &amp; <b>raw</b></title>'
                    f'<iframe>i{d} &amp; <b>raw</b></iframe>'
                    f'<noembed>n{d} &amp;</noembed>tail{d}')
            doc = parse(page)
            tt = it = nt = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "title":
                    tt = el.text_content
                elif el.tag == "iframe":
                    it = el.text_content
                elif el.tag == "noembed":
                    nt = el.text_content
            out_id.append(key)
            out_t.append(tt)
            out_i.append(it)
            out_n.append(nt)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_t, pa.string()),
             pa.array(out_i, pa.string()),
             pa.array(out_n, pa.string())],
            names=["doc_id", "title_text", "iframe_text",
                   "noembed_text"])


class EofTruncationCensus:
    """EOF-in-state recovery through the real tokenizer (reference:
    HTMLTokenizer.m EOF arms per WHATWG) — the truncated-document
    behaviors a crawler hits constantly: EOF in a tag name or
    attribute value DISCARDS the tag, EOF in a comment EMITS the
    partial comment, EOF in RCDATA/script-data keeps the element
    with its partial text, and EOF mid-charref leaves the raw
    ampersand run. Case = doc_id%6; everything regenerates by
    arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Comment

        ids = batch.column("doc_id").to_pylist()
        out_id, out_txt, out_com, out_tag = [], [], [], []
        for key in ids:
            d = int(key)
            case = d % 6
            page = (f"<!DOCTYPE html><body><p>a{d}<di",
                    f"<!DOCTYPE html><body><p>a{d}<div id=\"x{d}",
                    f"<!DOCTYPE html><body><p>a{d}<!-- c{d}",
                    f"<!DOCTYPE html><body><p>a{d}<title>t{d}",
                    f"<!DOCTYPE html><body><p>a{d}<script>s{d}",
                    f"<!DOCTYPE html><body><p>a{d}&am")[case]
            doc = parse(page)
            body_text = inner = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "body":
                    body_text = el.text_content
                elif el.tag in ("title", "script"):
                    inner = el.tag
            coms = [n.data for n in doc.tree_order()
                    if isinstance(n, Comment)]
            out_id.append(key)
            out_txt.append(body_text)
            out_com.append(coms[0] if coms else "")
            out_tag.append(inner)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_txt, pa.string()),
             pa.array(out_com, pa.string()),
             pa.array(out_tag, pa.string())],
            names=["doc_id", "body_text", "comment_data",
                   "inner_tag"])


class TableFosterTextCensus:
    """Pending-table-character-token fostering through the real
    parser (reference: HTMLParser.m 'in table text' per WHATWG): a
    text run with ANY non-whitespace char fosters out WHOLE (even
    its leading spaces land before the table), while a
    whitespace-only run stays INSIDE the table. Even docs carry the
    fostered run, odd docs the whitespace-only run; body text and
    the table's first-child kind pin the dichotomy."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Text

        ids = batch.column("doc_id").to_pylist()
        out_id, out_bt, out_first, out_td = [], [], [], []
        for key in ids:
            d = int(key)
            run = f"  foster{d} " if d % 2 == 0 else "   "
            page = (f'<!DOCTYPE html><body><table>{run}'
                    f'<tr><td>x{d}</table>')
            doc = parse(page)
            body = table = None
            td = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "body":
                    body = el
                elif el.tag == "table":
                    table = el
                elif el.tag == "td":
                    td = el.text_content
            first_kind = (
                "text" if table.children
                and isinstance(table.children[0], Text)
                else "element")
            out_id.append(key)
            out_bt.append(body.text_content)
            out_first.append(first_kind)
            out_td.append(td)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_bt, pa.string()),
             pa.array(out_first, pa.string()),
             pa.array(out_td, pa.string())],
            names=["doc_id", "body_text", "table_first_child",
                   "td_text"])


class HeadingAutocloseCensus:
    """Heading auto-close through the real parser (reference:
    HTMLParser.m h1-h6 arms per WHATWG): each hN start tag closes an
    open heading of ANY rank, and a MISMATCHED heading end tag
    (</h3> here) still pops the open one. m=(d%5+1)+1 headings land
    as flat siblings h1..h(m+1); the trailing <p> sits at body
    level. Counts and texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_n, out_last, out_lt, out_pp = [], [], [], [], []
        for key in ids:
            d = int(key)
            m = d % 5 + 1
            hs = "".join(f"<h{(i % 6) + 1}>h{d}_{i}"
                         for i in range(m + 1))
            page = f'<!DOCTYPE html><body>{hs}</h3><p>tail{d}'
            doc = parse(page)
            n_h = 0
            last_tag = last_text = p_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                    n_h += 1
                    last_tag = el.tag
                    last_text = el.text_content
                elif el.tag == "p":
                    p_parent = el.parent.tag
            out_id.append(key)
            out_n.append(n_h)
            out_last.append(last_tag)
            out_lt.append(last_text)
            out_pp.append(p_parent)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_n, pa.int64()),
             pa.array(out_last, pa.string()),
             pa.array(out_lt, pa.string()),
             pa.array(out_pp, pa.string())],
            names=["doc_id", "n_headings", "last_tag", "last_text",
                   "p_parent"])


class MarqueeNobrCensus:
    """Formatting-scope barriers and the nobr adoption branch through
    the real parser (reference: HTMLParser.m marquee/applet/object
    marker handling + nobr arm per WHATWG): text inside <marquee>
    does NOT reconstruct the outer open <b> (the AFE marker), a </b>
    inside the marquee is ignored, the outer <b> resumes after
    </marquee>; and a second <nobr> while one is open runs the
    adoption agency, yielding two sibling nobrs with a bare tail.
    All texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "b_text", "marquee_text",
                                "n_b", "nobr1_text", "nobr2_text",
                                "n_nobr")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><b>out{d}'
                    f'<marquee>in{d}</b>still{d}</marquee>post{d}')
            doc = parse(page)
            b_text = m_text = ""
            n_b = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "b":
                    n_b += 1
                    b_text = el.text_content
                elif el.tag == "marquee":
                    m_text = el.text_content
            page2 = (f'<!DOCTYPE html><body>'
                     f'<nobr>a{d}<nobr>b{d}</nobr>c{d}')
            doc2 = parse(page2)
            nobrs = [el.text_content
                     for el in doc2.elements_in_tree_order()
                     if el.tag == "nobr"]
            cols["doc_id"].append(key)
            cols["b_text"].append(b_text)
            cols["marquee_text"].append(m_text)
            cols["n_b"].append(n_b)
            cols["nobr1_text"].append(nobrs[0] if nobrs else "")
            cols["nobr2_text"].append(
                nobrs[1] if len(nobrs) > 1 else "")
            cols["n_nobr"].append(len(nobrs))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["b_text"], pa.string()),
             pa.array(cols["marquee_text"], pa.string()),
             pa.array(cols["n_b"], pa.int64()),
             pa.array(cols["nobr1_text"], pa.string()),
             pa.array(cols["nobr2_text"], pa.string()),
             pa.array(cols["n_nobr"], pa.int64())],
            names=["doc_id", "b_text", "marquee_text", "n_b",
                   "nobr1_text", "nobr2_text", "n_nobr"])


class ButtonScopeCensus:
    """Button-scope rules through the real parser (reference:
    HTMLParser.m button arm + elementInButtonScope per WHATWG): a
    second <button> generates implied end tags and pops the open one
    (closing its inner <p> on the way), while a <p> START tag inside
    a button does NOT close a <p> outside it — button is a scope
    barrier — so after </button> the OUTER p keeps accumulating
    text. Texts and counts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_buttons", "btn1_text",
                                "btn2_text", "outer_p_text",
                                "inner_p_parent")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><button>b1_{d}<p>p1_{d}'
                    f'<button>b2_{d}</button>tail{d}')
            doc = parse(page)
            btns = [el.text_content
                    for el in doc.elements_in_tree_order()
                    if el.tag == "button"]
            page2 = (f'<!DOCTYPE html><body><p>x{d}'
                     f'<button><p>y{d}</button>z{d}')
            doc2 = parse(page2)
            outer_p = inner_parent = ""
            for el in doc2.elements_in_tree_order():
                if el.tag == "p":
                    if el.parent.tag == "body" and not outer_p:
                        outer_p = el.text_content
                    elif el.parent.tag != "body":
                        inner_parent = el.parent.tag
            cols["doc_id"].append(key)
            cols["n_buttons"].append(len(btns))
            cols["btn1_text"].append(btns[0] if btns else "")
            cols["btn2_text"].append(
                btns[1] if len(btns) > 1 else "")
            cols["outer_p_text"].append(outer_p)
            cols["inner_p_parent"].append(inner_parent)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_buttons"], pa.int64()),
             pa.array(cols["btn1_text"], pa.string()),
             pa.array(cols["btn2_text"], pa.string()),
             pa.array(cols["outer_p_text"], pa.string()),
             pa.array(cols["inner_p_parent"], pa.string())],
            names=["doc_id", "n_buttons", "btn1_text", "btn2_text",
                   "outer_p_text", "inner_p_parent"])


class AfterBodyCensus:
    """The 'after body' insertion mode through the real parser
    (reference: HTMLParser.m afterBody arms per WHATWG): a comment
    IMMEDIATELY after </body> attaches to the HTML element, but any
    non-whitespace text is a parse error that switches back to 'in
    body' — so the text AND every later comment land inside body.
    Attachment points and texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Comment

        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "html_comment",
                                "body_comment", "body_text",
                                "n_html_kids")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><p>main{d}</p></body>'
                    f'<!--hc{d}-->tail{d}<!--bc{d}-->')
            doc = parse(page)
            html = body = None
            for el in doc.elements_in_tree_order():
                if el.tag == "html":
                    html = el
                elif el.tag == "body":
                    body = el
            hc = next((c.data for c in html.children
                       if isinstance(c, Comment)), "")
            bc = next((c.data for c in body.children
                       if isinstance(c, Comment)), "")
            cols["doc_id"].append(key)
            cols["html_comment"].append(hc)
            cols["body_comment"].append(bc)
            cols["body_text"].append(body.text_content)
            cols["n_html_kids"].append(len(html.children))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["html_comment"], pa.string()),
             pa.array(cols["body_comment"], pa.string()),
             pa.array(cols["body_text"], pa.string()),
             pa.array(cols["n_html_kids"], pa.int64())],
            names=["doc_id", "html_comment", "body_comment",
                   "body_text", "n_html_kids"])


class HeadMisnestCensus:
    """Late head-only elements through the real parser (reference:
    HTMLParser.m:599 'after head' misnested-start-tag arm): <title>
    and <meta> appearing AFTER </head> but before <body> are pushed
    back INTO the head element (head re-enters the stack for the
    token), so head ends with them and body starts clean. All
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "title_text", "n_meta",
                                "title_parent", "body_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html>'
                    f'<head><meta name="a" content="1"></head>'
                    f'<title>late{d}</title><meta name="b{d}">'
                    f'<body>x{d}')
            doc = parse(page)
            title_text = title_parent = body_text = ""
            n_meta = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "title":
                    title_text = el.text_content
                    title_parent = el.parent.tag
                elif el.tag == "meta":
                    n_meta += 1
                elif el.tag == "body":
                    body_text = el.text_content
            cols["doc_id"].append(key)
            cols["title_text"].append(title_text)
            cols["n_meta"].append(n_meta)
            cols["title_parent"].append(title_parent)
            cols["body_text"].append(body_text)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["title_text"], pa.string()),
             pa.array(cols["n_meta"], pa.int64()),
             pa.array(cols["title_parent"], pa.string()),
             pa.array(cols["body_text"], pa.string())],
            names=["doc_id", "title_text", "n_meta", "title_parent",
                   "body_text"])


class IntegrationPointCensus:
    """HTML integration points inside foreign content through the
    real parser (reference: HTMLParser.m HTML-integration-point /
    MathML-text-integration-point checks per WHATWG): children of
    <svg:foreignObject>, <math:mtext>, and <annotation-xml
    encoding=text/html> parse as ordinary HTML (html namespace),
    while their hosts stay in the foreign namespace. Namespaces,
    parents, and texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "p_ns", "b_ns", "div_ns",
                                "host_ns", "joined_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<svg><foreignObject><p>fo{d}</p>'
                    f'</foreignObject></svg>'
                    f'<math><mtext><b>mt{d}</b></mtext></math>'
                    f'<math><annotation-xml encoding="text/html">'
                    f'<div>ax{d}</div></annotation-xml></math>')
            doc = parse(page)
            p_ns = b_ns = div_ns = host_ns = ""
            texts = []
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    p_ns = el.namespace
                    texts.append(el.text_content)
                elif el.tag == "b":
                    b_ns = el.namespace
                    texts.append(el.text_content)
                elif el.tag == "div":
                    div_ns = el.namespace
                    texts.append(el.text_content)
                elif el.tag == "foreignObject":
                    host_ns = el.namespace
            cols["doc_id"].append(key)
            cols["p_ns"].append(p_ns)
            cols["b_ns"].append(b_ns)
            cols["div_ns"].append(div_ns)
            cols["host_ns"].append(host_ns)
            cols["joined_text"].append("|".join(texts))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["p_ns"], pa.string()),
             pa.array(cols["b_ns"], pa.string()),
             pa.array(cols["div_ns"], pa.string()),
             pa.array(cols["host_ns"], pa.string()),
             pa.array(cols["joined_text"], pa.string())],
            names=["doc_id", "p_ns", "b_ns", "div_ns", "host_ns",
                   "joined_text"])


class ScriptEscapeCensus:
    """Script-data escape states through the real tokenizer
    (reference: HTMLTokenizer.m script-data-escaped /
    double-escaped states per WHATWG): an inner '<script>' inside
    '<!--' puts the tokenizer in DOUBLE-escaped state where a nested
    '</script>' is literal data; '-->' re-enters plain script data
    so the real end tag closes. Case = doc_id%3; script text
    regenerates by concat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_s, out_bt = [], [], []
        for key in ids:
            d = int(key)
            case = d % 3
            frag = (f"<script><!-- alert('a{d}') --></script>",
                    f"<script><!--<script>x{d}</script>-->"
                    f"</script>",
                    f"<script><!--<script>y{d}--></script>")[case]
            page = f"<!DOCTYPE html><body>{frag}tail{d}"
            doc = parse(page)
            stext = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "script":
                    stext = el.text_content
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_s.append(stext)
            out_bt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_s, pa.string()),
             pa.array(out_bt, pa.string())],
            names=["doc_id", "script_text", "body_text"])


class SelectInTableCensus:
    """The 'in select in table' insertion mode through the real
    parser (reference: HTMLParser.m inSelectInTable arm per WHATWG):
    a <td> start tag while a select is open inside a table cell acts
    as an end-of-select AND re-processes, so the select closes with
    its option and the new cell opens as a sibling. Structure pinned
    by arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_td", "select_text",
                                "select_parent", "td2_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><table><tr><td>'
                    f'<select><option>o{d}<td>next{d}</table>')
            doc = parse(page)
            n_td = 0
            sel_text = sel_parent = td2 = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "td":
                    n_td += 1
                    if n_td == 2:
                        td2 = el.text_content
                elif el.tag == "select":
                    sel_text = el.text_content
                    sel_parent = el.parent.tag
            cols["doc_id"].append(key)
            cols["n_td"].append(n_td)
            cols["select_text"].append(sel_text)
            cols["select_parent"].append(sel_parent)
            cols["td2_text"].append(td2)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_td"], pa.int64()),
             pa.array(cols["select_text"], pa.string()),
             pa.array(cols["select_parent"], pa.string()),
             pa.array(cols["td2_text"], pa.string())],
            names=["doc_id", "n_td", "select_text", "select_parent",
                   "td2_text"])


_DOCTYPE_CASES = (
    ("<!DOCTYPE html>", "no-quirks"),
    ("<!doctype HTML SYSTEM 'about:legacy-compat'>", "no-quirks"),
    ("<!DOCTYPE>", "quirks"),
    ("<!DOCTYPE html PUBLIC '-//W3C//DTD HTML 4.01 "
     "Transitional//EN'>", "quirks"),
    ("", "quirks"),
    ("<!DOCTYPE html PUBLIC '-//W3C//DTD XHTML 1.0 "
     "Transitional//EN'>", "limited-quirks"),
    ("<!DOCTYPE html PUBLIC '-//W3C//DTD HTML 4.01 "
     "Transitional//EN' 'http://x'>", "limited-quirks"),
    ("<!DOCTYPE math>", "quirks"),
)


class DoctypeVariantCensus:
    """Doctype-driven quirks classification through the real parser
    (reference: HTMLParser.m quirks tables per WHATWG): the standard
    and about:legacy-compat doctypes are no-quirks; a missing/empty/
    wrong-name doctype or a Transitional PUBLIC id WITHOUT a system
    id is full quirks; XHTML-Transitional, or HTML-4.01-Transitional
    WITH a system id, is limited-quirks. Case = doc_id%8."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_mode = [], []
        for key in ids:
            dt, _want = _DOCTYPE_CASES[int(key) % len(_DOCTYPE_CASES)]
            doc = parse(f"{dt}<html><body>x{int(key)}")
            out_id.append(key)
            out_mode.append(doc.quirks_mode)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_mode, pa.string())],
            names=["doc_id", "quirks_mode"])


class XmpListingTextareaCensus:
    """The three pre-formatted-element families through the real
    parser (reference: HTMLTokenizer.m RAWTEXT/RCDATA entries +
    HTMLParser.m pre/listing newline drop): <xmp> closes the open
    <p>, is RAWTEXT (entities literal), and KEEPS its leading
    newline; <listing> drops the leading newline but parses
    normally (entities decode); <textarea> is RCDATA — drops the
    newline, decodes entities (&amp;, &#65;), keeps markup literal.
    All texts regenerate by concat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "p_text", "xmp_text",
                                "listing_text", "textarea_text",
                                "body2_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><p>pre{d}'
                    f'<xmp>\n<b>&amp;x{d}</b></xmp>'
                    f'<listing>\nli&amp;{d}</listing>')
            doc = parse(page)
            p_text = xmp = listing = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    p_text = el.text_content
                elif el.tag == "xmp":
                    xmp = el.text_content
                elif el.tag == "listing":
                    listing = el.text_content
            page2 = (f'<!DOCTYPE html><body><textarea rows="3">\n'
                     f'&amp;t{d} <b>raw</b>&#65;</textarea>post{d}')
            doc2 = parse(page2)
            ta = body2 = ""
            for el in doc2.elements_in_tree_order():
                if el.tag == "textarea":
                    ta = el.text_content
                elif el.tag == "body":
                    body2 = el.text_content
            cols["doc_id"].append(key)
            cols["p_text"].append(p_text)
            cols["xmp_text"].append(xmp)
            cols["listing_text"].append(listing)
            cols["textarea_text"].append(ta)
            cols["body2_text"].append(body2)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["p_text"], pa.string()),
             pa.array(cols["xmp_text"], pa.string()),
             pa.array(cols["listing_text"], pa.string()),
             pa.array(cols["textarea_text"], pa.string()),
             pa.array(cols["body2_text"], pa.string())],
            names=["doc_id", "p_text", "xmp_text", "listing_text",
                   "textarea_text", "body2_text"])


class TableSectionCensus:
    """Table-section implied closes through the real parser
    (reference: HTMLParser.m 'in table body'/'in row' arms per
    WHATWG): <tbody> closes an open <thead> (popping its row and
    <th>), <tr> closes the previous row, <tfoot> closes <tbody>, and
    </table> unwinds everything; m=(d%3+1) body rows. Section/row/
    cell counts and texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_sections", "n_rows",
                                "th_text", "tfoot_text", "tail_ok")}
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            rows = "".join(f"<tr><td>b{d}_{i}" for i in range(m))
            page = (f'<!DOCTYPE html><body><table>'
                    f'<thead><tr><th>h{d}'
                    f'<tbody>{rows}'
                    f'<tfoot><tr><td>f{d}</table>tail{d}')
            doc = parse(page)
            n_sec = n_rows = 0
            th = tf = ""
            tail_ok = 0
            for el in doc.elements_in_tree_order():
                if el.tag in ("thead", "tbody", "tfoot"):
                    n_sec += 1
                    if el.tag == "tfoot":
                        tf = el.text_content
                elif el.tag == "tr":
                    n_rows += 1
                elif el.tag == "th":
                    th = el.text_content
                elif el.tag == "body":
                    tail_ok = int(el.children[-1].__class__.__name__
                                  == "Text")
            cols["doc_id"].append(key)
            cols["n_sections"].append(n_sec)
            cols["n_rows"].append(n_rows)
            cols["th_text"].append(th)
            cols["tfoot_text"].append(tf)
            cols["tail_ok"].append(tail_ok)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_sections"], pa.int64()),
             pa.array(cols["n_rows"], pa.int64()),
             pa.array(cols["th_text"], pa.string()),
             pa.array(cols["tfoot_text"], pa.string()),
             pa.array(cols["tail_ok"], pa.int64())],
            names=["doc_id", "n_sections", "n_rows", "th_text",
                   "tfoot_text", "tail_ok"])


class NulCharCensus:
    """U+0000 handling per context through the real tokenizer
    (reference: HTMLTokenizer.m NUL arms per WHATWG): dropped in
    ordinary body text, replaced by U+FFFD in foreign (SVG) content
    and in script data. Texts regenerate with chr()."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_p, out_svg, out_sc = [], [], [], []
        for key in ids:
            d = int(key)
            page = (f"<!DOCTYPE html><body><p>a{d}\x00b{d}</p>"
                    f"<svg>c{d}\x00d{d}</svg>"
                    f"<script>e{d}\x00f{d}</script>")
            doc = parse(page)
            p = svg = sc = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    p = el.text_content
                elif el.tag == "svg":
                    svg = el.text_content
                elif el.tag == "script":
                    sc = el.text_content
            out_id.append(key)
            out_p.append(p)
            out_svg.append(svg)
            out_sc.append(sc)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_p, pa.string()),
             pa.array(out_svg, pa.string()),
             pa.array(out_sc, pa.string())],
            names=["doc_id", "p_text", "svg_text", "script_text"])


class OptionInBodyCensus:
    """<option> in body context through the real parser (reference:
    HTMLParser.m option arm per WHATWG): options RECONSTRUCT active
    formatting (the first two nest inside the open <b>), self-pop on
    the next <option>, and after a proper </b> (which removes b from
    the AFE) the third option sits bare at body level. Counts and
    texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_options", "n_in_b",
                                "last_text", "last_parent")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><b>x{d}'
                    f'<option>o{d}_0<option>o{d}_1</b>'
                    f'<option>o{d}_2')
            doc = parse(page)
            n_opt = n_in_b = 0
            last_text = last_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "option":
                    n_opt += 1
                    last_text = el.text_content
                    last_parent = el.parent.tag
                    if el.parent.tag == "b":
                        n_in_b += 1
            cols["doc_id"].append(key)
            cols["n_options"].append(n_opt)
            cols["n_in_b"].append(n_in_b)
            cols["last_text"].append(last_text)
            cols["last_parent"].append(last_parent)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_options"], pa.int64()),
             pa.array(cols["n_in_b"], pa.int64()),
             pa.array(cols["last_text"], pa.string()),
             pa.array(cols["last_parent"], pa.string())],
            names=["doc_id", "n_options", "n_in_b", "last_text",
                   "last_parent"])


class ForeignAttrAdjustCensus:
    """Foreign-content attribute adjustment through the real parser
    (reference: HTMLParser.m adjustMathMLAttributes /
    adjustForeignAttributes per WHATWG): definitionurl →
    definitionURL on MathML, xlink:/xml: prefixed attributes keep
    their prefixed names, and a <script> INSIDE svg is a plain
    foreign element — entities decode, a self-closing child works,
    no RAWTEXT. All values arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "script_text", "script_ns",
                                "def_url", "xlink_href",
                                "xlink_title", "xml_lang")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<svg><script>s{d} &amp; <x{d}/>t{d}</script>'
                    f'</svg>'
                    f'<math definitionurl="u{d}">'
                    f'<mi xlink:href="h{d}">m{d}</mi></math>'
                    f'<svg><a xlink:title="xt{d}" xml:lang="en">'
                    f'l{d}</a></svg>')
            doc = parse(page)
            st = sns = du = xh = xt = xl = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "script":
                    st = el.text_content
                    sns = el.namespace
                elif el.tag == "math":
                    du = el.attrs.get("definitionURL", "?")
                elif el.tag == "mi":
                    xh = el.attrs.get("xlink:href", "?")
                elif el.tag == "a":
                    xt = el.attrs.get("xlink:title", "?")
                    xl = el.attrs.get("xml:lang", "?")
            cols["doc_id"].append(key)
            cols["script_text"].append(st)
            cols["script_ns"].append(sns)
            cols["def_url"].append(du)
            cols["xlink_href"].append(xh)
            cols["xlink_title"].append(xt)
            cols["xml_lang"].append(xl)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["script_text"], pa.string()),
             pa.array(cols["script_ns"], pa.string()),
             pa.array(cols["def_url"], pa.string()),
             pa.array(cols["xlink_href"], pa.string()),
             pa.array(cols["xlink_title"], pa.string()),
             pa.array(cols["xml_lang"], pa.string())],
            names=["doc_id", "script_text", "script_ns", "def_url",
                   "xlink_href", "xlink_title", "xml_lang"])


class TextComponentsCensus:
    """textComponents API parity (reference: HTMLNode textComponents,
    M15): the DIRECT Text children of body — element subtrees break
    the runs, adjacent insertions merge. m=(d%3+1)+1 runs separated
    by <b> islands; joined with '|' for the oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_join, out_n = [], [], []
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            runs = "".join(f"r{i}_{d}<b>b{i}_{d}</b>"
                           for i in range(m))
            page = f'<!DOCTYPE html><body>{runs}tail{d}'
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            comps = body.text_components
            out_id.append(key)
            out_join.append("|".join(comps))
            out_n.append(len(comps))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_join, pa.string()),
             pa.array(out_n, pa.int64())],
            names=["doc_id", "components", "n_components"])


class FragmentContextCensus:
    """Fragment parsing under different CONTEXT elements through the
    real parser (reference: HTMLReader parseFragment / WHATWG
    fragment algorithm): a td context resets to 'in body' where
    table-structure tags are IGNORED (text survives); a table
    context accepts <tr> and synthesizes its tbody; a select
    context drops the <div> but keeps its text
    inside the option; a title context is pure RCDATA. Node kinds
    and serializations arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Text

        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "td_ctx_text",
                                "table_ctx_html", "select_ctx_text",
                                "title_ctx_text")}
        for key in ids:
            d = int(key)
            td_nodes = parse_fragment(f"<tr><td>x{d}", "td")
            td_text = "".join(n.data for n in td_nodes
                              if isinstance(n, Text))
            tbl_nodes = parse_fragment(f"<tr><td>x{d}", "table")
            tbl_html = "".join(
                serialize(n) for n in tbl_nodes
                if not isinstance(n, Text))
            sel_nodes = parse_fragment(
                f"<option>o{d}<div>ig{d}", "select")
            sel_text = "".join(
                n.text_content for n in sel_nodes
                if hasattr(n, "tag"))
            title_nodes = parse_fragment(
                f"a{d} &amp; <b>r{d}</b>", "title")
            title_text = "".join(n.data for n in title_nodes
                                 if isinstance(n, Text))
            cols["doc_id"].append(key)
            cols["td_ctx_text"].append(td_text)
            cols["table_ctx_html"].append(tbl_html)
            cols["select_ctx_text"].append(sel_text)
            cols["title_ctx_text"].append(title_text)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["td_ctx_text"], pa.string()),
             pa.array(cols["table_ctx_html"], pa.string()),
             pa.array(cols["select_ctx_text"], pa.string()),
             pa.array(cols["title_ctx_text"], pa.string())],
            names=["doc_id", "td_ctx_text", "table_ctx_html",
                   "select_ctx_text", "title_ctx_text"])


class StrayEndTagCensus:
    """Stray end-tag recovery through the real parser (reference:
    HTMLParser.m end-tag arms per WHATWG): a </p> with no open p
    SYNTHESIZES an empty <p>, a mid-document <!DOCTYPE> is ignored
    (text flows on, quirks mode unchanged), and an unmatched </span>
    inside a <div> is ignored. Structure arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_p", "p_text",
                                "div_text", "body_text",
                                "quirks_mode")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>a{d}</p>b{d}'
                    f'<!DOCTYPE html>c{d}'
                    f'<div>d{d}</span>e{d}</div>')
            doc = parse(page)
            n_p = 0
            p_text = div_text = body_text = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    n_p += 1
                    p_text = el.text_content
                elif el.tag == "div":
                    div_text = el.text_content
                elif el.tag == "body":
                    body_text = el.text_content
            cols["doc_id"].append(key)
            cols["n_p"].append(n_p)
            cols["p_text"].append(p_text)
            cols["div_text"].append(div_text)
            cols["body_text"].append(body_text)
            cols["quirks_mode"].append(doc.quirks_mode)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_p"], pa.int64()),
             pa.array(cols["p_text"], pa.string()),
             pa.array(cols["div_text"], pa.string()),
             pa.array(cols["body_text"], pa.string()),
             pa.array(cols["quirks_mode"], pa.string())],
            names=["doc_id", "n_p", "p_text", "div_text",
                   "body_text", "quirks_mode"])


class NoahsArkCensus:
    """The Noah's Ark clause through the real parser (reference:
    HTMLParser.m pushOntoListOfActiveFormattingElements, M8): m =
    4+(d%2) IDENTICAL <font size=1> wrappers all insert into the
    first paragraph, but the AFE list keeps at most THREE — so the
    reconstruction in the next paragraph clones exactly 3 no matter
    how many were opened. Depths arithmetic in doc_id."""

    @staticmethod
    def _depth(el, tag):
        best = 0

        def rec(e, cur):
            nonlocal best
            for c in getattr(e, "children", []):
                if getattr(c, "tag", None) == tag:
                    rec(c, cur + 1)
                else:
                    rec(c, cur)
            best = max(best, cur)
        rec(el, 0)
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "p1_font_depth",
                                "p2_font_depth", "p1_text",
                                "p2_text")}
        for key in ids:
            d = int(key)
            m = 4 + d % 2
            page = (f'<!DOCTYPE html><body><p>s{d}'
                    + '<font size="1">' * m +
                    f'in{d}</p><p>out{d}</p>')
            doc = parse(page)
            ps = [el for el in doc.elements_in_tree_order()
                  if el.tag == "p"]
            cols["doc_id"].append(key)
            cols["p1_font_depth"].append(self._depth(ps[0], "font"))
            cols["p2_font_depth"].append(self._depth(ps[1], "font"))
            cols["p1_text"].append(ps[0].text_content)
            cols["p2_text"].append(ps[1].text_content)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["p1_font_depth"], pa.int64()),
             pa.array(cols["p2_font_depth"], pa.int64()),
             pa.array(cols["p1_text"], pa.string()),
             pa.array(cols["p2_text"], pa.string())],
            names=["doc_id", "p1_font_depth", "p2_font_depth",
                   "p1_text", "p2_text"])


class HeadVoidsInBodyCensus:
    """Head-family voids appearing in BODY through the real parser
    (reference: HTMLParser.m 'in body' base/link/meta/bgsound arm
    per WHATWG — processed with in-HEAD rules but inserted at the
    CURRENT position): link/meta/bgsound inside a <div> stay inside
    that div, the head stays empty, and text flows around them.
    Attributes arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "link_parent", "link_rel",
                                "meta_name", "bgsound_src",
                                "n_head_kids", "div_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><div>x{d}'
                    f'<link rel="a{d}"><meta name="m{d}">'
                    f'<bgsound src="s{d}">y{d}</div>')
            doc = parse(page)
            lp = lr = mn = bs = dt = ""
            nh = 0
            for el in doc.elements_in_tree_order():
                if el.tag == "link":
                    lp = el.parent.tag
                    lr = el.attrs.get("rel", "?")
                elif el.tag == "meta":
                    mn = el.attrs.get("name", "?")
                elif el.tag == "bgsound":
                    bs = el.attrs.get("src", "?")
                elif el.tag == "head":
                    nh = len(el.children)
                elif el.tag == "div":
                    dt = el.text_content
            cols["doc_id"].append(key)
            cols["link_parent"].append(lp)
            cols["link_rel"].append(lr)
            cols["meta_name"].append(mn)
            cols["bgsound_src"].append(bs)
            cols["n_head_kids"].append(nh)
            cols["div_text"].append(dt)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["link_parent"], pa.string()),
             pa.array(cols["link_rel"], pa.string()),
             pa.array(cols["meta_name"], pa.string()),
             pa.array(cols["bgsound_src"], pa.string()),
             pa.array(cols["n_head_kids"], pa.int64()),
             pa.array(cols["div_text"], pa.string())],
            names=["doc_id", "link_parent", "link_rel", "meta_name",
                   "bgsound_src", "n_head_kids", "div_text"])


class ForeignSelfCloseCensus:
    """Self-closing tags in foreign content through the real parser
    (reference: HTMLParser.m foreign-content self-closing
    acknowledgement per WHATWG): <circle/> and <rect/> inside svg
    close IMMEDIATELY (0 children each, m=(d%3+1) circles all
    siblings), unlike HTML where the flag is ignored on non-voids.
    Counts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_circles",
                                "n_svg_kids", "circle_kids",
                                "svg_text")}
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            circles = "".join(f'<circle r="{i}"/>' for i in range(m))
            page = (f'<!DOCTYPE html><body>'
                    f'<svg>{circles}<rect/>t{d}</svg>')
            doc = parse(page)
            n_c = ckids = 0
            svg = None
            for el in doc.elements_in_tree_order():
                if el.tag == "circle":
                    n_c += 1
                    ckids += len(el.children)
                elif el.tag == "svg":
                    svg = el
            cols["doc_id"].append(key)
            cols["n_circles"].append(n_c)
            cols["n_svg_kids"].append(len(svg.children))
            cols["circle_kids"].append(ckids)
            cols["svg_text"].append(svg.text_content)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_circles"], pa.int64()),
             pa.array(cols["n_svg_kids"], pa.int64()),
             pa.array(cols["circle_kids"], pa.int64()),
             pa.array(cols["svg_text"], pa.string())],
            names=["doc_id", "n_circles", "n_svg_kids",
                   "circle_kids", "svg_text"])


class ForeignBreakoutCensus:
    """Foreign-content BREAKOUT through the real parser (reference:
    HTMLParser.m foreign-content start-tag blacklist per WHATWG): a
    <p> inside svg pops every foreign element and reprocesses in
    HTML (p lands at body level); <font> breaks out ONLY when it
    carries color/face/size (html ns) and stays foreign otherwise
    (svg ns); and an <svg> opened directly inside <table> is
    foster-parented BEFORE the table. All pinned by doc_id
    arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "p_parent", "g_text",
                                "font_size_ns", "font_dur_ns",
                                "body_first_tag", "td_text")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<svg><g>g{d}<p>p{d}</p></svg>')
            p_parent = g_text = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    p_parent = el.parent.tag
                elif el.tag == "g":
                    g_text = el.text_content
            doc2 = parse(f'<!DOCTYPE html><body>'
                         f'<svg><font size="1">f{d}</font></svg>'
                         f'<svg><font dur="x">k{d}</font></svg>')
            fns = []
            for el in doc2.elements_in_tree_order():
                if el.tag == "font":
                    fns.append(el.namespace)
            doc3 = parse(f'<!DOCTYPE html><body><table>'
                         f'<svg><circle/></svg><tr><td>c{d}</table>')
            body3 = next(el for el in doc3.elements_in_tree_order()
                         if el.tag == "body")
            first = next((c.tag for c in body3.children
                          if hasattr(c, "tag")), "")
            td = next((el.text_content
                       for el in doc3.elements_in_tree_order()
                       if el.tag == "td"), "")
            cols["doc_id"].append(key)
            cols["p_parent"].append(p_parent)
            cols["g_text"].append(g_text)
            cols["font_size_ns"].append(fns[0] if fns else "")
            cols["font_dur_ns"].append(
                fns[1] if len(fns) > 1 else "")
            cols["body_first_tag"].append(first)
            cols["td_text"].append(td)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["p_parent"], pa.string()),
             pa.array(cols["g_text"], pa.string()),
             pa.array(cols["font_size_ns"], pa.string()),
             pa.array(cols["font_dur_ns"], pa.string()),
             pa.array(cols["body_first_tag"], pa.string()),
             pa.array(cols["td_text"], pa.string())],
            names=["doc_id", "p_parent", "g_text", "font_size_ns",
                   "font_dur_ns", "body_first_tag", "td_text"])


class AnnotationXmlGateCensus:
    """The annotation-xml encoding gate through the real parser
    (reference: HTMLParser.m HTML-integration-point check per
    WHATWG): WITHOUT encoding=text/html|application/xhtml+xml a
    <div> is a breakout tag — it pops the math subtree and lands at
    body level — but WITH the xhtml encoding annotation-xml is an
    integration point and the div nests inside it. Parents and
    texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "div1_parent",
                                "div2_parent", "div1_text",
                                "div2_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<math><annotation-xml><div>n{d}</div>'
                    f'</annotation-xml></math>'
                    f'<math><annotation-xml '
                    f'encoding="application/xhtml+xml">'
                    f'<div>h{d}</div></annotation-xml></math>')
            doc = parse(page)
            parents, texts = [], []
            for el in doc.elements_in_tree_order():
                if el.tag == "div":
                    parents.append(el.parent.tag)
                    texts.append(el.text_content)
            cols["doc_id"].append(key)
            cols["div1_parent"].append(parents[0] if parents else "")
            cols["div2_parent"].append(
                parents[1] if len(parents) > 1 else "")
            cols["div1_text"].append(texts[0] if texts else "")
            cols["div2_text"].append(
                texts[1] if len(texts) > 1 else "")
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["div1_parent"], pa.string()),
             pa.array(cols["div2_parent"], pa.string()),
             pa.array(cols["div1_text"], pa.string()),
             pa.array(cols["div2_text"], pa.string())],
            names=["doc_id", "div1_parent", "div2_parent",
                   "div1_text", "div2_text"])


class BomPriorityCensus:
    """Encoding-source priority through the real byte-level entry
    point (reference: HTMLReader encoding sniffer, S4/S5): a UTF-8
    BOM beats a lying <meta charset>, UTF-16LE/BE BOMs decode
    16-bit payloads, a meta windows-1252 maps 0xE9 to é, and a
    transport-layer charset (Content-Type) beats the in-document
    meta. Case = doc_id%5; decoded text and the parsed encoding
    regenerate by arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            case = d % 5
            ct = None
            if case == 0:
                raw = b"\xef\xbb\xbf" + (
                    f'<!DOCTYPE html><meta charset="windows-1251">'
                    f'<body>a{d}é').encode("utf-8")
            elif case == 1:
                raw = b"\xff\xfe" + (
                    f'<!DOCTYPE html><body>b{d}é'
                ).encode("utf-16-le")
            elif case == 2:
                raw = b"\xfe\xff" + (
                    f'<!DOCTYPE html><body>c{d}é'
                ).encode("utf-16-be")
            elif case == 3:
                raw = (f'<!DOCTYPE html>'
                       f'<meta charset="windows-1252">'
                       f'<body>d{d}').encode() + b"\xe9"
            else:
                raw = (f'<!DOCTYPE html><meta charset="utf-8">'
                       f'<body>e{d}').encode() + b"\xe9"
                ct = "text/html; charset=windows-1252"
            doc = parse_bytes(raw, content_type=ct)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class SerializeEscapeCensus:
    """Serializer escaping matrix (reference: HTMLSerialization.m per
    the WHATWG fragment-serialization algorithm): attribute values
    escape double-quote/&/nbsp but NOT angle brackets; text children
    escape &/</>/nbsp but NOT quotes. One round-trip through the
    real parser + serializer per doc; outer HTML regenerates by
    concat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_html = [], []
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<div title=\'q"{d} &amp; <x> \xa0\'>'
                    f't{d} &amp;&lt;tag&gt; "q" \xa0</div>')
            doc = parse(page)
            div = next(el for el in doc.elements_in_tree_order()
                       if el.tag == "div")
            out_id.append(key)
            out_html.append(serialize(div))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_html, pa.string())],
            names=["doc_id", "outer_html"])


class MutationApiCensus:
    """DOM mutation surface as a graded query (reference:
    HTMLReader's innerHTML setter + class-list API, M19): replace a
    div's children via the innerHTML SETTER (parsed through the real
    fragment algorithm with the div as context), toggle classes off
    and on, and re-serialize. Outer HTML and class state regenerate
    by arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "outer_html", "class_attr",
                                "has_b", "sibling_text")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<div id="t" class="a b"><b>old{d}</b>'
                        f'</div><p>k{d}</p>')
            div = next(el for el in doc.elements_in_tree_order()
                       if el.tag == "div")
            div.inner_html = f'<i>new{d}</i>tx{d}'
            div.toggle_class("a")
            div.toggle_class("c")
            p_text = next(el.text_content
                          for el in doc.elements_in_tree_order()
                          if el.tag == "p")
            cols["doc_id"].append(key)
            cols["outer_html"].append(serialize(div))
            cols["class_attr"].append(div.attrs.get("class", ""))
            cols["has_b"].append(
                int(any(el.tag == "b"
                        for el in doc.elements_in_tree_order())))
            cols["sibling_text"].append(p_text)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["outer_html"], pa.string()),
             pa.array(cols["class_attr"], pa.string()),
             pa.array(cols["has_b"], pa.int64()),
             pa.array(cols["sibling_text"], pa.string())],
            names=["doc_id", "outer_html", "class_attr", "has_b",
                   "sibling_text"])


class TreeOrderCensus:
    """Forward and REVERSE tree enumeration as a graded query
    (reference: HTMLReader treeEnumerator /
    reversedTreeEnumerator, M18): tag sequences of both walks over
    a fixed nested shape, joined with '>'. Reverse is the exact
    mirror of forward; both regenerate by arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_f, out_r = [], [], []
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<div><b>x{d}</b><i>y{d}</i></div>'
                        f'<p>z{d}</p>')
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            fwd = [n.tag for n in body.tree_order()
                   if hasattr(n, "tag")]
            rev = [n.tag for n in body.reversed_tree_order()
                   if hasattr(n, "tag")]
            out_id.append(key)
            out_f.append(">".join(fwd))
            out_r.append(">".join(rev))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_f, pa.string()),
             pa.array(out_r, pa.string())],
            names=["doc_id", "forward_tags", "reverse_tags"])


class CombinatorSelectorCensus:
    """Combinator and structural-pseudo selector matrix through the
    real engine (reference: HTMLSelector.m combinator walk + an+b
    machinery): child (>), adjacent (+), general sibling (~),
    :nth-child(odd) over m=(d%4+2) list items, :not(.x) and
    :first-of-type. Selectors compile once per worker; every count
    arithmetic in doc_id."""

    def __init__(self) -> None:
        self.sels = [compile_selector(s) for s in (
            "div > p", "p + span", "span ~ b",
            "li:nth-child(odd)", "p:not(.x)", "li:first-of-type")]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        counts = [[] for _ in self.sels]
        for key in ids:
            d = int(key)
            m = d % 4 + 2
            lis = "".join(f"<li>i{j}</li>" for j in range(m))
            page = (f'<!DOCTYPE html><body><div>'
                    f'<p class="x">p0</p><span>s</span>'
                    f'<b>b0</b><p>p1</p></div><ul>{lis}</ul>')
            doc = parse(page)
            els = list(doc.elements_in_tree_order())
            for i, sel in enumerate(self.sels):
                counts[i].append(
                    sum(1 for e in els if sel.matches(e)))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64())]
            + [pa.array(c, pa.int64()) for c in counts],
            names=["doc_id", "n_child_p", "n_adjacent", "n_sibling",
                   "n_odd_li", "n_not_x", "n_first_li"])


class AttrSelectorCensus:
    """Attribute-operator selector matrix through the real engine
    (reference: HTMLSelector.m attribute operators): ^= prefix, $=
    suffix, *= substring (with a per-doc needle), ~= word list, |=
    dash-prefix, and a conjunction of two operators. Three anchor
    fixtures per page; counts constant, needle varies with
    doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = [[] for _ in range(6)]
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<a href="http://h{d}.com/x.pdf" lang="en-US" '
                    f'rel="nofollow ext">1</a>'
                    f'<a href="https://h{d}.org/y.html" lang="en" '
                    f'rel="ext">2</a>'
                    f'<a href="ftp://z{d}/f.pdf" lang="fr-FR" '
                    f'rel="me">3</a>')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            for i, sel in enumerate((
                    'a[href^="http"]', 'a[href$=".pdf"]',
                    f'a[href*="h{d}."]', 'a[rel~="ext"]',
                    'a[lang|="en"]',
                    'a[href^="http"][href$=".html"]')):
                cols[i].append(len(body.css(sel)))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64())]
            + [pa.array(c, pa.int64()) for c in cols],
            names=["doc_id", "n_prefix", "n_suffix", "n_substr",
                   "n_word", "n_dash", "n_conj"])


class FormStateCensus:
    """Form-state pseudo-classes through the real engine (reference:
    HTMLSelector.m :disabled/:enabled/:checked incl. the fieldset
    disabled CASCADE and its first-legend exception): a control
    inside the disabled fieldset's <legend> stays enabled, one
    outside the legend inherits disabled, and :checked matches both
    a checked checkbox and a selected option. Id lists arithmetic
    in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "disabled_ids",
                                "checked_ids", "n_enabled")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<fieldset disabled id="f{d}">'
                    f'<legend><input id="a{d}"></legend>'
                    f'<input id="b{d}"></fieldset>'
                    f'<input id="e{d}" disabled><input id="g{d}">'
                    f'<input type="checkbox" checked id="c{d}">'
                    f'<option selected id="o{d}"></option>')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            dis = ",".join(e.attrs.get("id", "?")
                           for e in body.css(":disabled"))
            chk = ",".join(e.attrs.get("id", "?")
                           for e in body.css(":checked"))
            cols["doc_id"].append(key)
            cols["disabled_ids"].append(dis)
            cols["checked_ids"].append(chk)
            cols["n_enabled"].append(len(body.css(":enabled")))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["disabled_ids"], pa.string()),
             pa.array(cols["checked_ids"], pa.string()),
             pa.array(cols["n_enabled"], pa.int64())],
            names=["doc_id", "disabled_ids", "checked_ids",
                   "n_enabled"])


class StructuralPseudoCensus:
    """Structural pseudo-classes through the real engine (reference:
    HTMLSelector.m :empty/:only-child/:nth-last-child/
    :last-of-type): over an empty div, a lone span, and m=(d%3+2)
    list items — nth-last-child(2) picks the (m-1)th item. Matched
    ids arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "empty_id",
                                "only_child_id", "nth_last2_id",
                                "last_of_type_id")}
        for key in ids:
            d = int(key)
            m = d % 3 + 2
            lis = "".join(f'<li id="l{d}_{j}">t{j}' for j in range(m))
            page = (f'<!DOCTYPE html><body><div id="d{d}"></div>'
                    f'<div id="w{d}"><span id="s{d}">x</span></div>'
                    f'<ul>{lis}</ul>')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")

            def one(sel):
                r = body.css(sel)
                return r[0].attrs.get("id", "?") if r else ""
            cols["doc_id"].append(key)
            cols["empty_id"].append(one(":empty"))
            cols["only_child_id"].append(one("span:only-child"))
            cols["nth_last2_id"].append(one("li:nth-last-child(2)"))
            cols["last_of_type_id"].append(one("li:last-of-type"))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["empty_id"], pa.string()),
             pa.array(cols["only_child_id"], pa.string()),
             pa.array(cols["nth_last2_id"], pa.string()),
             pa.array(cols["last_of_type_id"], pa.string())],
            names=["doc_id", "empty_id", "only_child_id",
                   "nth_last2_id", "last_of_type_id"])


class SelectorEscapeCensus:
    """CSS identifier escapes through the real engine (reference:
    HTMLSelector.m ident parser): a leading-digit id needs the
    hex-escape form (#\\31 ...), a literal dot in a class escapes
    as \\., and compound class selectors chain. Matched texts
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "digit_id_text",
                                "dot_class_text",
                                "compound_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<div id="1a{d}">n{d}</div>'
                    f'<div class="a.b">c{d}</div>'
                    f'<div class="x y{d}">w{d}</div>')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")

            def one(sel):
                r = body.css(sel)
                return r[0].text_content if r else ""
            cols["doc_id"].append(key)
            cols["digit_id_text"].append(one(f"#\\31 a{d}"))
            cols["dot_class_text"].append(one(".a\\.b"))
            cols["compound_text"].append(one(f".x.y{d}"))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["digit_id_text"], pa.string()),
             pa.array(cols["dot_class_text"], pa.string()),
             pa.array(cols["compound_text"], pa.string())],
            names=["doc_id", "digit_id_text", "dot_class_text",
                   "compound_text"])


class SvgTitleDescCensus:
    """SVG title/desc integration points through the real parser
    (reference: HTMLParser.m HTML-integration-point list per
    WHATWG): <title> and <desc> INSIDE svg stay svg-namespaced but
    host HTML children (<b>/<i> parse as html-ns elements), unlike
    the head <title> which is RCDATA. Namespaces and texts
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "title_ns", "b_ns",
                                "desc_ns", "i_ns", "joined_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><svg>'
                    f'<title><b>bt{d}</b></title>'
                    f'<desc><i>di{d}</i></desc><circle/></svg>')
            doc = parse(page)
            tns = bns = dns = ins = ""
            texts = []
            for el in doc.elements_in_tree_order():
                if el.tag == "title":
                    tns = el.namespace
                elif el.tag == "b":
                    bns = el.namespace
                    texts.append(el.text_content)
                elif el.tag == "desc":
                    dns = el.namespace
                elif el.tag == "i":
                    ins = el.namespace
                    texts.append(el.text_content)
            cols["doc_id"].append(key)
            cols["title_ns"].append(tns)
            cols["b_ns"].append(bns)
            cols["desc_ns"].append(dns)
            cols["i_ns"].append(ins)
            cols["joined_text"].append("|".join(texts))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["title_ns"], pa.string()),
             pa.array(cols["b_ns"], pa.string()),
             pa.array(cols["desc_ns"], pa.string()),
             pa.array(cols["i_ns"], pa.string()),
             pa.array(cols["joined_text"], pa.string())],
            names=["doc_id", "title_ns", "b_ns", "desc_ns", "i_ns",
                   "joined_text"])


class HeadTextPopCensus:
    """Stray non-whitespace text inside <head> through the real
    parser (reference: HTMLParser.m 'in head' anything-else arm per
    WHATWG): the text pops the head, synthesizes <body>, and — the
    subtle part — a LATER <title> now runs the in-head RULES at the
    current position, landing in BODY (contrast head_misnest_census
    where 'after head' pushes it back into head). Pinned by
    arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "head_html",
                                "title_parent", "body_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><head><meta charset="utf-8">'
                    f'x{d}<title>t{d}</title></head><body>y{d}')
            doc = parse(page)
            head = body = None
            title_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "head":
                    head = el
                elif el.tag == "body":
                    body = el
                elif el.tag == "title":
                    title_parent = el.parent.tag
            cols["doc_id"].append(key)
            cols["head_html"].append(serialize_fragment(head))
            cols["title_parent"].append(title_parent)
            cols["body_text"].append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["head_html"], pa.string()),
             pa.array(cols["title_parent"], pa.string()),
             pa.array(cols["body_text"], pa.string())],
            names=["doc_id", "head_html", "title_parent",
                   "body_text"])


class NestedTableCensus:
    """Nested-table dichotomy through the real parser (reference:
    HTMLParser.m 'in table' table arm per WHATWG): a table inside a
    CELL nests legally (both get synthesized tbodys), while a table
    DIRECTLY inside a table implies </table> — the outer closes
    empty and the inner becomes its sibling. Ids and texts
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "inner_parent_tag",
                                "outer_kids", "sibling_ids",
                                "cell_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><table id="o{d}"><tr>'
                    f'<td><table id="i{d}"><tr><td>a{d}</table>'
                    f'</td></tr></table>')
            doc = parse(page)
            inner_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "table" \
                        and el.attrs.get("id") == f"i{d}":
                    inner_parent = el.parent.tag
            page2 = (f'<!DOCTYPE html><body><table id="p{d}">'
                     f'<table id="q{d}"><tr><td>b{d}</table>')
            doc2 = parse(page2)
            body2 = next(el for el in doc2.elements_in_tree_order()
                         if el.tag == "body")
            sib = ",".join(c.attrs.get("id", "?")
                           for c in body2.children
                           if getattr(c, "tag", None) == "table")
            outer_kids = -1
            cell = ""
            for el in doc2.elements_in_tree_order():
                if el.tag == "table" \
                        and el.attrs.get("id") == f"p{d}":
                    outer_kids = len(el.children)
                elif el.tag == "td":
                    cell = el.text_content
            cols["doc_id"].append(key)
            cols["inner_parent_tag"].append(inner_parent)
            cols["outer_kids"].append(outer_kids)
            cols["sibling_ids"].append(sib)
            cols["cell_text"].append(cell)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["inner_parent_tag"], pa.string()),
             pa.array(cols["outer_kids"], pa.int64()),
             pa.array(cols["sibling_ids"], pa.string()),
             pa.array(cols["cell_text"], pa.string())],
            names=["doc_id", "inner_parent_tag", "outer_kids",
                   "sibling_ids", "cell_text"])


class TableInputExceptionCensus:
    """The in-table input/script exceptions through the real parser
    (reference: HTMLParser.m 'in table' input/script/style arms per
    WHATWG): an <input type=hidden> stays INSIDE the table (the
    special no-foster branch) while a text input FOSTERS out before
    it; <script> and <style> also stay inside the table. Parents
    and attributes arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "hidden_parent",
                                "text_parent", "script_parent",
                                "style_parent", "script_text",
                                "body_first")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><table>'
                    f'<input type="hidden" name="h{d}">'
                    f'<input type="text" name="t{d}">'
                    f'<tr><td>c{d}</table>')
            doc = parse(page)
            hid = txt = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "input":
                    if el.attrs.get("type") == "hidden":
                        hid = el.parent.tag
                    else:
                        txt = el.parent.tag
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            first = next((c.tag for c in body.children
                          if hasattr(c, "tag")), "")
            page2 = (f'<!DOCTYPE html><body><table>'
                     f'<script>s{d}</script><style>y{d}</style>'
                     f'<tr><td>c{d}</table>')
            doc2 = parse(page2)
            sp = stp = st = ""
            for el in doc2.elements_in_tree_order():
                if el.tag == "script":
                    sp = el.parent.tag
                    st = el.text_content
                elif el.tag == "style":
                    stp = el.parent.tag
            cols["doc_id"].append(key)
            cols["hidden_parent"].append(hid)
            cols["text_parent"].append(txt)
            cols["script_parent"].append(sp)
            cols["style_parent"].append(stp)
            cols["script_text"].append(st)
            cols["body_first"].append(first)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["hidden_parent"], pa.string()),
             pa.array(cols["text_parent"], pa.string()),
             pa.array(cols["script_parent"], pa.string()),
             pa.array(cols["style_parent"], pa.string()),
             pa.array(cols["script_text"], pa.string()),
             pa.array(cols["body_first"], pa.string())],
            names=["doc_id", "hidden_parent", "text_parent",
                   "script_parent", "style_parent", "script_text",
                   "body_first"])


class RowSynthesisCensus:
    """Row synthesis and cell unwinding through the real parser
    (reference: HTMLParser.m 'in table body'/'in row' arms per
    WHATWG): a <td> directly inside <tbody> SYNTHESIZES its <tr>,
    </tr> closes the open cell, and the next bare <td> synthesizes
    a second row — m=(d%3+1) bare cells become m rows. Counts
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_rows", "n_cells",
                                "first_text", "last_text")}
        for key in ids:
            d = int(key)
            m = d % 3 + 1
            cells = "</tr>".join(f"<td>a{d}_{i}" for i in range(m))
            page = (f'<!DOCTYPE html><body><table><tbody>'
                    f'{cells}</table>')
            doc = parse(page)
            n_rows = n_cells = 0
            first = last = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "tr":
                    n_rows += 1
                elif el.tag == "td":
                    n_cells += 1
                    if not first:
                        first = el.text_content
                    last = el.text_content
            cols["doc_id"].append(key)
            cols["n_rows"].append(n_rows)
            cols["n_cells"].append(n_cells)
            cols["first_text"].append(first)
            cols["last_text"].append(last)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_rows"], pa.int64()),
             pa.array(cols["n_cells"], pa.int64()),
             pa.array(cols["first_text"], pa.string()),
             pa.array(cols["last_text"], pa.string())],
            names=["doc_id", "n_rows", "n_cells", "first_text",
                   "last_text"])


class AfterFramesetCensus:
    """The 'after frameset' / 'after after frameset' modes through
    the real parser (reference: HTMLParser.m afterFrameset arms per
    WHATWG): comments and <noframes> still attach to html, stray
    TEXT and stray elements are IGNORED outright (no body exists to
    catch them), and a comment after </html> attaches to the
    DOCUMENT. All pinned by arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Comment

        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "html_elements",
                                "html_comment", "noframes_text",
                                "doc_comment", "has_body")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><html><frameset>'
                    f'<frame src="f{d}.html"></frameset>'
                    f'<!--af{d}--><noframes>nf{d}</noframes>'
                    f'stray{d}<div>ign{d}</div></html>'
                    f'<!--end{d}-->')
            doc = parse(page)
            html = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "html")
            el_tags = ",".join(c.tag for c in html.children
                               if hasattr(c, "tag"))
            hcom = next((c.data for c in html.children
                         if isinstance(c, Comment)), "")
            nft = next((el.text_content
                        for el in doc.elements_in_tree_order()
                        if el.tag == "noframes"), "")
            dcom = next((c.data for c in doc.children
                         if isinstance(c, Comment)
                         and c.data.startswith("end")), "")
            has_body = int(any(el.tag == "body"
                               for el in
                               doc.elements_in_tree_order()))
            cols["doc_id"].append(key)
            cols["html_elements"].append(el_tags)
            cols["html_comment"].append(hcom)
            cols["noframes_text"].append(nft)
            cols["doc_comment"].append(dcom)
            cols["has_body"].append(has_body)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["html_elements"], pa.string()),
             pa.array(cols["html_comment"], pa.string()),
             pa.array(cols["noframes_text"], pa.string()),
             pa.array(cols["doc_comment"], pa.string()),
             pa.array(cols["has_body"], pa.int64())],
            names=["doc_id", "html_elements", "html_comment",
                   "noframes_text", "doc_comment", "has_body"])


class SvgAttrNegativeCensus:
    """The NEGATIVE side of SVG attribute adjustment (reference:
    HTMLParser.m adjustSVGAttributes table per WHATWG): the
    tokenizer lowercases every attribute name, the adjust table
    restores pathLength/viewBox — and an attr NOT in the table
    (myAttr) stays lowercased. Keys and values arithmetic in
    doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "attr_keys", "my_value")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body><svg>'
                        f'<path pathLength="5" myAttr="v{d}" '
                        f'viewBox="0 0 1 1"/></svg>')
            path = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "path")
            cols["doc_id"].append(key)
            cols["attr_keys"].append(",".join(path.attrs))
            cols["my_value"].append(path.attrs.get("myattr", "?"))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["attr_keys"], pa.string()),
             pa.array(cols["my_value"], pa.string())],
            names=["doc_id", "attr_keys", "my_value"])


class MenuitemKeygenCensus:
    """2016-era menuitem/keygen parity (reference: HTMLParser.m
    menuitem arms :707/:887/:939 + the HTMLSerialization.m:160 void
    list that INCLUDES menuitem and keygen): a second <menuitem>
    pops the open one, the TREE keeps their text children
    (text_content works), yet serialization renders both as VOID
    tags — children omitted — exactly like the reference. All
    pinned by arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "serialized",
                                "menuitem1_text", "n_menuitems",
                                "keygen_parent")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><menu>'
                    f'<menuitem icon="i{d}">m{d}'
                    f'<menuitem>n{d}</menu>'
                    f'<keygen name="k{d}">tail{d}')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            m1 = ""
            n_mi = 0
            kp = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "menuitem":
                    n_mi += 1
                    if n_mi == 1:
                        m1 = el.text_content
                elif el.tag == "keygen":
                    kp = el.parent.tag
            cols["doc_id"].append(key)
            cols["serialized"].append(serialize_fragment(body))
            cols["menuitem1_text"].append(m1)
            cols["n_menuitems"].append(n_mi)
            cols["keygen_parent"].append(kp)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["serialized"], pa.string()),
             pa.array(cols["menuitem1_text"], pa.string()),
             pa.array(cols["n_menuitems"], pa.int64()),
             pa.array(cols["keygen_parent"], pa.string())],
            names=["doc_id", "serialized", "menuitem1_text",
                   "n_menuitems", "keygen_parent"])


class OptgroupEndCensus:
    """The </optgroup> double-pop nuance through the real parser
    (reference: HTMLParser.m inSelect end-tag arm: when the current
    node is an <option> whose parent is an <optgroup>, </optgroup>
    pops BOTH) — so the grouped option stays inside the optgroup
    and the next option lands directly under select. Parents and
    texts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "grouped_parent",
                                "grouped_text", "after_parent",
                                "after_text", "optgroup_label")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><select>'
                    f'<optgroup label="g{d}"><option>a{d}'
                    f'</optgroup><option>b{d}</select>')
            doc = parse(page)
            gp = gt = ap = at = lbl = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "option":
                    if el.parent.tag == "optgroup":
                        gp, gt = el.parent.tag, el.text_content
                    else:
                        ap, at = el.parent.tag, el.text_content
                elif el.tag == "optgroup":
                    lbl = el.attrs.get("label", "?")
            cols["doc_id"].append(key)
            cols["grouped_parent"].append(gp)
            cols["grouped_text"].append(gt)
            cols["after_parent"].append(ap)
            cols["after_text"].append(at)
            cols["optgroup_label"].append(lbl)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["grouped_parent"], pa.string()),
             pa.array(cols["grouped_text"], pa.string()),
             pa.array(cols["after_parent"], pa.string()),
             pa.array(cols["after_text"], pa.string()),
             pa.array(cols["optgroup_label"], pa.string())],
            names=["doc_id", "grouped_parent", "grouped_text",
                   "after_parent", "after_text", "optgroup_label"])


class AttrCharrefExceptionCensus:
    """The attribute-context character-reference EXCEPTION through
    the real tokenizer (reference: HTMLTokenizer.m character-
    reference-in-attribute rule per WHATWG): a legacy named ref
    followed by '=' or an alphanumeric stays LITERAL inside an
    attribute value (&copy=2, &amp=4, &lt7 — URLs survive) while
    the same text DECODES in character data (©=2); with a
    semicolon it decodes in both. Numeric refs missing their
    semicolon still decode (&#65 → A, &#x42Z → BZ) and a bare &#;
    stays literal. All regenerate by concat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "href", "a_text",
                                "b_title", "numeric_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<a href="?x=1&copy=2&not=3&amp=4&lt{d}">'
                    f't{d} &copy=2 &not=3</a>'
                    f'<b title="&copy; &notin; &ampx">u{d}</b>'
                    f'<p>&#65 &#x42Z &#;x</p>')
            doc = parse(page)
            href = a_text = b_title = num = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "a":
                    href = el.attrs.get("href", "")
                    a_text = el.text_content
                elif el.tag == "b":
                    b_title = el.attrs.get("title", "")
                elif el.tag == "p":
                    num = el.text_content
            cols["doc_id"].append(key)
            cols["href"].append(href)
            cols["a_text"].append(a_text)
            cols["b_title"].append(b_title)
            cols["numeric_text"].append(num)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["href"], pa.string()),
             pa.array(cols["a_text"], pa.string()),
             pa.array(cols["b_title"], pa.string()),
             pa.array(cols["numeric_text"], pa.string())],
            names=["doc_id", "href", "a_text", "b_title",
                   "numeric_text"])


class IgnoredEndTagCensus:
    """End tags that are silently IGNORED when nothing matches
    (reference: HTMLParser.m in-body end-tag arms per WHATWG) — the
    contrast to </p>/</br> which SYNTHESIZE: stray </li>, </dd>,
    </dt>, </h2>, and a doubled </li> after a closed item all
    vanish, text runs merge, and the list stays intact. Pinned by
    arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "body_text", "n_li",
                                "li_text", "n_elements")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>a{d}</li></dd></dt>'
                    f'b{d}</h2>c{d}<ul><li>x{d}</li></li></ul>')
            doc = parse(page)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            n_li = 0
            li_text = ""
            n_el = 0
            for el in body.tree_order():
                if not hasattr(el, "tag") or el.tag == "body":
                    continue
                n_el += 1
                if el.tag == "li":
                    n_li += 1
                    li_text = el.text_content
            cols["doc_id"].append(key)
            cols["body_text"].append(body.text_content)
            cols["n_li"].append(n_li)
            cols["li_text"].append(li_text)
            cols["n_elements"].append(n_el)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["body_text"], pa.string()),
             pa.array(cols["n_li"], pa.int64()),
             pa.array(cols["li_text"], pa.string()),
             pa.array(cols["n_elements"], pa.int64())],
            names=["doc_id", "body_text", "n_li", "li_text",
                   "n_elements"])


class CrlfNormalizeCensus:
    """M1 input preprocessing as a graded query (reference:
    HTMLReader stream preprocessing per WHATWG): \\r\\n and lone
    \\r both normalize to \\n in TEXT and in ATTRIBUTE values
    before tokenization. Strings regenerate with chr(10)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_title, out_text = [], [], []
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<p title="a\r\nb\rc\nd">'
                    f'x{d}\r\ny{d}\rz{d}\nw{d}</p>')
            doc = parse(page)
            p = next(el for el in doc.elements_in_tree_order()
                     if el.tag == "p")
            out_id.append(key)
            out_title.append(p.attrs.get("title", ""))
            out_text.append(p.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_title, pa.string()),
             pa.array(out_text, pa.string())],
            names=["doc_id", "title_attr", "p_text"])


class AdoptionChainCensus:
    """Multi-iteration adoption agency through the real parser
    (reference: HTMLParser.m adoption agency outer loop, M7): the
    classic <a><div> ladder — m=(d%3+2) levels produce 2m <a>
    elements (each level's empty original plus its clone inside the
    div), m nested divs, and the tail lands bare in the innermost
    div after the final </a>. All counts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_a", "n_div",
                                "max_div_depth", "innermost_text")}
        for key in ids:
            d = int(key)
            m = d % 3 + 2
            chain = "".join(f"<a href='{i}'><div>c{d}_{i}"
                            for i in range(m))
            page = f'<!DOCTYPE html><body>{chain}</a>tail{d}'
            doc = parse(page)
            n_a = n_div = 0
            best_depth = 0
            innermost = None

            def walk(node, depth):
                nonlocal n_a, n_div, best_depth, innermost
                for c in getattr(node, "children", []):
                    tag = getattr(c, "tag", None)
                    if tag == "a":
                        n_a += 1
                        walk(c, depth)
                    elif tag == "div":
                        n_div += 1
                        if depth + 1 > best_depth:
                            best_depth = depth + 1
                            innermost = c
                        walk(c, depth + 1)
                    elif tag is not None:
                        walk(c, depth)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            walk(body, 0)
            from ..kernel.dom import Text
            tail = "".join(c.data for c in innermost.children
                           if isinstance(c, Text)) \
                if innermost is not None else ""
            cols["doc_id"].append(key)
            cols["n_a"].append(n_a)
            cols["n_div"].append(n_div)
            cols["max_div_depth"].append(best_depth)
            cols["innermost_text"].append(tail)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_a"], pa.int64()),
             pa.array(cols["n_div"], pa.int64()),
             pa.array(cols["max_div_depth"], pa.int64()),
             pa.array(cols["innermost_text"], pa.string())],
            names=["doc_id", "n_a", "n_div", "max_div_depth",
                   "innermost_text"])


class NulAttrFormFeedCensus:
    """NUL in token-building contexts and form-feed whitespace
    (reference: HTMLTokenizer.m NUL arms + the \\f whitespace set):
    a NUL inside an attribute VALUE, an attribute NAME, or a TAG
    name becomes U+FFFD (contrast body text where it's dropped),
    and a form feed directly inside <table> counts as whitespace —
    it STAYS in the table instead of fostering. All regenerate
    with chr()."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "id_value", "odd_attr",
                                "odd_tag", "table_html")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<div id="a\x00b" c\x00d="v">x{d}</div>')
            div = next(el for el in doc.elements_in_tree_order()
                       if el.tag == "div")
            odd_attr = next((k for k in div.attrs if k != "id"), "")
            doc2 = parse(f'<!DOCTYPE html><body><di\x00v>z{d}')
            body2 = next(el for el in doc2.elements_in_tree_order()
                         if el.tag == "body")
            odd_tag = next((c.tag for c in body2.children
                            if hasattr(c, "tag")), "")
            doc3 = parse(f'<!DOCTYPE html><body>'
                         f'<table>\x0c<tr><td>y{d}</table>')
            body3 = next(el for el in doc3.elements_in_tree_order()
                         if el.tag == "body")
            cols["doc_id"].append(key)
            cols["id_value"].append(div.attrs.get("id", ""))
            cols["odd_attr"].append(odd_attr)
            cols["odd_tag"].append(odd_tag)
            cols["table_html"].append(serialize_fragment(body3))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["id_value"], pa.string()),
             pa.array(cols["odd_attr"], pa.string()),
             pa.array(cols["odd_tag"], pa.string()),
             pa.array(cols["table_html"], pa.string())],
            names=["doc_id", "id_value", "odd_attr", "odd_tag",
                   "table_html"])


class AfterHeadWsCensus:
    """Whitespace in 'after head' and charref boundary codepoints
    (reference: HTMLParser.m afterHead whitespace arm +
    HTMLTokenizer.m numeric range checks): whitespace between
    </head> and <body> is inserted as a TEXT child of <html>
    between head and body, and the numeric refs at the Unicode
    boundary (&#x10FFFF;, &#x10000;) decode to their exact
    codepoints. Shapes regenerate with chr()."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Text

        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "html_kid_shape",
                                "ws_len", "body_text",
                                "boundary_text")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><head>'
                        f'<meta charset="utf-8"></head>  '
                        f'<body>x{d}')
            html = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "html")
            shape = ",".join(
                (c.tag if hasattr(c, "tag") else "#text")
                for c in html.children)
            ws = "".join(c.data for c in html.children
                         if isinstance(c, Text))
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            doc2 = parse(f'<!DOCTYPE html><body>'
                         f'<p>A&#x10FFFF;B&#x10000;C{d}</p>')
            p = next(el for el in doc2.elements_in_tree_order()
                     if el.tag == "p")
            cols["doc_id"].append(key)
            cols["html_kid_shape"].append(shape)
            cols["ws_len"].append(len(ws))
            cols["body_text"].append(body.text_content)
            cols["boundary_text"].append(p.text_content)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["html_kid_shape"], pa.string()),
             pa.array(cols["ws_len"], pa.int64()),
             pa.array(cols["body_text"], pa.string()),
             pa.array(cols["boundary_text"], pa.string())],
            names=["doc_id", "html_kid_shape", "ws_len",
                   "body_text", "boundary_text"])


class ExtractDensityCensus:
    """The boilerplate-strip scoring gates as a graded query
    (north-star: text-density/link-density heuristics; reference:
    the HTMLReader-style DOM walk in kernel/extract.py): the SAME
    page extracted under three rule-sets — default (link-dense
    chrome dropped, short prose kept), lenient (nav survives), and
    a text-density gate (short prose ALSO dropped). Extractors
    compile once per worker; every output regenerates by concat."""

    def __init__(self) -> None:
        from ..kernel.extract import ExtractConfig, Extractor
        self.default = Extractor(ExtractConfig())
        self.lenient = Extractor(ExtractConfig(
            max_link_density=1.1, min_block_chars=1))
        self.density = Extractor(ExtractConfig(
            min_text_density=3.0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "default_text",
                                "lenient_text", "density_text")}
        for key in ids:
            d = int(key)
            chrome = "".join(f'<a href="/n{i}">nav{i}</a> '
                             for i in range(4))
            page = (f'<!DOCTYPE html><body>'
                    f'<div id="chrome">{chrome}</div>'
                    f'<div id="main"><p>alpha beta gamma delta '
                    f'epsilon zeta{d}</p></div>'
                    f'<div id="short"><p>tiny</p></div>')
            cols["doc_id"].append(key)
            cols["default_text"].append(
                self.default.extract_html(page))
            cols["lenient_text"].append(
                self.lenient.extract_html(page))
            cols["density_text"].append(
                self.density.extract_html(page))
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["default_text"], pa.string()),
             pa.array(cols["lenient_text"], pa.string()),
             pa.array(cols["density_text"], pa.string())],
            names=["doc_id", "default_text", "lenient_text",
                   "density_text"])


class ObjectAppletMarkerCensus:
    """object/applet AFE markers through the real parser (reference:
    HTMLParser.m applet/marquee/object arm per WHATWG): formatting
    opened INSIDE them is cleared to the marker at their end tag —
    the inner <i>/<b> never leak out — while the OUTER <i> stays
    open across both; <param> is a void child of object. Texts and
    counts arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "outer_i_text", "n_i",
                                "inner_i_text", "param_name",
                                "b_text", "b_parent")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><i>out{d}'
                    f'<object><param name="p{d}" value="v{d}">'
                    f'<i>in{d}</object>post{d}'
                    f'<applet code="a{d}"><b>ap{d}</applet>end{d}')
            doc = parse(page)
            n_i = 0
            outer = inner = pname = b_text = b_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "i":
                    n_i += 1
                    if n_i == 1:
                        outer = el.text_content
                    else:
                        inner = el.text_content
                elif el.tag == "param":
                    pname = el.attrs.get("name", "?")
                elif el.tag == "b":
                    b_text = el.text_content
                    b_parent = el.parent.tag
            cols["doc_id"].append(key)
            cols["outer_i_text"].append(outer)
            cols["n_i"].append(n_i)
            cols["inner_i_text"].append(inner)
            cols["param_name"].append(pname)
            cols["b_text"].append(b_text)
            cols["b_parent"].append(b_parent)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["outer_i_text"], pa.string()),
             pa.array(cols["n_i"], pa.int64()),
             pa.array(cols["inner_i_text"], pa.string()),
             pa.array(cols["param_name"], pa.string()),
             pa.array(cols["b_text"], pa.string()),
             pa.array(cols["b_parent"], pa.string())],
            names=["doc_id", "outer_i_text", "n_i", "inner_i_text",
                   "param_name", "b_text", "b_parent"])


class ParseErrorCodeCensus:
    """Spec parse-error codes through the graded gate (reference:
    HTMLReader's parse-error strings; WHATWG error names): six
    tokenizer-error families cycled by doc_id%6, each page emitting
    exactly the expected code list. The error-collection path
    (collect_errors=True — the pure-Python kernel, since the C
    parser bails on error collection by contract) is thereby
    driver-graded too."""

    CASES = (("<p>a{d}<", "eof-before-tag-name"),
             ("<p b{d}='x' b{d}='y'>t", "duplicate-attribute"),
             ("<p>&#xD800;x{d}", "surrogate-character-reference"),
             ("<!-- c{d} --!>t", "incorrectly-closed-comment"),
             ("<p a=b\"c>x{d}",
              "unexpected-character-in-unquoted-attribute-value"),
             ("<?bogus{d}>t",
              "unexpected-question-mark-instead-of-tag-name"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_codes, out_n = [], [], []
        for key in ids:
            d = int(key)
            frag, _want = self.CASES[d % len(self.CASES)]
            doc = parse(f"<!DOCTYPE html><body>"
                        + frag.format(d=d), collect_errors=True)
            out_id.append(key)
            out_codes.append(",".join(doc.parse_errors))
            out_n.append(len(doc.parse_errors))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_codes, pa.string()),
             pa.array(out_n, pa.int64())],
            names=["doc_id", "error_codes", "n_errors"])


class NestedForeignCensus:
    """Foreign content nested through integration points both ways
    (reference: HTMLParser.m adjusted-current-node logic per
    WHATWG): an <svg> opened inside a MathML TEXT integration point
    (mtext) re-enters the svg namespace with its own children, and
    a <math> inside svg's HTML integration point (foreignObject)
    re-enters mathml — the namespace chain alternates
    mathml→svg and svg→mathml cleanly. Chain strings arithmetic in
    doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "chain1", "chain2",
                                "mtext_text", "mi_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<math><mtext><svg><circle/></svg>x{d}'
                    f'</mtext></math>'
                    f'<svg><foreignObject><math><mi>m{d}</mi>'
                    f'</math></foreignObject></svg>')
            doc = parse(page)
            parts1, parts2 = [], []
            mtext_text = mi_text = ""
            seen_fo = False
            for el in doc.elements_in_tree_order():
                ns = el.namespace
                if el.tag == "mtext":
                    mtext_text = el.text_content
                elif el.tag == "mi":
                    mi_text = el.text_content
                if el.tag in ("math", "mtext", "circle") \
                        and not seen_fo:
                    parts1.append(f"{el.tag}:{ns}")
                elif el.tag == "svg" and el.parent.tag == "mtext":
                    parts1.append(f"{el.tag}:{ns}")
                elif el.tag == "foreignObject":
                    seen_fo = True
                    parts2.append(f"{el.tag}:{ns}")
                elif seen_fo and el.tag in ("math", "mi"):
                    parts2.append(f"{el.tag}:{ns}")
            cols["doc_id"].append(key)
            cols["chain1"].append(",".join(parts1))
            cols["chain2"].append(",".join(parts2))
            cols["mtext_text"].append(mtext_text)
            cols["mi_text"].append(mi_text)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["chain1"], pa.string()),
             pa.array(cols["chain2"], pa.string()),
             pa.array(cols["mtext_text"], pa.string()),
             pa.array(cols["mi_text"], pa.string())],
            names=["doc_id", "chain1", "chain2", "mtext_text",
                   "mi_text"])


class AnchorTableComboCensus:
    """The notorious a-in-a ACROSS a table (reference: HTMLParser.m
    a-start-tag adoption + foster parenting together, M7+M9): the
    second <a> runs the adoption agency, then foster-parents out of
    the table along with its text; the table keeps its cell; after
    </table> the still-active a[2] RECONSTRUCTS at body level to
    wrap the trailing text. Three anchors, all pinned by
    arithmetic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "n_a", "a1_text",
                                "last_a_text", "last_a_parent",
                                "td_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><a href="1">o{d}'
                    f'<table><a href="2">f{d}<tr><td>c{d}</table>'
                    f't{d}')
            doc = parse(page)
            n_a = 0
            a1 = last = last_parent = td = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "a":
                    n_a += 1
                    if n_a == 1:
                        a1 = el.text_content
                    last = el.text_content
                    last_parent = el.parent.tag
                elif el.tag == "td":
                    td = el.text_content
            cols["doc_id"].append(key)
            cols["n_a"].append(n_a)
            cols["a1_text"].append(a1)
            cols["last_a_text"].append(last)
            cols["last_a_parent"].append(last_parent)
            cols["td_text"].append(td)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["n_a"], pa.int64()),
             pa.array(cols["a1_text"], pa.string()),
             pa.array(cols["last_a_text"], pa.string()),
             pa.array(cols["last_a_parent"], pa.string()),
             pa.array(cols["td_text"], pa.string())],
            names=["doc_id", "n_a", "a1_text", "last_a_text",
                   "last_a_parent", "td_text"])


class EncodingLabelCensus:
    """WHATWG encoding-label aliasing through the byte entry point
    (reference: HTMLReader label table, S5): latin1/ISO-8859-1/
    ascii/l1 all resolve to windows-1252 (0xE9 → é), utf-8 labels
    survive whitespace padding and the UTF8 spelling (the stray
    0xE9 becomes U+FFFD), and an unknown label falls back to the
    default windows-1252. Case = doc_id%7."""

    LABELS = ("latin1", "ISO-8859-1", "ascii", " utf-8 ", "UTF8",
              "l1", "unknown-enc")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            lab = self.LABELS[d % len(self.LABELS)]
            raw = (f'<!DOCTYPE html><meta charset="{lab}">'
                   f'<body>x{d}').encode() + b"\xe9"
            doc = parse_bytes(raw)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class MetaCharsetFormCensus:
    """The meta-charset extraction forms through parse_bytes
    (WHATWG 'extracting a character encoding from a meta element';
    a documented EXTENSION — the reference never prescans meta,
    Sources/HTMLEncoding.m '// TODO Prescan?'): plain charset attr,
    http-equiv with and without whitespace around '=', a
    single-quoted value inside a double-quoted content, a quoted
    value MISSING its closing quote (fails → fallback), and a
    decoy 'charset' in an unrelated meta. Case = doc_id%6."""

    FORMS = (
        ('<meta charset="windows-1251">', "windows-1251"),
        ('<meta http-equiv="Content-Type" '
         'content="text/html; charset=windows-1251">',
         "windows-1251"),
        ('<meta http-equiv="content-type" '
         'content="text/html; CHARSET = windows-1251">',
         "windows-1251"),
        ("<meta content='text/html; charset=\"windows-1251\"' "
         "http-equiv='Content-Type'>", "windows-1251"),
        ('<meta http-equiv="content-type" '
         'content="text/html; charset=\'windows-1251">',
         "windows-1252"),
        ('<meta name="description" content="charset=koi8-r">'
         '<meta charset=windows-1251>', "windows-1251"),
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            form, _want = self.FORMS[d % len(self.FORMS)]
            raw = (f'<!DOCTYPE html>{form}<body>x{d}').encode() \
                + b"\xe9"
            doc = parse_bytes(raw)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class MetaUtf16RuleCensus:
    """The meta-declared-UTF-16 rule (WHATWG: a <meta charset>
    naming any UTF-16 flavor is treated as UTF-8, since the
    prescan only runs over ASCII-compatible bytes) plus the
    x-user-defined → windows-1252 substitution. Case = doc_id%3;
    encodings and decoded tails regenerate with chr()."""

    LABELS = ("utf-16", "UTF-16BE", "x-user-defined")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            lab = self.LABELS[d % 3]
            raw = (f'<!DOCTYPE html><meta charset="{lab}">'
                   f'<body>x{d}').encode() + b"\xe9"
            doc = parse_bytes(raw)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class AppropriateEndTagCensus:
    """Appropriate-end-tag matching in RAWTEXT/RCDATA states
    (reference: HTMLTokenizer.m appropriate-end-tag checks per
    WHATWG): a NON-matching end tag inside <script> (</style>)
    stays literal data, while the matching close works with
    attributes (</script foo=bar>), case folding + trailing space
    (</TITLE >), and a self-closing slash (</textarea/>). Texts
    regenerate by concat."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "script_text",
                                "title_text", "textarea_text",
                                "body_text")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body>'
                    f'<script>a{d}</style>b{d}</script foo=bar>'
                    f'<title>t{d}</TITLE >'
                    f'<textarea>u{d}</textarea/>post{d}')
            doc = parse(page)
            st = tt = ta = bt = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "script":
                    st = el.text_content
                elif el.tag == "title":
                    tt = el.text_content
                elif el.tag == "textarea":
                    ta = el.text_content
                elif el.tag == "body":
                    bt = el.text_content
            cols["doc_id"].append(key)
            cols["script_text"].append(st)
            cols["title_text"].append(tt)
            cols["textarea_text"].append(ta)
            cols["body_text"].append(bt)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["script_text"], pa.string()),
             pa.array(cols["title_text"], pa.string()),
             pa.array(cols["textarea_text"], pa.string()),
             pa.array(cols["body_text"], pa.string())],
            names=["doc_id", "script_text", "title_text",
                   "textarea_text", "body_text"])


class NthExpressionCensus:
    """an+b micro-syntax forms through the real engine (reference:
    HTMLSelectorTests.m HTMLNthExpressionFromString cases incl. the
    whitespace-padded '   odd    '): padded keywords, spaced
    '2n + 1', negative coefficient '-n+3', 'even', and
    nth-of-type multiples over six list items. Matched id lists
    constant; ids carry doc_id."""

    SELS = ("li:nth-child(   odd    )", "li:nth-child( 2n + 1 )",
            "li:nth-child(-n+3)", "li:nth-child(even)",
            "li:nth-of-type(3n)")

    def __init__(self) -> None:
        self.compiled = [compile_selector(s) for s in self.SELS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = [[] for _ in self.compiled]
        for key in ids:
            d = int(key)
            lis = "".join(f'<li id="l{d}_{j}">x' for j in range(6))
            doc = parse(f'<!DOCTYPE html><body><ul>{lis}</ul>')
            els = [e for e in doc.elements_in_tree_order()
                   if e.tag == "li"]
            for i, sel in enumerate(self.compiled):
                cols[i].append(",".join(
                    e.attrs["id"] for e in els if sel.matches(e)))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64())]
            + [pa.array(c, pa.string()) for c in cols],
            names=["doc_id", "odd_ids", "spaced_ids", "neg_ids",
                   "even_ids", "of_type_ids"])


class ForeignObjectScopeCensus:
    """The integration-point scope quirk (reference: HTMLParser.m
    any-other-end-tag loop per WHATWG): a <p> inside foreignObject
    does NOT close the outer <p> (scope barrier), and once that
    inner HTML <p> is current, BOTH </foreignObject> (case-mismatch
    against the adjusted name) and </svg> hit the special-category
    early-exit of the any-other-end-tag loop and are IGNORED — so
    trailing text lands inside the INNER p, still under
    foreignObject. Structure arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "outer_p_text",
                                "inner_p_text", "inner_p_parent",
                                "n_p")}
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><body><p>out{d}'
                    f'<svg><foreignObject><p>in{d}'
                    f'</foreignObject></svg>tail{d}')
            doc = parse(page)
            n_p = 0
            outer = inner = inner_parent = ""
            for el in doc.elements_in_tree_order():
                if el.tag == "p":
                    n_p += 1
                    if n_p == 1:
                        outer = el.text_content
                    else:
                        inner = el.text_content
                        inner_parent = el.parent.tag
            cols["doc_id"].append(key)
            cols["outer_p_text"].append(outer)
            cols["inner_p_text"].append(inner)
            cols["inner_p_parent"].append(inner_parent)
            cols["n_p"].append(n_p)
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["outer_p_text"], pa.string()),
             pa.array(cols["inner_p_text"], pa.string()),
             pa.array(cols["inner_p_parent"], pa.string()),
             pa.array(cols["n_p"], pa.int64())],
            names=["doc_id", "outer_p_text", "inner_p_text",
                   "inner_p_parent", "n_p"])


class LinkPseudoCensus:
    """:link and :root semantics through the real engine (reference:
    HTMLSelector.m link pseudo-class): :link matches <a> AND <area>
    carrying href but NOT a name-only anchor; :root matches only
    the html element (empty when scoped under body). Hrefs
    arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols = {k: [] for k in ("doc_id", "link_hrefs",
                                "n_body_root", "root_tag")}
        for key in ids:
            d = int(key)
            doc = parse(f'<!DOCTYPE html><body>'
                        f'<a href="h{d}">l</a><a name="n{d}">m</a>'
                        f'<area href="q{d}">')
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            links = ",".join(e.attrs.get("href", "")
                             for e in body.css(":link"))
            roots = doc.css(":root")
            cols["doc_id"].append(key)
            cols["link_hrefs"].append(links)
            cols["n_body_root"].append(len(body.css(":root")))
            cols["root_tag"].append(roots[0].tag if roots else "")
        return pa.Table.from_arrays(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["link_hrefs"], pa.string()),
             pa.array(cols["n_body_root"], pa.int64()),
             pa.array(cols["root_tag"], pa.string())],
            names=["doc_id", "link_hrefs", "n_body_root",
                   "root_tag"])


class DocumentSerializeCensus:
    """Whole-document serialization round trip (reference:
    HTMLSerializerTests.m document output): doctype node, html
    attributes, head/title, body text and comment all re-emit in
    order; a second parse of the output is a fixpoint (identical
    serialization). Strings arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_html, out_fix = [], [], []
        for key in ids:
            d = int(key)
            page = (f'<!DOCTYPE html><html lang="en"><head>'
                    f'<title>t{d}</title></head><body>x{d}'
                    f'<!--c{d}--></body></html>')
            doc = parse(page)
            s1 = serialize(doc)
            s2 = serialize(parse(s1))
            out_id.append(key)
            out_html.append(s1)
            out_fix.append(int(s1 == s2))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_html, pa.string()),
             pa.array(out_fix, pa.int64())],
            names=["doc_id", "document_html", "fixpoint"])


class DefaultSniffCensus:
    """Default-encoding behavior with NO declaration anywhere
    (reference: HTMLDocumentTests.m
    testParsedStringEncodingEmptyDocument — windows-1252): empty
    bytes, pure-ASCII bytes, and an 8-bit byte without any meta all
    sniff to the windows-1252 default; 0xE9 decodes as é. Case =
    doc_id%3."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            case = d % 3
            raw = (b"", f"<p>plain{d}</p>".encode(),
                   f"<p>caf\xe9{d}</p>".encode("latin-1"))[case]
            doc = parse_bytes(raw)
            body = next((el for el in doc.elements_in_tree_order()
                         if el.tag == "body"), None)
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content if body is not None
                           else "")
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class LossyDecodeCensus:
    """Lossy windows-1252 decoding of the five UNUSED positions
    (reference: HTMLEncoding.m UsesLossyWindows1252Decoding — maps
    0x81/0x8D/0x8F/0x90/0x9D to U+FFFD like html5lib-python; the
    reference's testIncorrectContentTypeHeader asserts the same
    U+FFFD text): each doc decodes one unused byte between per-doc
    markers. Case = doc_id%5."""

    BYTES = (0x81, 0x8D, 0x8F, 0x90, 0x9D)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_enc, out_txt = [], [], []
        for key in ids:
            d = int(key)
            b = self.BYTES[d % 5]
            raw = (f"<p>a{d}".encode() + bytes([b])
                   + f"b{d}</p>".encode())
            doc = parse_bytes(raw)
            body = next(el for el in doc.elements_in_tree_order()
                        if el.tag == "body")
            out_id.append(key)
            out_enc.append(doc.parsed_encoding)
            out_txt.append(body.text_content)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_enc, pa.string()),
             pa.array(out_txt, pa.string())],
            names=["doc_id", "parsed_encoding", "body_text"])


class RawSerializeCensus:
    """Raw-text serialization parity (reference:
    HTMLSerializerTests.m testRCDATA/testDoctype): script/style
    children serialize UNESCAPED, and a doctype serializes as bare
    <!DOCTYPE name> with case preserved and public/system ids
    DROPPED. Strings arithmetic in doc_id."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.dom import Doctype, Element, Text

        ids = batch.column("doc_id").to_pylist()
        out_id, out_sc, out_dt = [], [], []
        for key in ids:
            d = int(key)
            s = Element("script")
            s.append_child(Text(f"a{d}<b>c&d{d}"))
            dt = Doctype("HTML", "-//W3C//DTD HTML 4.01//EN",
                         "http://example.com/x")
            out_id.append(key)
            out_sc.append(serialize(s))
            out_dt.append(serialize(dt))
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()),
             pa.array(out_sc, pa.string()),
             pa.array(out_dt, pa.string())],
            names=["doc_id", "script_html", "doctype_html"])


class LinkExtract:
    """Link/anchor extraction — the web-pipeline edge-table builder: parse
    each generated page (boilerplate links + the per-doc ref block) and
    emit (doc_id, seq, href, anchor) for every a[href] in tree order.
    The selector is compiled once per actor; anchors decode entities
    (&nbsp; -> U+00A0) through the real tokenizer."""

    def __init__(self) -> None:
        self.sel = compile_selector("a[href]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_seq, out_href, out_anchor = [], [], [], []
        for key, t in zip(ids, texts):
            page = build_page(int(key), t or "").replace(
                "</body>", ref_links_block(int(key)) + "</body>")
            doc = parse(page)
            seq = 0
            for node in doc.elements_in_tree_order():
                if self.sel.matches(node):
                    out_id.append(key)
                    out_seq.append(seq)
                    out_href.append(node.attrs.get("href", ""))
                    out_anchor.append(node.text_content)
                    seq += 1
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()), pa.array(out_seq, pa.int64()),
             pa.array(out_href, pa.string()),
             pa.array(out_anchor, pa.string())],
            names=["doc_id", "seq", "href", "anchor"])


class HostEdges:
    """Host-graph edge extraction — the PageRank/domain-ranking front
    end: parse each generated page, take every a[href] (same walk as
    LinkExtract), keep absolute links (host != '') and emit one
    (src=publishing source, dst=target host) row per link. Downstream
    reduces to distinct host pairs with the block-local combiner."""

    def __init__(self) -> None:
        self.sel = compile_selector("a[href]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.urls import url_host_column
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        out_src, hrefs = [], []
        for key, sname, t in zip(ids, srcs, texts):
            page = build_page(int(key), t or "").replace(
                "</body>", ref_links_block(int(key)) + "</body>")
            doc = parse(page)
            for node in doc.elements_in_tree_order():
                if self.sel.matches(node):
                    out_src.append(sname)
                    hrefs.append(node.attrs.get("href", ""))
        hosts = url_host_column(pa.array(hrefs, pa.string()))
        t = pa.Table.from_arrays(
            [pa.array(out_src, pa.string()), hosts], names=["src", "dst"])
        import pyarrow.compute as pc
        return t.filter(pc.not_equal(t.column("dst"), ""))


class QuirksMode:
    """M5: doctype family of the generated page -> quirks classification."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        modes = []
        for key, t in zip(ids, texts):
            doc = parse(build_page(int(key), t or ""))
            modes.append(doc.quirks_mode)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(modes, pa.string())],
            names=["doc_id", "quirks_mode"])


class EncodingSniff:
    """S4/S5: encode text bytes three ways, sniff, report the label."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.encoding import sniff_encoding
        import codecs
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        labels, confs = [], []
        for key, t in zip(ids, texts):
            t = t or ""
            v = int(key) % 3
            if v == 0:
                data = codecs.BOM_UTF8 + t.encode("utf-8")
                ct = None
            elif v == 1:
                data = codecs.BOM_UTF16_LE + t.encode("utf-16-le")
                ct = None
            else:
                data = t.encode("utf-8")
                ct = "text/html; charset=iso-8859-1"
            res = sniff_encoding(data, ct)
            labels.append(res.label)
            confs.append(res.confidence)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(labels, pa.string()),
             pa.array(confs, pa.string())],
            names=["doc_id", "enc_label", "confidence"])


class MetaCharsetRestart:
    """S1+M6: utf-8 bytes, no BOM/header, <meta charset=utf-8> with a
    non-cp1252-roundtrippable marker -> the one-doc reparse fires."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        encs, contents = [], []
        for t in texts:
            page = ("<html><head><meta charset=utf-8></head>"
                    f"<body><div>café {_esc(t or '')}</div></body></html>")
            doc = parse_bytes(page.encode("utf-8"))
            encs.append(doc.parsed_encoding or "")
            body = doc.body_element
            contents.append(body.text_content if body is not None else "")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(encs, pa.string()),
             pa.array(contents, pa.string())],
            names=["doc_id", "enc_label", "content"])


class SerializeFragment:
    """S3+K1: fragment parse with a div context, then fragment serialization."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            nodes = parse_fragment(f'<p class="c">{_esc(t or "")}</p>', "div")
            out.append("".join(serialize(n) for n in nodes))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(out, pa.string())],
            names=["doc_id", "serialized"])


class MediaSpansDecode:
    """Media branch: corpus rows -> media spans -> MediaDecode metadata."""

    def __init__(self) -> None:
        from ..stages.media import MediaDecode
        self.decoder = MediaDecode(keep_cols=("doc_id",))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        out_ids, out_refs = [], []
        for doc_id, lst in zip(ids, spans):
            for s in lst or []:
                if s["kind"] == "media":
                    out_ids.append(doc_id)
                    out_refs.append(s["media_ref"])
        media = pa.Table.from_arrays(
            [pa.array(out_ids, pa.string()), pa.array(out_refs, pa.string())],
            names=["doc_id", "media_ref"])
        decoded = self.decoder(media)
        metas = decoded.column("meta").to_pylist()
        return pa.Table.from_arrays(
            [decoded.column("doc_id"), decoded.column("media_ref"),
             pa.array([m["media_type"] for m in metas], pa.string()),
             pa.array([m["format"] for m in metas], pa.string()),
             pa.array([m["sha256"] for m in metas], pa.string())],
            names=["doc_id", "media_ref", "media_type", "format", "sha256"])
