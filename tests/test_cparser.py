"""Differential tests for the fused C parser (_cparser.c): on every input it
accepts it must build the EXACT tree of the pure-Python kernel
(tokenizer.py + treebuilder.py); on everything else it must bail (None) so
the Python kernel runs. Tree equality is compared via the html5lib dump —
the same canonical form the conformance corpus pins."""

import glob
import os
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from htmlreader_ray.kernel import parser as P
from htmlreader_ray.kernel.tokenizer import Tokenizer
from htmlreader_ray.kernel.treebuilder import TreeBuilder
from htmlreader_ray.testing.conformance import dump_html5lib, parse_dat

HAVE_C = P._CPARSE is not None
pytestmark = pytest.mark.skipif(not HAVE_C, reason="C parser not built")

_HERE = os.path.dirname(os.path.abspath(__file__))


def _py_parse(html: str, scripting: bool = True):
    """The pure-Python kernel, bypassing the C hook in parser.parse."""
    return TreeBuilder(scripting=scripting).run(Tokenizer(html))


def _check(src: str, scripting: bool = True) -> bool:
    """True if C parsed (and matched); False if it bailed."""
    doc = P._CPARSE.parse(src, scripting=scripting)
    if doc is None:
        return False
    assert dump_html5lib(doc) == dump_html5lib(_py_parse(src, scripting))
    return True


# ---------------------------------------------------------------- corpora

def _conformance_docs():
    cases = []
    for path in sorted(glob.glob(os.path.join(_HERE, "conformance", "*.dat"))):
        with open(path, encoding="utf-8") as f:
            for case in parse_dat(f.read()):
                if not case.fragment_context:
                    cases.append(case.data)
    return cases


def test_conformance_corpus_differential():
    """Every document-mode conformance input, both scripting flags. The C
    parser may bail (template &c.) but must never mismatch."""
    docs = _conformance_docs()
    assert len(docs) > 300
    parsed = 0
    for src in docs:
        for scripting in (True, False):
            parsed += _check(src, scripting)
    # the accelerator must actually cover the overwhelming majority
    assert parsed >= 1.9 * len(docs) * 0.95


def test_corpus_pages_differential():
    from htmlreader_ray.sources.corpus import build_page
    for k in range(120):
        page = "<!DOCTYPE html>" + build_page(k, "spark row table scan key")
        assert _check(page), "C parser must handle every generated page"


# ---------------------------------------------------------------- fuzz

_MARKUPISH = st.text(
    alphabet=string.ascii_letters + "<>&;/='\"!-[]# \t\n" + "\x00�\xe9",
    max_size=200)

_TAGS = ["div", "p", "b", "i", "a", "table", "tr", "td", "li", "ul",
         "select", "option", "svg", "math", "title", "style", "script",
         "textarea", "pre", "form", "button", "h1", "caption", "frameset",
         "template", "noscript", "nobr", "ruby", "rt", "foreignObject"]


@st.composite
def tag_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 20))):
        kind = draw(st.integers(0, 5))
        tag = draw(st.sampled_from(_TAGS))
        if kind == 0:
            parts.append(f"<{tag}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=12)))
        elif kind == 3:
            parts.append(f"<{tag} a='{draw(st.text(max_size=6))}'>")
        elif kind == 4:
            parts.append("<!--" + draw(st.text(max_size=8)) + "-->")
        else:
            parts.append("&" + draw(st.text(string.ascii_letters,
                                            max_size=6)) + ";")
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(_MARKUPISH)
def test_fuzz_markupish(src):
    _check(src, True)
    _check(src, False)


@settings(max_examples=300, deadline=None)
@given(tag_soup())
def test_fuzz_tag_soup(src):
    _check(src, True)
    _check(src, False)


# ------------------------------------------------------------- extraction

from htmlreader_ray.kernel.extract import ExtractConfig, Extractor

_XCONFIGS = [
    ExtractConfig(),
    ExtractConfig(min_text_density=2.0),
    ExtractConfig(max_link_density=0.2, min_block_chars=50,
                  min_text_density=1.0),
    ExtractConfig(collapse_whitespace=False),
    ExtractConfig(remove_selectors=("p", ".x", "#y", "[data-z]", "[k=v]")),
    ExtractConfig(remove_selectors=()),
]


def _py_extract(cfg, html: str) -> str:
    ex = Extractor(cfg)
    ex._cargs = None  # force the pure-Python strip + text path
    doc = _py_parse(html)
    ex.strip_boilerplate(doc)
    return ex.text_of(doc)


def _xcheck(cfg, ex, src: str) -> bool:
    out = P._CPARSE.extract(src, *ex._cargs)
    if out is None:
        return False
    assert out == _py_extract(cfg, src)
    return True


def test_extract_vectors_differential():
    vectors = [
        "", "plain text", "<body class=footer>doomed body",
        "<div><a href=x>link link link</a> t</div>",
        "<div><a>out <a>in</a> er</a>pad</div><p>keep</p>",
        "<ul><li><a>1</a><li><a>2</a><li>three</ul>",
        "<ul>;z<a><article id=y><a href=#>xxxxxxxxxxxx</a></nav></p>"
        "<noscript><a href=#>ll lll</a><li><table class='footer'><a hr",
        "<div class='x'>gone</div><div class=' x '>gone2</div>",
        "<p id=y>gone</p><p id=z>kept</p>",
        "<div data-z>gone</div><div k=v>gone</div><div k=w>kept</div>",
        "<svg><td>namespace-blind block</td><a href=#>svg link</a></svg>",
        "<table><tr><td><a>c</a><td>text here</table>",
        "<a href=x><div>block in a <a>n</a></div></a>",
        "<div>" + "<a>xx</a>" * 30 + "tiny</div>",
        "<div>\xe9中文 multibyte <a>\xe9\xe9</a></div>",
        "<p>a  b\t\ncd    e</p>",
        "<div hidden>gone</div><div aria-hidden=true>gone</div>"
        "<div aria-hidden=false>kept</div>",
        "<frameset><frame></frameset>",
    ]
    for cfg in _XCONFIGS:
        ex = Extractor(cfg)
        assert ex._cargs is not None
        for v in vectors:
            _xcheck(cfg, ex, v)


def test_extract_corpus_differential():
    from htmlreader_ray.sources.corpus import build_page
    cfg = ExtractConfig()
    ex = Extractor(cfg)
    for k in range(60):
        page = "<!DOCTYPE html>" + build_page(k, "spark row table scan key")
        assert _xcheck(cfg, ex, page)


@settings(max_examples=200, deadline=None)
@given(tag_soup())
def test_extract_fuzz(src):
    cfg = _XCONFIGS[0]
    _xcheck(cfg, Extractor(cfg), src)


def test_extract_many_matches_per_doc():
    """The batched C entry (extract_many: one packed buffer, StringArray
    over it) must be elementwise identical to per-doc extract_html, for
    every config, including None items and corpus pages."""
    from htmlreader_ray.sources.corpus import build_page
    vectors = [
        "", "plain text", "<body class=footer>doomed body",
        "<div><a href=x>link link link</a> t</div>",
        "<p>a  b\t\ncd    e</p>",
        "<div>\xe9中文 multibyte <a>\xe9\xe9</a></div>",
        None,  # null span text: extract_html(t or "") semantics
        "<table><tr><td><a>c</a><td>text here</table>",
    ] + ["<!DOCTYPE html>" + build_page(k, "spark row table scan key")
         for k in range(12)]
    for cfg in _XCONFIGS:
        ex = Extractor(cfg)
        assert ex._cargs is not None
        got = ex.extract_html_many(vectors)
        assert got is not None
        want = [ex.extract_html(v or "") for v in vectors]
        assert got.to_pylist() == want


@settings(max_examples=150, deadline=None)
@given(st.lists(tag_soup(), min_size=0, max_size=6))
def test_extract_many_fuzz(srcs):
    cfg = _XCONFIGS[0]
    ex = Extractor(cfg)
    got = ex.extract_html_many(srcs)
    assert got is not None
    assert got.to_pylist() == [ex.extract_html(s or "") for s in srcs]


def test_extract_arrow_matches_per_doc():
    """The Arrow-buffer C entry (extract_arrow: input read straight from a
    StringArray's offsets/data buffers, no input-side PyUnicode) must be
    elementwise identical to per-doc extract_html for every config — and
    for SLICED arrays (nonzero arr.offset), chunked input, nulls, and
    empty arrays, since map_batches hands us takes/slices routinely."""
    import pyarrow as pa

    from htmlreader_ray.sources.corpus import build_page
    vectors = [
        "", "plain text", "<body class=footer>doomed body",
        "<div><a href=x>link link link</a> t</div>",
        "<p>a  b\t\ncd    e</p>",
        "<div>\xe9中文 multibyte <a>\xe9\xe9</a></div>",
        None,  # null slot: extract_html(t or "") semantics
        "<table><tr><td><a>c</a><td>text here</table>",
    ] + ["<!DOCTYPE html>" + build_page(k, "spark row table scan key")
         for k in range(12)]
    arr = pa.array(vectors, pa.string())
    for cfg in _XCONFIGS:
        ex = Extractor(cfg)
        assert ex._cargs is not None
        want = [ex.extract_html(v or "") for v in vectors]
        got = ex.extract_html_many_arrow(arr)
        assert got is not None and got.to_pylist() == want
        got_slice = ex.extract_html_many_arrow(arr.slice(3, 9))
        assert got_slice.to_pylist() == want[3:12]
        chunked = pa.chunked_array([arr.slice(0, 5), arr.slice(5)])
        assert ex.extract_html_many_arrow(chunked).to_pylist() == want
        empty = ex.extract_html_many_arrow(pa.array([], pa.string()))
        assert empty.to_pylist() == []
    # non-string input declines (caller falls back to the list path)
    assert Extractor(_XCONFIGS[0]).extract_html_many_arrow(
        pa.array([1, 2])) is None


@settings(max_examples=100, deadline=None)
@given(st.lists(tag_soup(), min_size=0, max_size=6), st.integers(0, 3))
def test_extract_arrow_fuzz(srcs, skip):
    import pyarrow as pa
    cfg = _XCONFIGS[0]
    ex = Extractor(cfg)
    arr = pa.array(srcs, pa.string()).slice(min(skip, len(srcs)))
    got = ex.extract_html_many_arrow(arr)
    assert got is not None
    assert got.to_pylist() == [ex.extract_html(s or "")
                               for s in srcs[min(skip, len(srcs)):]]


def test_extract_complex_selector_uses_python():
    ex = Extractor(ExtractConfig(remove_selectors=("div > p.x",)))
    assert ex._cargs is None
    assert ex.extract_html("<div><p class=x>gone</p>kept</div>") == "kept"


# ---------------------------------------------------------------- contract

def test_template_differential():
    """Template is fully ported (insertion-mode stack, foster preference,
    form-pointer guards); every vector must parse in C and match Python."""
    vectors = [
        "<template>x</template>",
        "<template><p>a<p>b</template>tail",
        "<table><template><tr><td>c</td></tr></template></table>",
        "<template><td>cell</template>", "<template><col>",
        "<template><tr><td>x", "<template><caption>cap</template>",
        "<table><tr><template><td>t</template><td>u",
        "<template><template><p>nested</template>outer</template>",
        "<form><template><form><input name=a></form></template>",
        "<template><form x=1>f</template><form y=2>",
        "<html t=1><template><html u=2>", "<template><body b=1>",
        "<template><frameset>", "<template></div>stray", "<template>",
        "<template><script>raw</script></template>",
        "<select><template><option>o</template></select>",
        "<table><template>text</template></table>",
        "<table><colgroup><template><col></template>",
        "<svg><template><circle>", "<template><svg><td>",
        "<table><tr><td><template><td>q", "</template>stray-end",
        "<head></head><template>after-head</template>",
        "<body></body><template>after-body",
        "<template><tbody><tr><td>1<td>2</template>",
        "<template><p>eof-in-template", "<template><table><tr>eof",
        "<caption><template></caption>x</template>y",
    ]
    for src in vectors:
        for scripting in (True, False):
            assert _check(src, scripting), f"C parser bailed on {src!r}"


def test_collect_errors_uses_python_kernel():
    doc = P.parse("<p><b>x", collect_errors=True)
    assert hasattr(doc, "parse_errors")


def test_parse_entry_equivalence():
    """parser.parse() (C-accelerated) equals the forced-Python kernel."""
    srcs = ["<!DOCTYPE html><p>a<b>c", "<table>x<td>y", "<svg><path/></svg>",
            "<select><option>a<optgroup>", "<template><p>t</template>tail"]
    for src in srcs:
        assert dump_html5lib(P.parse(src)) == dump_html5lib(_py_parse(src))


def test_parse_bytes_certain_fast_path():
    from htmlreader_ray.kernel.parser import parse_bytes
    data = "﻿<!DOCTYPE html><p>\xe9".encode("utf-8")
    doc = parse_bytes(data)
    assert doc.parsed_encoding == "UTF-8"
    assert "\xe9" in dump_html5lib(doc)
    # tentative path (meta restart possible) still works
    doc2 = parse_bytes(b"<meta charset=windows-1252><p>caf\xe9")
    assert doc2.parsed_encoding == "windows-1252"


def test_vectors():
    vectors = [
        "", "x", "<!DOCTYPE html>", "<!doctype html PUBLIC '-//W3C//DTD "
        "HTML 4.01 Transitional//EN'>", "<b><i>x</b>y</i>",
        "<a>1<a>2<a>3<a>4", "<p><table><td>c</table>",
        "<table><tbody><tr><td>a<td>b", "<ul><li>a<li>b<ol><li>c",
        "<svg><desc><b>bold</b></desc></svg>",
        "<math><mi>x</mi><annotation-xml encoding='text/html'><p>h",
        "<frameset><frame></frameset><noframes>x",
        "<head><style>s { }</style></head><body>b",
        "<textarea>\n&amp;</textarea>", "<pre>\nkeep</pre>",
        "<script><!--<script>nested--></script>",
        "<plaintext><p>raw", "<xmp><b>raw</xmp>",
        "a<![CDATA[x]]>b", "<svg><![CDATA[<b>raw]]></svg>",
        "<div \0bad=1>", "<p>&notit;&notin;&#x41;&#X80;&#xD800;",
        "<body onload='a&gt;b'>", "<nobr>1<nobr>2<nobr>3",
        "<button><button>n", "<form><form><input>",
        "<isindex>", "<image src=x>", "<menuitem><p>",
        "<option>a<option>b<select><option>c",
        "<h1>a<h2>b</h1>c", "<dd>a<dt>b<dl><dd>c",
        "<caption><table><tr><td>x",
        "<colgroup><col><tr>", "x</br>y</p>z",
        "<noscript><p>inside</noscript>",
        "<body></body><!--after--><p>late",
        "￾\x0c\x0b", "<p title='\r\n\t'>",
    ]
    for src in vectors:
        for scripting in (True, False):
            _check(src, scripting)
