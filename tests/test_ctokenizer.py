"""Differential tests: the C data-state accelerator must produce the exact
token stream of the pure-Python machine on arbitrary input."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from htmlreader_ray.kernel import tokenizer as tkz


def _tokens(src, force_python):
    saved = tkz._CSCAN
    if force_python:
        tkz._CSCAN = None
    try:
        t = tkz.Tokenizer(src)
        out = []
        for tok in t.tokens():
            if tok[0] == "eof":
                break
            if tok[0] == "chars" and out and out[-1][0] == "chars":
                out[-1] = ("chars", out[-1][1] + tok[1])
            else:
                out.append(tok)
        return out
    finally:
        tkz._CSCAN = saved


HAVE_C = tkz._CSCAN is not None

pytestmark = pytest.mark.skipif(not HAVE_C,
                                reason="C accelerator not built")

_SOUP = st.text(
    alphabet=string.ascii_letters + string.digits +
    "<>&;/='\"!-[] \t\n`?#.:\x00é“",
    max_size=160)


@settings(max_examples=400, deadline=None)
@given(_SOUP)
def test_differential_token_stream(src):
    assert _tokens(src, True) == _tokens(src, False)


@pytest.mark.parametrize("src", [
    "", "plain", "<div>", "<div a=1 b='2' c=\"3\" d>", "<br/>", "</div >",
    "a&amp;b<b>c&#65;</b>", "<div a=&amp;>", "<DIV A=B>x</DIV>",
    "<div a=\"1\"b=\"2\">", "<div a='un closed", "<div a=>", "<div/>tail",
    "<!doctype html><p>x", "<!--c--><p>", "<title>t</title>",
    "<div  a = b >", "<x-y z-w=ok>", "<div a=b a=c>", "é<p>é</p>",
    "<div\0>", "nul\0text", "<p>&notit;&notin;&#x41;</p>",
])
def test_differential_vectors(src):
    assert _tokens(src, True) == _tokens(src, False)


def test_full_document_parse_identical():
    from htmlreader_ray.kernel import parse
    from htmlreader_ray.testing.conformance import dump_html5lib
    from htmlreader_ray.sources.corpus import build_page
    for k in range(10):
        page = build_page(k, "sample text & <specials> here")
        saved = tkz._CSCAN
        try:
            with_c = dump_html5lib(parse(page))
            tkz._CSCAN = None
            without_c = dump_html5lib(parse(page))
        finally:
            tkz._CSCAN = saved
        assert with_c == without_c


_DOC_SOUP = st.text(
    alphabet=string.ascii_letters + "<>&;/='\"!- \n[]`#.\x00é",
    max_size=300)


@settings(max_examples=200, deadline=None)
@given(_DOC_SOUP)
def test_differential_full_parse_dump(src):
    """Whole-document parses must be identical with and without the C
    scanner (tree-level equivalence, not just tokens)."""
    from htmlreader_ray.kernel import parse
    from htmlreader_ray.testing.conformance import dump_html5lib
    saved = tkz._CSCAN
    try:
        with_c = dump_html5lib(parse(src))
        tkz._CSCAN = None
        without_c = dump_html5lib(parse(src))
    finally:
        tkz._CSCAN = saved
    assert with_c == without_c


def test_differential_all_sf0001_pages():
    """Standing guard: every sf0.001 corpus page parses identically with
    and without the C scanner."""
    import pyarrow.parquet as pq
    from htmlreader_ray.kernel import parse
    from htmlreader_ray.testing.conformance import dump_html5lib
    from htmlreader_ray.sources.corpus import build_page
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pylist()
    saved = tkz._CSCAN
    drift = []
    try:
        for r in docs:
            page = build_page(r["doc_id"], r["text"])
            tkz._CSCAN = saved
            a = dump_html5lib(parse(page))
            tkz._CSCAN = None
            b = dump_html5lib(parse(page))
            if a != b:
                drift.append(r["doc_id"])
    finally:
        tkz._CSCAN = saved
    assert not drift, drift[:5]
