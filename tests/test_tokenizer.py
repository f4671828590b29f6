"""Tokenizer conformance-style tests.

Vectors hand-derived from the WHATWG tokenization spec in the html5lib
.test style the reference consumes
(/root/reference/HTMLReaderTests/HTMLTokenizerTests.m:138-185): token lists
with initial states and lastStartTag, adjacent character tokens concatenated
before comparison.
"""

import pytest

from htmlreader_ray.kernel.tokenizer import (DATA, PLAINTEXT, RAWTEXT, RCDATA,
                                             SCRIPT_DATA, Tokenizer)


def toks(s, state=DATA, last=None):
    t = Tokenizer(s, initial_state=state, last_start_tag=last)
    out = []
    for tok in t.tokens():
        if tok[0] == "eof":
            break
        # concatenate adjacent character tokens (harness rule)
        if tok[0] == "chars" and out and out[-1][0] == "chars":
            out[-1] = ("chars", out[-1][1] + tok[1])
        else:
            out.append(list(tok) if False else tok)
    return out


CASES = [
    # basic data / tags / attributes
    ("plain text", [("chars", "plain text")]),
    ("<div>", [("start", "div", {}, False)]),
    ("<div/>", [("start", "div", {}, True)]),
    ("<div a=b c='d' e=\"f\" g>", [("start", "div",
        {"a": "b", "c": "d", "e": "f", "g": ""}, False)]),
    ("<DIV A=B>", [("start", "div", {"a": "B"}, False)]),
    ("</div>", [("end", "div")]),
    ("<div a=b a=c>", [("start", "div", {"a": "b"}, False)]),  # dup dropped
    ("<div =x>", [("start", "div", {"=x": ""}, False)]),
    ("<div a =b>", [("start", "div", {"a": "b"}, False)]),
    ("<div a= b>", [("start", "div", {"a": "b"}, False)]),
    ("<div a\nb>", [("start", "div", {"a": "", "b": ""}, False)]),
    ("<div a='b&amp;c'>", [("start", "div", {"a": "b&c"}, False)]),
    ("<div a=b&ampc>", [("start", "div", {"a": "b&ampc"}, False)]),  # attr no-;
    # attr context: named ref without ';' followed by alnum is NOT decoded
    ("<div a='&ampx'>", [("start", "div", {"a": "&ampx"}, False)]),
    # char refs in data
    ("&amp;", [("chars", "&")]),
    ("&amp", [("chars", "&")]),
    ("&ampx", [("chars", "&x")]),
    ("&notin;", [("chars", "∉")]),
    ("&notit;", [("chars", "¬it;")]),
    ("&#65;&#x42;&#X43;", [("chars", "ABC")]),
    ("&#0;", [("chars", "�")]),
    ("&#x80;", [("chars", "€")]),
    ("&#xD800;", [("chars", "�")]),
    ("&#x110000;", [("chars", "�")]),
    ("&#; &x; &", [("chars", "&#; &x; &")]),
    # comments
    ("<!-- comment -->", [("comment", " comment ")]),
    ("<!---->", [("comment", "")]),
    ("<!----->", [("comment", "-")]),
    ("<!------>", [("comment", "--")]),
    ("<!--a-->", [("comment", "a")]),
    ("<!--a--!>", [("comment", "a")]),
    ("<!--a--b-->", [("comment", "a--b")]),
    ("<!-->", [("comment", "")]),
    ("<!--->", [("comment", "")]),
    ("<!-- a\0b -->", [("comment", " a�b ")]),
    ("<! not a comment>", [("comment", " not a comment")]),
    ("<?php ?>", [("comment", "?php ?")]),
    ("</>", []),
    ("<", [("chars", "<")]),
    ("</", [("chars", "</")]),
    ("<3", [("chars", "<3")]),
    # doctypes
    ("<!DOCTYPE html>", [("doctype", "html", None, None, False)]),
    ("<!doctype HTML>", [("doctype", "html", None, None, False)]),
    ("<!DOCTYPE>", [("doctype", None, None, None, True)]),
    ("<!DOCTYPE html PUBLIC '-//W3C//DTD HTML 4.01//EN'>",
     [("doctype", "html", "-//W3C//DTD HTML 4.01//EN", None, False)]),
    ('<!DOCTYPE html PUBLIC "-//a//b" "sys">',
     [("doctype", "html", "-//a//b", "sys", False)]),
    ("<!DOCTYPE html SYSTEM 'abc'>",
     [("doctype", "html", None, "abc", False)]),
    ("<!DOCTYPE html BOGUS junk>",
     [("doctype", "html", None, None, True)]),
    # tag edge cases
    ("<div\0>", [("start", "div�", {}, False)]),
    ("<div a='b' >x", [("start", "div", {"a": "b"}, False), ("chars", "x")]),
    ("<div/ >", [("start", "div", {}, False)]),
    ("<div a=/>", [("start", "div", {"a": "/"}, False)]),
    ("a<b>c", [("chars", "a"), ("start", "b", {}, False), ("chars", "c")]),
]


@pytest.mark.parametrize("src,expected", CASES, ids=[c[0][:30] for c in CASES])
def test_tokenize(src, expected):
    assert toks(src) == expected


RAWTEXT_CASES = [
    # RCDATA: char refs active, only appropriate end tag closes
    ("a&amp;b</title>x", RCDATA, "title",
     [("chars", "a&b"), ("end", "title"), ("chars", "x")]),
    ("a</titl></title>", RCDATA, "title",
     [("chars", "a</titl>"), ("end", "title")]),
    ("</TITLE >", RCDATA, "title", [("end", "title")]),
    # RAWTEXT: no char refs
    ("a&amp;b</style>", RAWTEXT, "style",
     [("chars", "a&amp;b"), ("end", "style")]),
    ("x</style y=1>", RAWTEXT, "style", [("chars", "x"), ("end", "style")]),
    # PLAINTEXT: never closes
    ("a</plaintext>b", PLAINTEXT, "plaintext",
     [("chars", "a</plaintext>b")]),
]


@pytest.mark.parametrize("src,state,last,expected", RAWTEXT_CASES)
def test_rawtext_modes(src, state, last, expected):
    assert toks(src, state=state, last=last) == expected


SCRIPT_CASES = [
    ("var x = 1;</script>", [("chars", "var x = 1;"), ("end", "script")]),
    ("<!-- </script>", [("chars", "<!-- "), ("end", "script")]),
    ("<!-- x --></script>", [("chars", "<!-- x -->"), ("end", "script")]),
    # double-escaped: "</script>" inside <!--<script> ... --> stays text
    ("<!--<script>alert('</script>')-->x",
     [("chars", "<!--<script>alert('</script>')-->x")]),
    ("<!--<script></script>--></script>",
     [("chars", "<!--<script></script>-->"), ("end", "script")]),
    ("a < b</script>", [("chars", "a < b"), ("end", "script")]),
]


@pytest.mark.parametrize("src,expected", SCRIPT_CASES,
                         ids=[c[0][:30] for c in SCRIPT_CASES])
def test_script_data(src, expected):
    assert toks(src, state=SCRIPT_DATA, last="script") == expected


def test_cdata_only_in_foreign():
    t = Tokenizer("<![CDATA[x<y]]>")
    t.adjusted_current_node_is_foreign = True
    out = [tok for tok in t.tokens() if tok[0] != "eof"]
    assert out == [("chars", "x<y")]
    # in HTML content it's a bogus comment
    assert toks("<![CDATA[x<y]]>") == [("comment", "[CDATA[x<y]]")]


def test_eof_in_cdata_reports():
    # spec: EOF inside a CDATA section is an eof-in-cdata parse error; the
    # collected chars are still emitted (conformance .test files cannot set
    # the foreign-content flag, so this code is pinned here)
    t = Tokenizer("<![CDATA[abc")
    t.adjusted_current_node_is_foreign = True
    out = [tok for tok in t.tokens() if tok[0] != "eof"]
    assert out == [("chars", "abc")]
    assert t.errors == ["eof-in-cdata"]


def test_input_stream_errors_reported_once_per_occurrence():
    t = Tokenizer("a\x01b\x01\x85")
    list(t.tokens())
    assert t.errors.count("control-character-in-input-stream") == 3
    t = Tokenizer("x﷐￾\U0001fffey")
    list(t.tokens())
    assert t.errors.count("noncharacter-in-input-stream") == 3
    t = Tokenizer("ok \t\n text")
    list(t.tokens())
    assert t.errors == []


def test_parse_collect_errors_surface():
    # public API: parse(collect_errors=True) exposes the combined
    # tokenizer + tree-builder error list on the Document
    from htmlreader_ray.kernel import parse
    d = parse("<!--a<!--b--><a x'y=1>ok</a>", collect_errors=True)
    assert "nested-comment" in d.parse_errors
    assert "unexpected-character-in-attribute-name" in d.parse_errors
    assert parse("<!DOCTYPE html><p>hi").parse_errors == []


def test_crlf_normalization():
    assert toks("a\r\nb\rc") == [("chars", "a\nb\nc")]


def test_eof_in_tag_drops_tag():
    assert toks("<div a=") == []
    assert toks("<div ") == []
    assert toks("<div a='b") == []


def test_eof_in_comment_emits_comment():
    # the comment-end-dash / comment-end states consume up to two trailing
    # dashes without appending them (spec: EOF there emits the comment
    # as-is); only a third-plus dash reaches the data via comment-end's
    # '-' branch
    assert toks("<!--abc") == [("comment", "abc")]
    assert toks("<!--abc-") == [("comment", "abc")]
    assert toks("<!--abc--") == [("comment", "abc")]
    assert toks("<!--abc---") == [("comment", "abc-")]


# second vector batch: doctype families, attribute weirdness, fast-path vs
# state-machine agreement
MORE_CASES = [
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01//EN\" 'http://sys'>",
     [("doctype", "html", "-//W3C//DTD HTML 4.01//EN", "http://sys", False)]),
    ("<!DOCTYPE html PUBLIC>", [("doctype", "html", None, None, True)]),
    ("<!DOCTYPE html PUBLIC >", [("doctype", "html", None, None, True)]),
    ("<!DOCTYPE html SYSTEM>", [("doctype", "html", None, None, True)]),
    ("<!DOCTYPE html PUBLIC 'a' junk>",
     [("doctype", "html", "a", None, True)]),
    ("<!doctypehtml>", [("doctype", "html", None, None, False)]),
    ("<!DOCTYPE potato SYSTEM 'x'>",
     [("doctype", "potato", None, "x", False)]),
    # attribute weirdness
    ("<div a=\"1\"b=\"2\">", [("start", "div", {"a": "1", "b": "2"}, False)]),
    ("<div a='1'b='2'>", [("start", "div", {"a": "1", "b": "2"}, False)]),
    ("<div a/b=c>", [("start", "div", {"a": "", "b": "c"}, False)]),
    ("<div =>", [("start", "div", {"=": ""}, False)]),
    ("<div foo=`bar`>", [("start", "div", {"foo": "`bar`"}, False)]),
    ("<div a==b>", [("start", "div", {"a": "=b"}, False)]),
    ("<div 'a'='b'>", [("start", "div", {"'a'": "b"}, False)]),
    ("<div a\t=\t'b'>", [("start", "div", {"a": "b"}, False)]),
    ("<div/x>", [("start", "div", {"x": ""}, False)]),
    ("<div x</div>", [("start", "div", {"x<": "", "div": ""}, False)]),
    # numeric refs boundaries
    ("&#x10FFFF;", [("chars", "\U0010FFFF")]),
    ("&#1114111;", [("chars", "\U0010FFFF")]),
    ("&#xA;", [("chars", "\n")]),
    ("&#X41;x", [("chars", "Ax")]),
    # upper/lowercase hex prefix without digits
    ("&#x;", [("chars", "&#x;")]),
    ("&#xZ;", [("chars", "&#xZ;")]),
    # tag followed by EOF mid-name drops the tag
    ("<div", []),
    ("</div", []),
]


@pytest.mark.parametrize("src,expected", MORE_CASES,
                         ids=[c[0][:34] for c in MORE_CASES])
def test_tokenize_more(src, expected):
    assert toks(src) == expected


def test_abrupt_doctype_identifiers():
    # '>' inside a quoted public/system id aborts the doctype (spec
    # abrupt-doctype-*-identifier): force-quirks, id ends at '>', and the
    # following text is NOT swallowed
    assert toks("<!DOCTYPE html PUBLIC 'a>x") == [
        ("doctype", "html", "a", None, True), ("chars", "x")]
    assert toks('<!DOCTYPE html SYSTEM "a>x') == [
        ("doctype", "html", None, "a", True), ("chars", "x")]
    assert toks("<!DOCTYPE html PUBLIC 'a' 'b>x") == [
        ("doctype", "html", "a", "b", True), ("chars", "x")]
