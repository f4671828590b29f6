"""Tree-construction conformance-style tests.

Hand-derived html5lib-.dat-style cases (the public corpus submodule is not
vendorable in this sandbox — SURVEY.md §5): input HTML vs expected tree dump
in the "| " format, covering the algorithm families the reference's suite
stresses: misnesting + adoption agency, foster parenting, implied end tags,
quirks, foreign content, RCDATA/RAWTEXT handoff, fragments.
"""

import pytest

from htmlreader_ray.kernel import parse, parse_fragment
from htmlreader_ray.kernel.dom import Document, Element
from htmlreader_ray.kernel.serialize import dump_test_format


def dump(html):
    return dump_test_format(parse(html))


def check(html, expected):
    got = dump(html)
    assert got == expected.strip("\n"), f"\n--- got ---\n{got}\n--- want ---\n{expected}"


def test_empty_document():
    check("", """
| <html>
|   <head>
|   <body>
""")


def test_basic_structure():
    check("<!DOCTYPE html><html><head></head><body>x</body></html>", """
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     "x"
""")


def test_implied_paragraph_close():
    check("<p>One<p>Two", """
| <html>
|   <head>
|   <body>
|     <p>
|       "One"
|     <p>
|       "Two"
""")


def test_adoption_agency_simple():
    check("<b>1<i>2</b>3</i>", """
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <i>
|         "2"
|     <i>
|       "3"
""")


def test_adoption_agency_with_block():
    # the html5lib classic: <a><div> triggers AAA with furthest block
    check("<a>1<div>2<div>3</a>4", """
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <div>
|       <a>
|         "2"
|       <div>
|         <a>
|           "3"
|         "4"
""")


def test_misnested_b_p():
    check("<b>1<p>2</b>3</p>", """
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|     <p>
|       <b>
|         "2"
|       "3"
""")


def test_foster_parenting_text():
    check("<table><tr>A<td>B</td></tr></table>", """
| <html>
|   <head>
|   <body>
|     "A"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "B"
""")


def test_foster_parenting_element():
    check("<table><div>x</div><tr><td>y</table>", """
| <html>
|   <head>
|   <body>
|     <div>
|       "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"
""")


def test_table_sections_implied():
    check("<table><td>1<td>2<tr><td>3</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "1"
|           <td>
|             "2"
|         <tr>
|           <td>
|             "3"
""")


def test_list_implied_end():
    check("<ul><li>a<li>b<ol><li>c</ol></ul>", """
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|       <li>
|         "b"
|         <ol>
|           <li>
|             "c"
""")


def test_dd_dt_implied():
    check("<dl><dt>t1<dd>d1<dt>t2</dl>", """
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         "t1"
|       <dd>
|         "d1"
|       <dt>
|         "t2"
""")


def test_headings_close_each_other():
    check("<h1>a<h2>b</h2>", """
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|     <h2>
|       "b"
""")


def test_pre_newline_suppression():
    check("<pre>\nkeep\n</pre>", """
| <html>
|   <head>
|   <body>
|     <pre>
|       "keep
"
""")


def test_rcdata_title():
    check("<title>a<b>c</title><p>x", """
| <html>
|   <head>
|     <title>
|       "a<b>c"
|   <body>
|     <p>
|       "x"
""")


def test_rawtext_style_in_head():
    check("<style>p < {}</style>ok", """
| <html>
|   <head>
|     <style>
|       "p < {}"
|   <body>
|     "ok"
""")


def test_script_in_head():
    check("<script>if (a < b) { x(); }</script>t", """
| <html>
|   <head>
|     <script>
|       "if (a < b) { x(); }"
|   <body>
|     "t"
""")


def test_svg_foreign_content():
    check("<svg><g><rect/></g></svg>", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|         <svg rect>
""")


def test_svg_case_adjustment():
    check("<svg><foreignobject><p>h</p></foreignobject></svg>", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foreignObject>
|         <p>
|           "h"
""")


def test_svg_attr_case_adjustment():
    check('<svg viewbox="0 0 1 1"></svg>', """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       viewBox="0 0 1 1"
""")


def test_math_annotation_xml_html_ip():
    check("<math><annotation-xml encoding=text/html><div>d</div></annotation-xml></math>", """
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="text/html"
|         <div>
|           "d"
""")


def test_foreign_breakout():
    check("<svg><circle></circle><p>broke</p></svg>after", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg circle>
|     <p>
|       "broke"
|     "after"
""")


def test_mathml_definitionurl():
    check('<math definitionurl="x"></math>', """
| <html>
|   <head>
|   <body>
|     <math math>
|       definitionURL="x"
""")


def test_select_options():
    check("<select><option>a<option>b<optgroup><option>c</select>d", """
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <option>
|         "b"
|       <optgroup>
|         <option>
|           "c"
|     "d"
""")


def test_frameset():
    check("<frameset><frame></frameset>", """
| <html>
|   <head>
|   <frameset>
|     <frame>
""")


def test_comment_positions():
    check("<!--a--><html><!--b--><head></head><!--c--><body>x<!--d--></body></html><!--e-->", """
| <!-- a -->
| <html>
|   <!-- b -->
|   <head>
|   <!-- c -->
|   <body>
|     "x"
|     <!-- d -->
| <!-- e -->
""")


def test_doctype_with_ids():
    check('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://x"><p>a', """
| <!DOCTYPE html "-//W3C//DTD XHTML 1.0 Strict//EN" "http://x">
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
""")


def test_body_attrs_merge():
    check("<body a=1><body b=2 a=3>", """
| <html>
|   <head>
|   <body>
|     a="1"
|     b="2"
""")


def test_nobr():
    check("<nobr>1<nobr>2", """
| <html>
|   <head>
|   <body>
|     <nobr>
|       "1"
|     <nobr>
|       "2"
""")


def test_isindex_like_unknown_tag():
    check("<foo><bar>x</bar></foo>", """
| <html>
|   <head>
|   <body>
|     <foo>
|       <bar>
|         "x"
""")


def test_button_in_button():
    check("<button>a<button>b", """
| <html>
|   <head>
|   <body>
|     <button>
|       "a"
|     <button>
|       "b"
""")


def test_caption_and_colgroup():
    check("<table><caption>t</caption><colgroup><col><col></colgroup><tr><td>c</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "t"
|       <colgroup>
|         <col>
|         <col>
|       <tbody>
|         <tr>
|           <td>
|             "c"
""")


def test_plaintext():
    check("<plaintext></plaintext>never closes", """
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "</plaintext>never closes"
""")


def test_textarea_ignores_first_newline():
    check("<textarea>\nkeep</textarea>", """
| <html>
|   <head>
|   <body>
|     <textarea>
|       "keep"
""")


def test_regression_issue95_misnested_a_font():
    # mirrored from the reference's regression suite
    # (/root/reference/HTMLReaderTests/HTMLRegressionTests.m:14-30):
    # "the test is to not crash"
    doc = parse("<a><font size=1><a><b></font>x")
    assert doc.body_element is not None


def test_quirks_modes():
    assert parse("<p>x").quirks_mode == "quirks"
    assert parse("<!DOCTYPE html><p>x").quirks_mode == "no-quirks"
    assert parse('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">').quirks_mode == "quirks"
    assert parse('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" "sys">').quirks_mode == "limited-quirks"
    assert parse('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN">').quirks_mode == "limited-quirks"
    assert parse('<!DOCTYPE foo>').quirks_mode == "quirks"


# ----------------------------------------------------------- fragments

def frag_dump(html, ctx):
    nodes = parse_fragment(html, ctx)
    root = Element("#root")
    for n in nodes:
        root.append_child(n)
    return dump_test_format(root)


def test_fragment_tr_context():
    got = frag_dump("<td>a<td>b", "tr")
    assert got == '| <td>\n|   "a"\n| <td>\n|   "b"'


def test_fragment_div_context():
    got = frag_dump("<p>x<p>y", "div")
    assert got == '| <p>\n|   "x"\n| <p>\n|   "y"'


def test_fragment_title_context_is_rcdata():
    got = frag_dump("<b>not-a-tag</b>", "title")
    assert got == '| "<b>not-a-tag</b>"'


def test_fragment_script_context():
    got = frag_dump("if (a<b) {}", "script")
    assert got == '| "if (a<b) {}"'


def test_fragment_table_context():
    got = frag_dump("<tr><td>x", "tbody")
    assert got == '| <tr>\n|   <td>\n|     "x"'
