"""Second tree-construction batch: adoption-agency variants, foster
parenting x active-formatting-elements interplay, integration points,
nested tables, reconstruction — the html5lib-tests families most likely to
catch subtle deviations."""

import pytest

from htmlreader_ray.kernel import parse
from htmlreader_ray.testing.conformance import dump_html5lib


def check(html, expected, **kw):
    got = dump_html5lib(parse(html, **kw))
    assert got == expected.strip("\n"), \
        f"\n--- input ---\n{html}\n--- got ---\n{got}\n--- want ---\n{expected}"


def test_aaa_with_block_classic():
    # second outer AAA iteration pops the re-inserted <a> clone (no
    # furthest block below it), so "x" lands as its sibling
    check("<a><b><p></a>x", """
| <html>
|   <head>
|   <body>
|     <a>
|       <b>
|     <b>
|       <p>
|         <a>
|         "x"
""")


def test_aaa_b_p():
    check("<b><p></b>TEST", """
| <html>
|   <head>
|   <body>
|     <b>
|     <p>
|       <b>
|       "TEST"
""")


def test_reconstruction_across_paragraphs():
    check("<p><b>1</p><p>2", """
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         "1"
|     <p>
|       <b>
|         "2"
""")


def test_foster_formatting_dance():
    check("<table><b><tr><td>aaa</td></tr>bbb</table>ccc", """
| <html>
|   <head>
|   <body>
|     <b>
|     <b>
|       "bbb"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "aaa"
|     <b>
|       "ccc"
""")


def test_nested_tables():
    check("<table><tr><td><table><tr><td>nested</table>outer</table>after", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <table>
|               <tbody>
|                 <tr>
|                   <td>
|                     "nested"
|             "outer"
|     "after"
""")


def test_caption_with_content():
    check("<table><caption><p>cap</caption><tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         <p>
|           "cap"
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_colgroup_with_attr():
    check("<table><col width=1><tr><td>c</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           width="1"
|       <tbody>
|         <tr>
|           <td>
|             "c"
""")


def test_li_in_div_in_p():
    check("<div><p><li>x</div>", """
| <html>
|   <head>
|   <body>
|     <div>
|       <p>
|       <li>
|         "x"
""")


def test_heading_end_mismatch():
    check("<h1>a<p>b</p></h2>c", """
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|       <p>
|         "b"
|     "c"
""")


def test_textarea_rcdata():
    check("<textarea><p>a</textarea><p>b", """
| <html>
|   <head>
|   <body>
|     <textarea>
|       "<p>a"
|     <p>
|       "b"
""")


def test_text_after_body_close():
    check("<body>x</body>y", """
| <html>
|   <head>
|   <body>
|     "xy"
""")


def test_svg_desc_html_ip():
    check("<svg><desc><div>html</div></desc></svg>after", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         <div>
|           "html"
|     "after"
""")


def test_mathml_mtext_ip():
    check("<math><mtext><p>x</p></mtext></math>", """
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <p>
|           "x"
""")


def test_cdata_in_foreign():
    check("<svg><![CDATA[<b>raw]]></svg>after", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "<b>raw"
|     "after"
""")


def test_entities_in_attr_and_text():
    check('<p title="&lt;x&gt;">&lt;y&gt;</p>', """
| <html>
|   <head>
|   <body>
|     <p>
|       title="<x>"
|       "<y>"
""")


def test_ul_li_div():
    check("<ul><li><div>d</div><li>2</ul>", """
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         <div>
|           "d"
|       <li>
|         "2"
""")


def test_table_in_cell_closes_cell():
    check("<table><tr><td>a<tr><td>b</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "a"
|         <tr>
|           <td>
|             "b"
""")


def test_end_tr_without_tr():
    check("<table></tr><tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_input_hidden_in_table():
    check("<table><input type=hidden><tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <input>
|         type="hidden"
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_input_nonhidden_fostered():
    check("<table><input type=text><tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <input>
|       type="text"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_marquee_scopes_formatting():
    check("<b><marquee>x</marquee>y", """
| <html>
|   <head>
|   <body>
|     <b>
|       <marquee>
|         "x"
|       "y"
""")


def test_applet_clears_afe_to_marker():
    # <b> outside applet must not be reconstructed inside after </applet>
    check("<b>1<applet><i>2</applet>3", """
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <applet>
|         <i>
|           "2"
|       "3"
""")


def test_nobr_aaa():
    # AAA on the implied </nobr> pops <b> too; reconstruction then clones
    # <b> at body level for the second <nobr>
    check("<nobr><b>1<nobr>2", """
| <html>
|   <head>
|   <body>
|     <nobr>
|       <b>
|         "1"
|     <b>
|       <nobr>
|         "2"
""")


def test_eof_in_cell():
    check("<table><tr><td><b>x", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <b>
|               "x"
""")


def test_frameset_after_body_ignored():
    check("<body>t<frameset>", """
| <html>
|   <head>
|   <body>
|     "t"
""")


def test_frameset_after_explicit_body_ignored():
    # an explicit <body> tag sets frameset-ok to "not ok"
    check("<body><frameset><frame>", """
| <html>
|   <head>
|   <body>
""")


def test_frameset_without_body():
    check("<frameset><frame></frameset>", """
| <html>
|   <head>
|   <frameset>
|     <frame>
""")


def test_image_renamed_to_img():
    check("<p><image src=x>", """
| <html>
|   <head>
|   <body>
|     <p>
|       <img>
|         src="x"
""")


def test_br_end_tag_becomes_start():
    check("a</br>b", """
| <html>
|   <head>
|   <body>
|     "a"
|     <br>
|     "b"
""")


def test_option_in_optgroup_closing():
    check("<select><optgroup><option>1<optgroup><option>2</select>", """
| <html>
|   <head>
|   <body>
|     <select>
|       <optgroup>
|         <option>
|           "1"
|       <optgroup>
|         <option>
|           "2"
""")


def test_isolated_cell_end_tags_ignored():
    check("</td></tr></table><p>x", """
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
""")


def test_script_stays_in_head_after_body_start():
    check("x<script>var a;</script>", """
| <html>
|   <head>
|   <body>
|     "x"
|     <script>
|       "var a;"
""")


# third batch: select/table/after-mode interactions

def test_select_in_table_breakout():
    check("<table><tr><td><select><option>a<td>next</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|               <option>
|                 "a"
|           <td>
|             "next"
""")


def test_select_input_closes_select():
    check("<select><option>a<input type=text>b", """
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|     <input>
|       type="text"
|     "b"
""")


def test_nested_select_closes():
    # spec: <select> inside a select acts as </select> and is CONSUMED —
    # no second select element is created
    check("<select><option>1<select><option>2", """
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "1"
|     <option>
|       "2"
""")


def test_table_in_select_in_table():
    check("<table><tr><td><select><table><tr><td>x</table></table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|             <table>
|               <tbody>
|                 <tr>
|                   <td>
|                     "x"
""")


def test_whitespace_preserved_in_table_rows():
    check("<table> <tr> <td>x</td> </tr> </table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       " "
|       <tbody>
|         <tr>
|           " "
|           <td>
|             "x"
|           " "
|         " "
""")


def test_head_whitespace_placement():
    check("<head> <meta charset=x> </head> <body>", """
| <html>
|   <head>
|     " "
|     <meta>
|       charset="x"
|     " "
|   " "
|   <body>
""")


def test_col_outside_colgroup():
    check("<table><col span=2></table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           span="2"
""")


def test_caption_implies_close_on_table_elements():
    check("<table><caption>c<tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "c"
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_td_in_body_ignored():
    check("a<td>b", """
| <html>
|   <head>
|   <body>
|     "ab"
""")


def test_doctype_after_start_ignored():
    check("x<!DOCTYPE html>y", """
| <html>
|   <head>
|   <body>
|     "xy"
""")


# fourth batch: noscript-in-head, frameset modes, ruby, nested foreign

def test_in_head_noscript_scripting_off():
    check("<head><noscript><link href=x><p>breaks</noscript></head>", """
| <html>
|   <head>
|     <noscript>
|       <link>
|         href="x"
|   <body>
|     <p>
|       "breaks"
""", scripting=False)


def test_in_head_noscript_scripting_default_rawtext():
    # default (scripting=True) matches the reference: noscript content is
    # raw text everywhere (Sources/HTMLParser.m:500/914)
    check("<head><noscript><link href=x><p>breaks</noscript></head>", """
| <html>
|   <head>
|     <noscript>
|       "<link href=x><p>breaks"
|   <body>
""")


def test_noframes_in_frameset():
    check("<frameset><noframes>ignored <b>markup</noframes></frameset>", """
| <html>
|   <head>
|   <frameset>
|     <noframes>
|       "ignored <b>markup"
""")


def test_nested_framesets():
    check("<frameset rows='50%,50%'><frameset cols='2'><frame></frameset><frame></frameset>", """
| <html>
|   <head>
|   <frameset>
|     rows="50%,50%"
|     <frameset>
|       cols="2"
|       <frame>
|     <frame>
""")


def test_ruby_implied_ends():
    check("<ruby>base<rt>anno<rt>anno2</ruby>", """
| <html>
|   <head>
|   <body>
|     <ruby>
|       "base"
|       <rt>
|         "anno"
|       <rt>
|         "anno2"
""")


def test_ruby_rb_rp():
    check("<ruby><rb>b<rp>(<rt>r<rp>)</ruby>", """
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rb>
|         "b"
|       <rp>
|         "("
|       <rt>
|         "r"
|       <rp>
|         ")"
""")


def test_svg_inside_mathml_annotation():
    check("<math><annotation-xml><svg><g>x</g></svg></annotation-xml></math>", """
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         <svg svg>
|           <svg g>
|             "x"
""")


def test_math_in_svg_foreignobject():
    check("<svg><foreignObject><math><mi>m</mi></math></foreignObject></svg>", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foreignObject>
|         <math math>
|           <math mi>
|             "m"
""")


def test_xmp_rawtext_in_body():
    check("<p>a<xmp><b>not bold</xmp>c", """
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <xmp>
|       "<b>not bold"
|     "c"
""")


def test_iframe_rawtext():
    check("<iframe><p>inside</iframe>after", """
| <html>
|   <head>
|   <body>
|     <iframe>
|       "<p>inside"
|     "after"
""")


def test_optgroup_end_pops_option():
    check("<select><optgroup><option>a</optgroup><option>b</select>", """
| <html>
|   <head>
|   <body>
|     <select>
|       <optgroup>
|         <option>
|           "a"
|       <option>
|         "b"
""")


# fifth batch: head/metadata edges, base/meta ordering, after-head recovery

def test_style_after_body_started_goes_to_current():
    check("x<style>p{}</style>y", """
| <html>
|   <head>
|   <body>
|     "x"
|     <style>
|       "p{}"
|     "y"
""")


def test_base_link_meta_after_head_reenter_head():
    check("</head><meta charset=x><p>b", """
| <html>
|   <head>
|     <meta>
|       charset="x"
|   <body>
|     <p>
|       "b"
""")


def test_title_after_head_goes_to_head():
    check("</head><title>t</title><p>x", """
| <html>
|   <head>
|     <title>
|       "t"
|   <body>
|     <p>
|       "x"
""")


def test_multiple_body_tags_merge_attrs():
    check("<body a=1><p>x<body b=2>", """
| <html>
|   <head>
|   <body>
|     a="1"
|     b="2"
|     <p>
|       "x"
""")


def test_stray_end_html_in_body():
    check("<p>a</html><p>b", """
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <p>
|       "b"
""")


def test_head_after_head_ignored():
    # the second <head> is ignored, but per spec the metadata tag after it
    # is re-routed INTO the existing head element
    check("<head></head><head><meta charset=x></head><p>y", """
| <html>
|   <head>
|     <meta>
|       charset="x"
|   <body>
|     <p>
|       "y"
""")


def test_space_only_after_html_end():
    check("<p>x</p></html>  ", """
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|     "  "
""")


def test_button_inside_table_cell():
    check("<table><tr><td><button>go</button></td></tr></table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <button>
|               "go"
""")


def test_a_spanning_list_items():
    check("<ul><li><a href=x>one<li>two</ul>", """
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         <a>
|           href="x"
|           "one"
|       <li>
|         <a>
|           href="x"
|           "two"
""")


# sixth batch: namespaced attribute display, misc stragglers

def test_xlink_attr_display_in_dump():
    check('<svg><a xlink:href="u" xml:lang="en">t</a></svg>', """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg a>
|         xlink href="u"
|         xml lang="en"
|         "t"
""")


def test_foreign_self_closing_honored():
    # in foreign content the self-closing flag IS honored (unlike HTML)
    check("<svg><rect/><circle/>x</svg>", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg rect>
|       <svg circle>
|       "x"
""")


def test_html_self_closing_ignored_on_div():
    check("<div/>inside", """
| <html>
|   <head>
|   <body>
|     <div>
|       "inside"
""")


def test_eof_inside_foreign():
    check("<svg><g><text>abc", """
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|         <svg text>
|           "abc"
""")


def test_body_end_then_comment():
    # after-body comments become children of <html>, not <body>
    check("<p>x</body><!--tail-->", """
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|   <!-- tail -->
""")


def test_nul_stripped_in_body_kept_in_foreign():
    from htmlreader_ray.kernel import parse
    d = parse("a\0b")
    assert d.body_element.text_content == "ab"
    d2 = parse("<svg>a\0b</svg>")
    svg = d2.css_first("svg")
    assert svg.text_content == "a�b"


# seventh batch: form pointer rules, listing, stray body-level controls

def test_form_in_table_inserted_and_popped():
    check("<table><form><input type=hidden name=t><tr><td>x</table>", """
| <html>
|   <head>
|   <body>
|     <table>
|       <form>
|       <input>
|         name="t"
|         type="hidden"
|       <tbody>
|         <tr>
|           <td>
|             "x"
""")


def test_second_form_ignored_while_first_open():
    check("<form id=a><p><form id=b><input name=i>", """
| <html>
|   <head>
|   <body>
|     <form>
|       id="a"
|       <p>
|         <input>
|           name="i"
""")


def test_form_end_does_not_pop_descendants():
    # </form> removes the form from the STACK but leaves the open <div>
    # (and the form element in the tree); "y" keeps flowing into the div
    check("<form><div>x</form>y</div>z", """
| <html>
|   <head>
|   <body>
|     <form>
|       <div>
|         "xy"
|     "z"
""")


def test_listing_newline_suppressed():
    check("<listing>\ntext</listing>", """
| <html>
|   <head>
|   <body>
|     <listing>
|       "text"
""")


def test_optgroup_outside_select():
    check("<optgroup><option>a<option>b", """
| <html>
|   <head>
|   <body>
|     <optgroup>
|       <option>
|         "a"
|       <option>
|         "b"
""")


def test_keygen_void():
    check("<p><keygen>x", """
| <html>
|   <head>
|   <body>
|     <p>
|       <keygen>
|       "x"
""")


def test_formfeed_is_whitespace():
    check("<head>\x0c</head>\x0c<body>", """
| <html>
|   <head>
|     "\x0c"
|   "\x0c"
|   <body>
""")


def test_surrogate_entity_in_attr():
    check('<div title="&#xD83D;">x', """
| <html>
|   <head>
|   <body>
|     <div>
|       title="�"
|       "x"
""")


def test_pending_table_text_nul_split_is_one_unit():
    # The tokenizer splits " \x00t" into chunks around the NUL; the spec's
    # in-table-text pending list must still dispose of the WHOLE run as one
    # unit: NUL dropped, " t" (contains non-ws) foster-parented together.
    # Regression: the piecewise version put " " inside the table and
    # fostered only "t".
    check("<table> \x00t", """
| <html>
|   <head>
|   <body>
|     " t"
|     <table>
""")


def test_pending_table_text_flushes_on_eof_lt():
    # A trailing "<" re-emitted as text at EOF is part of the same pending
    # run as the newline before it — "\n<" is fostered as one unit.
    check("<table>\n<", """
| <html>
|   <head>
|   <body>
|     "
<"
|     <table>
""")
