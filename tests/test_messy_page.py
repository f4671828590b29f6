"""One realistic messy web page through the whole stack: parse, selectors,
extraction, serialization — an end-to-end anchor combining every kernel
subsystem at once."""

import re

from htmlreader_ray.kernel import parse, serialize_fragment
from htmlreader_ray.kernel.extract import Extractor

PAGE = """<!DOCTYPE html>
<html lang=en>
<head>
  <meta charset="utf-8">
  <meta http-equiv=X-UA-Compatible content="IE=edge">
  <title>Messy &amp; Glorious — a test page</title>
  <style>
    nav a { color: red; } /* </div> inside style must not close anything */
  </style>
  <script type="text/javascript">
    if (x < 3 && y > 2) { document.write("<b>nope</b>"); }
  </script>
</head>
<body>
  <nav class="menu">
    <ul><li><a href="/">Home</a><li><a href="/blog">Blog</a></ul>
  </nav>
  <header id="masthead"><h1>Site title</h1></header>
  <article>
    <h2 id=headline>Article &ldquo;headline&rdquo;</h2>
    <p class="lede">First paragraph with <b>bold <i>and italic</b> text</i>
    that is misnested.
    <p>Second paragraph with an &aacute;ccent, a &#8212; dash, and
    10 &lt; 20 math.</p>
    <table>
      <caption>Numbers</caption>
      stray table text
      <tr><td>1<td>2
      <tr><td>3<td>4
    </table>
    <ul>
      <li>alpha
      <li>beta
      <div>gamma inside list</div>
    </ul>
    <svg width="100" viewbox="0 0 10 10"><circle r="4"/><desc><em>emphasis</em></desc></svg>
    <pre>
  indented   text
</pre>
  </article>
  <aside class="sidebar"><ul><li><a href=1>Related A</a><li><a href=2>Related B</a></ul></aside>
  <footer>&copy; 2026 Nobody</footer>
</body>
</html>"""


def test_parse_structure():
    doc = parse(PAGE)
    assert doc.quirks_mode == "no-quirks"
    assert doc.css_first("title").text_content == \
        "Messy & Glorious — a test page"
    # misnested b/i handled by the adoption agency: both still queryable
    assert doc.css_first("p.lede b") is not None
    assert len(doc.css("i")) >= 1
    # table normalized with tbody, stray text foster-parented out
    assert doc.css_first("table tbody tr td").text_content == "1"
    assert len(doc.css("td")) == 4
    caption = doc.css_first("caption")
    assert caption.text_content.strip() == "Numbers"
    # svg attr case adjustment + desc is an HTML integration point
    svg = doc.css_first("svg")
    assert svg.attrs.get("viewBox") == "0 0 10 10"
    assert doc.css_first("desc em").text_content == "emphasis"
    # list with implied ends: gamma div nested in second li
    lis = doc.css("article > ul > li")
    assert len(lis) == 2
    assert "gamma" in lis[1].text_content


def test_selectors_on_messy_page():
    doc = parse(PAGE)
    assert [e.text_content for e in doc.css("nav a")] == ["Home", "Blog"]
    assert doc.css_first("#headline").text_content == "Article “headline”"
    assert len(doc.css("a[href^='/']")) == 2
    assert doc.css_first("td:nth-of-type(2)").text_content.strip() == "2"
    assert doc.css_first("html[lang|=en]") is not None


def test_extraction_drops_chrome_keeps_article():
    out = Extractor().extract_html(PAGE)
    # chrome gone
    assert "Home" not in out and "Related A" not in out and \
        "Nobody" not in out and "Site title" not in out
    assert "color: red" not in out and "document.write" not in out
    # article retained with entities decoded and misnesting fixed
    assert "Article “headline”" in out
    assert "bold and italic" in out
    assert "áccent" in out and "—" in out and "10 < 20" in out
    assert "alpha" in out and "gamma inside list" in out
    assert "indented text" in out  # whitespace collapsed


def test_serialization_roundtrip_stable():
    doc = parse(PAGE)
    once = serialize_fragment(doc.body_element)
    again = serialize_fragment(parse(
        "<!DOCTYPE html><body>" + once).body_element)
    assert once == again
