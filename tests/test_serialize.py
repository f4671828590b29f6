"""Serializer vectors ported from the reference
(/root/reference/HTMLReaderTests/HTMLSerializerTests.m:17-78, themselves from
html5lib serializers/core.test)."""

import pytest

from htmlreader_ray.kernel import parse, serialize, serialize_fragment
from htmlreader_ray.kernel.dom import Doctype, Element, Text


def test_bare_element():
    assert serialize(Element("br")) == "<br>"


ATTR_CASES = [
    ('test "with" &quot;', '<span title="test &quot;with&quot; &amp;quot;"></span>'),
    ("foo", '<span title="foo"></span>'),
    ("foo<bar", '<span title="foo<bar"></span>'),
    ("foo=bar", '<span title="foo=bar"></span>'),
    ("foo>bar", '<span title="foo>bar"></span>'),
    ('foo"bar', '<span title="foo&quot;bar"></span>'),
    ("foo'bar", '<span title="foo\'bar"></span>'),
    ("foo'bar\"baz", '<span title="foo\'bar&quot;baz"></span>'),
    ("foo bar", '<span title="foo bar"></span>'),
    ("foo\tbar", '<span title="foo\tbar"></span>'),
    ("foo\nbar", '<span title="foo\nbar"></span>'),
    ("foo\rbar", '<span title="foo\rbar"></span>'),
    ("foo\x0cbar", '<span title="foo\x0cbar"></span>'),
]


@pytest.mark.parametrize("value,expected", ATTR_CASES)
def test_attribute_escaping(value, expected):
    assert serialize(Element("span", {"title": value})) == expected


def test_doctype():
    assert serialize(Doctype("HTML")) == "<!DOCTYPE HTML>"
    assert serialize(Doctype("HTML", "-//W3C//DTD HTML 4.01//EN",
                             "http://www.w3.org/TR/html4/strict.dtd")) == \
        "<!DOCTYPE HTML>"
    assert serialize(Doctype("html", "",
                             "http://www.ibm.com/data/dtd/v11/"
                             "ibmxhtml1-transitional.dtd")) == "<!DOCTYPE html>"


def test_text_escaping():
    el = Element("p")
    el.append_child(Text("a<b>c&d"))
    assert serialize_fragment(el) == "a&lt;b&gt;c&amp;d"


def test_rcdata_parent_not_escaped():
    el = Element("script")
    el.append_child(Text("a<b>c&d"))
    assert serialize(el) == "<script>a<b>c&d</script>"


def test_void_elements():
    doc = parse("<p><img src=x><br><input type=text></p>")
    body = doc.body_element
    assert serialize_fragment(body) == \
        '<p><img src="x"><br><input type="text"></p>'


def test_pre_leading_newline_restored():
    doc = parse("<pre>\n\nx</pre>")
    body = doc.body_element
    # parse ate the first \n; serializer re-adds one
    assert serialize_fragment(body) == "<pre>\n\nx</pre>"


def test_inner_html_roundtrip():
    src = '<div id="a" class="b c"><p>x &amp; y</p><!--note--></div>'
    doc = parse(src)
    assert serialize_fragment(doc.body_element) == \
        '<div id="a" class="b c"><p>x &amp; y</p><!--note--></div>'


def test_template_serializes_its_content():
    # spec: serializing a template element serializes its template
    # CONTENTS fragment, not its (empty) children
    doc = parse("<template><b>x</b></template>")
    head = doc.root_element.children[0]
    assert serialize_fragment(head) == "<template><b>x</b></template>"


def test_boolean_attr_and_foreign_qualified_names():
    # boolean attributes keep ="" (WHATWG serialization, no minimization);
    # foreign-content adjusted attributes serialize with their qualified
    # names (xlink:href / xml:lang)
    doc = parse('<p><input disabled><svg xlink:href=a xml:lang=en></svg></p>')
    assert serialize_fragment(doc.body_element) == (
        '<p><input disabled=""><svg xlink:href="a" xml:lang="en"></svg></p>')
