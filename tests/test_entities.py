"""Escape/unescape vectors ported from the reference
(/root/reference/HTMLReaderTests/HTMLEscapingTest.m:14-44) plus char-ref
decoder edge cases."""

from htmlreader_ray.kernel.entities import (consume_character_reference,
                                            html_escape, html_unescape)


def test_escaping_for_html():
    assert html_escape("& <>") == "&amp;&nbsp;&lt;&gt;"
    assert html_escape("<hello & howdy>") == "&lt;hello &amp; howdy&gt;"
    assert html_escape("") == ""


def test_unescaping_html():
    assert html_unescape(
        "&Aacute;&Aacute&preccurlyeq;&DoubleLongLeftRightArrow;") == "ÁÁ≼⟺"
    assert html_unescape("&#65;&#x42;&#X43") == "ABC"
    assert html_unescape("&#65;&Nope;&#X43;") == "A&Nope;C"
    assert html_unescape("&#65&Nope;&#X43;") == "A&Nope;C"
    assert html_unescape("&#65;&Nope;&#X43") == "A&Nope;C"
    assert html_unescape("&#65A;") == "AA;"
    assert html_unescape("&") == "&"
    assert html_unescape("&;") == "&;"
    assert html_unescape("&x;") == "&x;"
    assert html_unescape("&X;") == "&X;"
    assert html_unescape(";") == ";"
    assert html_unescape("&lt;hello &amp; howdy&gt;") == "<hello & howdy>"
    assert html_unescape("") == ""


def test_round_trip():
    s = "<hello & howdy>"
    escaped = html_escape(s)
    assert escaped != s
    assert html_unescape(escaped) == s


def test_win1252_numeric_overrides():
    assert html_unescape("&#x80;") == "€"
    assert html_unescape("&#153;") == "™"
    assert html_unescape("&#x9F;") == "Ÿ"
    assert html_unescape("&#xD835;") == "�"
    assert html_unescape("&#1114112;") == "�"
    assert html_unescape("&#0;") == "�"


def test_attribute_context_suppression():
    # named ref w/o ';' followed by alnum or '=' is not decoded in attributes
    decoded, pos = consume_character_reference("&ampx", 0, in_attribute=True)
    assert (decoded, pos) == ("&", 1)
    decoded, pos = consume_character_reference("&amp=", 0, in_attribute=True)
    assert (decoded, pos) == ("&", 1)
    decoded, pos = consume_character_reference("&amp;x", 0, in_attribute=True)
    assert (decoded, pos) == ("&", 5)
    # but in data context it decodes
    decoded, pos = consume_character_reference("&ampx", 0, in_attribute=False)
    assert (decoded, pos) == ("&", 4)


def test_longest_prefix_match():
    assert html_unescape("&not") == "¬"
    assert html_unescape("&notin;") == "∉"
    assert html_unescape("&notit;") == "¬it;"
    assert html_unescape("&gtcc;") == "⪧"
