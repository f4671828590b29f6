"""Encoding sniffing + meta-charset restart tests (reference:
/root/reference/HTMLReaderTests/HTMLEncodingTests.m and
HTMLDocumentTests.m:14-47)."""

import codecs

from htmlreader_ray.kernel.encoding import (CERTAIN, TENTATIVE,
                                            encoding_for_label, sniff_encoding)
from htmlreader_ray.kernel.parser import parse_bytes


def test_bom_detection():
    assert sniff_encoding(codecs.BOM_UTF8 + b"x").label == "UTF-8"
    assert sniff_encoding(codecs.BOM_UTF16_BE + b"\x00x").label == "UTF-16BE"
    assert sniff_encoding(codecs.BOM_UTF16_LE + b"x\x00").label == "UTF-16LE"
    assert sniff_encoding(codecs.BOM_UTF8 + b"x").confidence == CERTAIN


def test_content_type_charset():
    r = sniff_encoding(b"hello", "text/html; charset=utf-8")
    assert r.label == "UTF-8" and r.confidence == CERTAIN
    r = sniff_encoding(b"hello", 'text/html; charset="iso-8859-1"')
    assert r.label == "windows-1252"
    r = sniff_encoding(b"hello", "text/html; charset=unknown-enc")
    assert r.label == "windows-1252" and r.confidence == TENTATIVE


def test_default_windows_1252():
    r = sniff_encoding(b"plain")
    assert r.label == "windows-1252" and r.confidence == TENTATIVE


def test_labels():
    assert encoding_for_label("  UTF-8  ")[0] == "UTF-8"
    assert encoding_for_label("latin1")[0] == "windows-1252"
    assert encoding_for_label("l1")[0] == "windows-1252"
    assert encoding_for_label("ascii")[0] == "windows-1252"
    assert encoding_for_label("x-sjis")[0] == "Shift_JIS"
    assert encoding_for_label("koi8_r")[0] == "KOI8-R"
    assert encoding_for_label("no-such-label") is None


def test_wrong_content_type_lossy():
    # reference unit case (HTMLEncodingTests.m:184-198): byte 0x90 with a
    # utf-8 content type decodes lossily
    doc = parse_bytes(b"<p>\x90</p>", "text/html; charset=utf-8")
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "�"


def test_windows_1252_high_bytes():
    doc = parse_bytes(b"<p>\x93quoted\x94</p>")
    assert doc.body_element.text_content == "“quoted”"


def test_meta_charset_restart():
    page = ("<html><head><meta charset=utf-8></head>"
            "<body><p>café</p></body></html>").encode("utf-8")
    doc = parse_bytes(page)
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "café"


def test_meta_http_equiv_restart():
    page = ("<html><head><meta http-equiv=Content-Type "
            "content='text/html; charset=utf-8'></head>"
            "<body><p>naïve</p></body></html>").encode("utf-8")
    doc = parse_bytes(page)
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "naïve"


def test_bom_beats_meta():
    page = codecs.BOM_UTF8 + (
        "<meta charset=windows-1252><p>é</p>").encode("utf-8")
    doc = parse_bytes(page)
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "é"


def test_utf16_meta_pinned_to_utf8():
    # <meta charset=utf-16> on a tentative parse re-decodes as UTF-8 per spec
    page = "<meta charset=utf-16><p>café</p>".encode("utf-8")
    doc = parse_bytes(page)
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "café"


def test_every_label_resolves_and_decodes():
    """Each WHATWG label in the table maps to a usable decoder."""
    from htmlreader_ray.kernel.encoding import _L, decode_bytes
    for label, (name, codec) in sorted(_L.items()):
        out = decode_bytes(b"abc 123", codec)
        if codec == "replacement":
            assert out == "�"
        elif codec in ("utf-16-le", "utf-16-be"):
            assert isinstance(out, str)  # garbage but decodable
        else:
            assert out == "abc 123", (label, codec, out)


def test_table_text_entities_stay_coalesced():
    # entity-split char fragments must still act as ONE run for the
    # in-table-text whitespace decision
    from htmlreader_ray.kernel import parse
    from htmlreader_ray.testing.conformance import dump_html5lib
    got = dump_html5lib(parse("<table>a&amp;b<tr><td>x</table>"))
    assert got == """| <html>
|   <head>
|   <body>
|     "a&b"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x\""""


def test_bom_beats_invalid_utf8_bytes():
    """Deliberate divergence from the reference: HTMLDocumentTests.m:40-48
    expects windows-1252 for a UTF-8 BOM followed by an invalid byte,
    because NSString's strict UTF-8 decode fails and the reference falls
    through. WHATWG (and every browser) gives the BOM unconditional
    precedence and decodes with U+FFFD replacement — this engine follows
    the spec."""
    from htmlreader_ray.kernel.parser import parse_bytes
    doc = parse_bytes(b"\xef\xbb\xbf<p>\xf5ok</p>")
    assert doc.parsed_encoding == "UTF-8"
    assert doc.body_element.text_content == "�ok"


def test_meta_content_empty_charset_values():
    """charset= with nothing (or only quotes/separators) after it must be
    ignored, not crash: `val[:1] in "\\"'"` was True for EMPTY val (empty
    string is a substring of anything) and val[0] raised. Found by
    parse_bytes byte-fuzz."""
    from htmlreader_ray.kernel.parser import parse_bytes
    for b in (b'<meta http-equiv=content-type content="charset=">x',
              b'<meta http-equiv=content-type content="charset=;">x',
              b'<meta http-equiv=content-type content="charset= ; ">x',
              b"<meta http-equiv=content-type content=\"charset='\">x"):
        assert parse_bytes(b).parsed_encoding == "windows-1252"


def test_parse_bytes_never_crashes_on_arbitrary_bytes():
    """Byte-level robustness of the sniff -> decode -> parse -> restart
    driver (the reference's regression policy generalized to the byte
    entry point)."""
    import random
    from htmlreader_ray.kernel.parser import parse_bytes
    rng = random.Random(9595)
    snips = [b"<meta charset=", b"utf-8", b"\xef\xbb\xbf", b"\xff\xfe",
             b"\xfe\xff", b"<p>", b"</p>", b"\xf5\x80", b"\x00", b"&amp;",
             b"<title>", b"<script>", b"shift_jis", b"'>", b'">', b">",
             b'<meta http-equiv=content-type content="charset=']
    for _ in range(3000):
        data = b"".join(rng.choice(snips)
                        for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.3:
            data += bytes(rng.randrange(256)
                          for _ in range(rng.randint(0, 20)))
        doc = parse_bytes(data)
        assert doc is not None and doc.parsed_encoding


def test_every_codec_decodes_adversarial_bytes():
    """Every registered codec decodes arbitrary byte patterns (truncated
    multibyte sequences, lone surrogates encodings, 0xFF runs) to a str —
    the replacement scheme never raises."""
    from htmlreader_ray.kernel import encoding as enc
    blobs = [b"", b"\x00", bytes(range(256)), b"\xff" * 7,
             b"\x81\x40\xfe\xfe", b"\xe0\x80", b"\xed\xa0\x80"]
    seen = set()
    for name, codec in enc._L.values():
        if codec in seen:
            continue
        seen.add(codec)
        for b in blobs:
            assert isinstance(enc.decode_bytes(b, codec), str)
    assert len(seen) >= 35
