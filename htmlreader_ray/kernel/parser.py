"""Public parse entry points.

API parity with the reference's top-level document constructors:
- ``parse``            ~ +[HTMLDocument documentWithString:]
  (/root/reference/Sources/HTMLDocument.m:27-44)
- ``parse_bytes``      ~ +[HTMLDocument documentWithData:contentTypeHeader:]
  with the meta-charset restart driver
  (/root/reference/Sources/HTMLParser.m:3331-3347)
- ``parse_fragment``   ~ -[HTMLParser initWithString:context:]
  (/root/reference/Sources/HTMLParser.m:71-107)

The restart on <meta charset> is a LOCAL retry inside one document's parse;
it never leaks into pipeline control flow (SURVEY.md §3.1, §7.3).
"""

from __future__ import annotations

from typing import Optional

from .dom import MATHML_NS, Document, Element, Node
from .encoding import (CERTAIN, TENTATIVE, SniffResult, decode_bytes,
                       normalize_meta_encoding, sniff_encoding)
from .tokenizer import Tokenizer
from .treebuilder import TreeBuilder

# Fused C parser accelerator (tokenizer + tree construction in one pass;
# see _cparser.c). Returns None ("bail") on constructs outside its ported
# subset (fragments, error collection, allocation failure) and the
# pure-Python kernel runs instead, so behavior is identical by construction
# (differential tests: tests/test_cparser.py). Force-disable with
# HTMLRAY_NO_CPARSE=1.
try:
    from . import _cparser_build as _cp_loader
    _CPARSE = _cp_loader.load()
except Exception:  # pragma: no cover - loader never raises by contract
    _CPARSE = None


def parse(html: str, *, collect_errors: bool = False,
          scripting: bool = True) -> Document:
    """Parse a complete HTML document from a string (tentative UTF-8).

    ``scripting`` defaults to True for reference parity (noscript is raw
    text, Sources/HTMLParser.m:500/914); pass False for the
    spec-without-scripting tree (parsed noscript children).
    """
    if not collect_errors and _CPARSE is not None:
        doc = _CPARSE.parse(html, scripting=scripting)
        if doc is not None:
            doc.parsed_encoding = "UTF-8"
            return doc
    tokenizer = Tokenizer(html, collect_errors=collect_errors)
    builder = TreeBuilder(collect_errors=collect_errors, scripting=scripting)
    doc = builder.run(tokenizer)
    doc.parsed_encoding = "UTF-8"
    if collect_errors:
        doc.parse_errors = tokenizer.errors + builder.errors  # type: ignore[attr-defined]
    return doc


class _EncodingChange(Exception):
    def __init__(self, name: str, codec: str) -> None:
        self.name = name
        self.codec = codec


def parse_bytes(data: bytes, content_type: Optional[str] = None,
                *, collect_errors: bool = False,
                scripting: bool = True) -> Document:
    """Sniff encoding, decode, parse; restart once if an in-head
    <meta charset> contradicts a tentative sniff."""
    sniff = sniff_encoding(data, content_type)
    doc = _parse_decoded(data, sniff, collect_errors=collect_errors,
                         scripting=scripting)
    return doc


def _parse_decoded(data: bytes, sniff: SniffResult, *,
                   collect_errors: bool, scripting: bool = True) -> Document:
    text = decode_bytes(data, sniff.encoding)
    current_label = sniff.label
    confidence = sniff.confidence

    # CERTAIN sniff (BOM / Content-Type header) can never restart on a
    # <meta charset> (HTMLParser.m:3338 guards on tentative confidence), so
    # the meta hook is a no-op and the fused C fast path applies directly.
    if confidence == CERTAIN and not collect_errors and _CPARSE is not None:
        doc = _CPARSE.parse(text, scripting=scripting)
        if doc is not None:
            doc.parsed_encoding = current_label
            return doc

    def on_meta(label: str) -> None:
        if confidence != TENTATIVE:
            return
        norm = normalize_meta_encoding(label)
        if norm is None:
            return
        name, codec = norm
        if name == current_label:
            return
        raise _EncodingChange(name, codec)

    tokenizer = Tokenizer(text, collect_errors=collect_errors)
    builder = TreeBuilder(collect_errors=collect_errors,
                          on_meta_charset=on_meta, scripting=scripting)
    try:
        doc = builder.run(tokenizer)
        doc.parsed_encoding = current_label
    except _EncodingChange as change:
        text = decode_bytes(data, change.codec)
        tokenizer = Tokenizer(text, collect_errors=collect_errors)
        builder = TreeBuilder(collect_errors=collect_errors,
                              scripting=scripting)
        doc = builder.run(tokenizer)
        doc.parsed_encoding = change.name
    if collect_errors:
        doc.parse_errors = tokenizer.errors + builder.errors  # type: ignore[attr-defined]
    return doc


def parse_fragment(html: str, context: "Element | str",
                   *, collect_errors: bool = False,
                   scripting: bool = True) -> list[Node]:
    """HTML fragment parsing algorithm; returns the parsed child nodes
    (re-rooted, i.e. detached from the internal html element)."""
    if isinstance(context, str):
        if " " in context:
            ns, tag = context.split(" ", 1)
            # html5lib context syntax uses the "math" prefix for the
            # MathML namespace ("math ms"); accept both spellings
            if ns == "math":
                ns = MATHML_NS
            context = Element(tag, namespace=ns)
        else:
            context = Element(context)
    tokenizer = Tokenizer(html, collect_errors=collect_errors)
    builder = TreeBuilder(fragment_context=context,
                          collect_errors=collect_errors,
                          scripting=scripting)
    doc = builder.run(tokenizer)
    root = doc.root_element
    if root is None:
        return []
    children = list(root.children)
    for c in children:
        root.remove_child(c)
    return children
