"""WHATWG HTML fragment serialization + debug tree dumps.

Semantics mirror /root/reference/Sources/HTMLSerialization.m:
- attribute escaping (& NBSP ") and text escaping (& NBSP < >), lines 135-176
- void element list and raw-text parents, lines 100-133
- pre/textarea/listing leading-newline restoration, lines 191-203
- recursiveDescription debug dump, lines 17-35
- the html5lib tree-dump format used by the conformance harness
  (/root/reference/HTMLReaderTests/HTMLTreeConstructionTests.m:140-206)
"""

from __future__ import annotations

from .constants import RAW_TEXT_SERIALIZE, VOID_ELEMENTS
from .dom import (HTML_NS, MATHML_NS, SVG_NS, Comment, Doctype, Document,
                  Element, Node, Text)


def _escape_attr(value: str) -> str:
    return (value.replace("&", "&amp;").replace("\xa0", "&nbsp;")
            .replace('"', "&quot;"))


def _escape_text(value: str) -> str:
    return (value.replace("&", "&amp;").replace("\xa0", "&nbsp;")
            .replace("<", "&lt;").replace(">", "&gt;"))


def serialize_fragment(node: Node) -> str:
    """Serialize the children of ``node`` (the innerHTML getter)."""
    out: list[str] = []
    _serialize_children(node, out)
    return "".join(out)


def serialize(node: Node) -> str:
    """Serialize ``node`` itself (outerHTML)."""
    out: list[str] = []
    _serialize_node(node, out)
    return "".join(out)


def _serialize_children(node: Node, out: list[str]) -> None:
    if isinstance(node, Element) and node.namespace == HTML_NS and \
            node.tag in ("pre", "textarea", "listing"):
        if node.children and isinstance(node.children[0], Text) and \
                node.children[0].data.startswith("\n"):
            out.append("\n")
    for child in node.children:
        _serialize_node(child, out, parent=node)


def _serialize_node(node: Node, out: list[str], parent: Node | None = None) -> None:
    if isinstance(node, Element):
        out.append("<")
        out.append(node.tag)
        for name, value in node.attrs.items():
            out.append(" ")
            out.append(name)
            out.append('="')
            out.append(_escape_attr(value))
            out.append('"')
        out.append(">")
        if node.namespace == HTML_NS and node.tag in VOID_ELEMENTS:
            return
        _serialize_children(node, out)
        out.append("</")
        out.append(node.tag)
        out.append(">")
    elif isinstance(node, Text):
        if (isinstance(parent, Element) and parent.namespace == HTML_NS
                and parent.tag in RAW_TEXT_SERIALIZE):
            out.append(node.data)
        else:
            out.append(_escape_text(node.data))
    elif isinstance(node, Comment):
        out.append("<!--")
        out.append(node.data)
        out.append("-->")
    elif isinstance(node, Doctype):
        out.append("<!DOCTYPE ")
        out.append(node.name)
        out.append(">")
    elif isinstance(node, Document):
        _serialize_children(node, out)


def recursive_description(node: Node, indent: int = 0) -> str:
    """Indented debug dump (reference: -recursiveDescription,
    /root/reference/Sources/HTMLSerialization.m:17-35)."""
    lines: list[str] = []

    def walk(n: Node, depth: int) -> None:
        pad = "    " * depth
        if isinstance(n, Element):
            lines.append(f"{pad}{n!r}")
        elif isinstance(n, Text):
            lines.append(f"{pad}text: {n.data!r}")
        elif isinstance(n, Comment):
            lines.append(f"{pad}comment: {n.data!r}")
        elif isinstance(n, Doctype):
            lines.append(f"{pad}doctype: {n.name}")
        else:
            lines.append(f"{pad}document")
        for c in n.children:
            walk(c, depth + 1)

    walk(node, indent)
    return "\n".join(lines)


_NS_PREFIX = {HTML_NS: "", SVG_NS: "svg ", MATHML_NS: "math "}


def dump_test_format(node: Node) -> str:
    """Dump a tree in the html5lib tree-construction expected format
    ("| " prefix, 2-space indent per depth)."""
    lines: list[str] = []

    def walk(n: Node, depth: int) -> None:
        pad = "| " + "  " * depth
        if isinstance(n, Element):
            lines.append(f"{pad}<{_NS_PREFIX[n.namespace]}{n.tag}>")
            for name in sorted(n.attrs):
                lines.append(f'{pad}  {name}="{n.attrs[name]}"')
        elif isinstance(n, Text):
            lines.append(f'{pad}"{n.data}"')
        elif isinstance(n, Comment):
            lines.append(f"{pad}<!-- {n.data} -->")
        elif isinstance(n, Doctype):
            if n.public_id or n.system_id:
                lines.append(
                    f'{pad}<!DOCTYPE {n.name} "{n.public_id}" "{n.system_id}">')
            else:
                lines.append(f"{pad}<!DOCTYPE {n.name}>")
        for c in n.children:
            walk(c, depth + 1)

    if isinstance(node, (Document,)):
        for c in node.children:
            walk(c, 0)
    else:
        for c in node.children:
            walk(c, 0)
    return "\n".join(lines)
