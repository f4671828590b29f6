"""Main-content extraction: DOM -> ordered span sequence.

This is the extraction head the north rule asks for (BASELINE.json
`north_star`): HTML boilerplate stripping driven by (a) a CSS-selector
removal rule-set (compiled once per worker; mirrors the reference's guidance
to cache parsed selectors, /root/reference/Sources/include/HTMLSelector.h:20)
and (b) link-density node scoring, followed by `textContent` aggregation with
the reference's semantics (/root/reference/Sources/HTMLNode.m:219-228) and
whitespace canonicalization.

Output unit: ``(kind, text, media_ref, order)`` spans — the span-sequence
equality invariant (BASELINE.json `input_hint`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from .dom import Document, Element, Node, Text
from .parser import parse
from .selector import CompiledSelector, compile_selector

DEFAULT_REMOVE_SELECTORS: tuple[str, ...] = (
    "script", "style", "template", "noscript", "nav", "header", "footer",
    "aside", "iframe", "object", "embed", "select", "form",
    "[hidden]", "[aria-hidden=true]",
    ".nav", ".menu", ".sidebar", ".footer", ".header", ".advert", ".ads",
    "#comments",
)

# elements considered candidate text blocks for link-density scoring
_BLOCK_TAGS = frozenset(
    ["div", "p", "li", "ul", "ol", "td", "th", "section", "article", "dd",
     "dt", "blockquote"])

_WS_RUN = re.compile(r"\s+")


@dataclass(frozen=True)
class ExtractConfig:
    """Pluggable extraction rule-set (the engine's user-extension surface,
    SURVEY.md §2.11).

    ``min_text_density``: chars of own text per descendant element a block
    must average to survive (0 disables). Text-dense prose has density in
    the hundreds; markup-heavy chrome (menus, toolbars) sits near zero.
    Off by default so the deterministic round-trip contract of the synthetic
    corpus holds; production rule-sets enable it alongside link density.
    """
    remove_selectors: tuple[str, ...] = DEFAULT_REMOVE_SELECTORS
    max_link_density: float = 0.5
    min_block_chars: int = 10
    min_text_density: float = 0.0
    collapse_whitespace: bool = True


class Extractor:
    """Compile the rule-set once; reuse across documents.

    Instantiate once per actor (in ``__init__`` of the map_batches actor
    class), never per batch or per document.
    """

    def __init__(self, config: Optional[ExtractConfig] = None) -> None:
        self.config = config or ExtractConfig()
        # Bucket trivial rules into set lookups (one dict probe per element)
        # and keep compiled predicates only for selectors that need them —
        # the hot path cost is per-ELEMENT, so this matters at corpus scale.
        self._rm_tags: set[str] = set()
        self._rm_classes: set[str] = set()
        self._rm_ids: set[str] = set()
        self._rm_attrs: list[tuple[str, Optional[str]]] = []
        self._remove: list[CompiledSelector] = []
        import re as _re
        for s in self.config.remove_selectors:
            if _re.fullmatch(r"[a-zA-Z][a-zA-Z0-9-]*", s):
                self._rm_tags.add(s.lower())
            elif _re.fullmatch(r"\.[a-zA-Z_][\w-]*", s):
                self._rm_classes.add(s[1:])
            elif _re.fullmatch(r"#[a-zA-Z_][\w-]*", s):
                self._rm_ids.add(s[1:])
            elif _re.fullmatch(r"\[[a-zA-Z-]+\]", s):
                self._rm_attrs.append((s[1:-1].lower(), None))
            elif _re.fullmatch(r"\[[a-zA-Z-]+=[\w-]+\]", s):
                name, _, value = s[1:-1].partition("=")
                self._rm_attrs.append((name.lower(), value))
            else:
                self._remove.append(compile_selector(s))

    # ---------------------------------------------------------------- DOM ops
    def strip_boilerplate(self, doc: Document) -> Document:
        """Mutates doc: removes rule-matched nodes, then high-link-density
        blocks."""
        root: Node = doc.body_element or doc.root_element or doc
        # 1. selector-rule removal (set-bucketed fast path + compiled rest)
        rm_tags = self._rm_tags
        rm_classes = self._rm_classes
        rm_ids = self._rm_ids
        rm_attrs = self._rm_attrs
        rest = self._remove
        doomed: list[Element] = []
        stack = [root]
        while stack:
            node = stack.pop()
            if node.children:
                stack.extend(node.children)
            if not isinstance(node, Element):
                continue
            attrs = node.attrs
            if node.tag in rm_tags:
                doomed.append(node)
                continue
            if attrs:
                if rm_ids and attrs.get("id") in rm_ids:
                    doomed.append(node)
                    continue
                if rm_classes and not rm_classes.isdisjoint(
                        (attrs.get("class") or "").split()):
                    doomed.append(node)
                    continue
                hit = False
                for name, value in rm_attrs:
                    if name in attrs and (value is None
                                          or attrs[name] == value):
                        hit = True
                        break
                if hit:
                    doomed.append(node)
                    continue
            for sel in rest:
                if sel.matches(node):
                    doomed.append(node)
                    break
        for el in doomed:
            if el.parent is not None:
                el.parent.remove_child(el)
        # 2. link-density + text-density scoring (bottom-up so leaf junk is
        #    pruned before parents are scored)
        cfg = self.config
        if cfg.max_link_density < 1.0 or cfg.min_text_density > 0:
            blocks = [n for n in root.tree_order()
                      if isinstance(n, Element) and n.tag in _BLOCK_TAGS]
            for el in reversed(blocks):
                if el.parent is None:
                    continue
                total = len(el.text_content)
                if total == 0:
                    continue
                link_chars = sum(
                    len(a.text_content) for a in el.tree_order()
                    if isinstance(a, Element) and a.tag == "a")
                density = link_chars / total
                if density > cfg.max_link_density and \
                        total - link_chars < cfg.min_block_chars:
                    el.parent.remove_child(el)
                    continue
                if cfg.min_text_density > 0:
                    n_desc = sum(1 for d in el.tree_order()
                                 if isinstance(d, Element)) - 1
                    text_density = total / (1 + n_desc)
                    if text_density < cfg.min_text_density:
                        el.parent.remove_child(el)
        return doc

    def text_of(self, doc: Document) -> str:
        root: Node = doc.body_element or doc.root_element or doc
        text = root.text_content
        if self.config.collapse_whitespace:
            text = _WS_RUN.sub(" ", text).strip()
        return text

    # ------------------------------------------------------------ span level
    def extract_html(self, html: str) -> str:
        """One HTML payload -> canonical extracted main text."""
        doc = parse(html)
        self.strip_boilerplate(doc)
        return self.text_of(doc)

    def extract_spans(self, spans: list[dict]) -> list[dict]:
        """One document's interleaved spans -> ordered output spans.

        Input spans: {kind, text, media_ref, offset}; processed in offset
        order. Output: {kind, text, media_ref, order} with order a dense
        0-based sequence — the unit of the span-sequence-equality invariant.
        Empty text extractions are dropped (a boilerplate-only HTML span
        yields no output span); media spans always pass through.
        """
        ordered = sorted(spans, key=lambda s: s.get("offset", 0))
        out: list[dict] = []
        order = 0
        for span in ordered:
            kind = span.get("kind", "text")
            if kind == "media":
                ref = normalize_media_ref(span.get("media_ref") or "")
                out.append({"kind": "media", "text": "",
                            "media_ref": ref, "order": order})
                order += 1
            else:
                text = self.extract_html(span.get("text") or "")
                if text:
                    out.append({"kind": "text", "text": text,
                                "media_ref": "", "order": order})
                    order += 1
        return out


def normalize_media_ref(ref: str) -> str:
    """Canonicalize a media reference: strip whitespace, lowercase the
    scheme. The media/layout parse branch proper (image decode, PDF layout)
    is an actor-pool stage in stages/media.py; here we only validate the
    reference string."""
    ref = ref.strip()
    if "://" in ref:
        scheme, rest = ref.split("://", 1)
        return scheme.lower() + "://" + rest
    return ref
