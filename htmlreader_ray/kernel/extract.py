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
from .parser import _CPARSE, parse
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
        # Fused C fast path: when every removal rule fits the set-bucketed
        # subset (no compiled complex selectors), the whole
        # parse -> strip -> text pipeline runs on the C arena with no
        # Python DOM (parity: tests/test_cparser.py, tools/soak.py cparse).
        self._cargs = None
        if _CPARSE is not None and not self._remove \
                and hasattr(_CPARSE, "extract"):
            cfg = self.config
            self._cargs = (
                True,  # scripting
                tuple(sorted(self._rm_tags)),
                tuple(sorted(self._rm_classes)),
                tuple(sorted(self._rm_ids)),
                tuple(self._rm_attrs),
                tuple(sorted(_BLOCK_TAGS)),
                float(cfg.max_link_density),
                int(cfg.min_block_chars),
                float(cfg.min_text_density),
                bool(cfg.collapse_whitespace),
            )

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
            # One bottom-up pass computes per-node (text chars, link chars,
            # element count); each removal subtracts its deltas up the live
            # ancestor chain, so every later (ancestor) block is scored
            # against the already-pruned tree — byte-identical to the
            # recompute-from-live-tree loop this replaces, but O(n) instead
            # of O(n * depth) text_content walks per block.
            order = list(root.tree_order())
            tlen: dict[int, int] = {}
            lsum: dict[int, int] = {}
            ecnt: dict[int, int] = {}
            for node in reversed(order):  # children before parents
                t = l = e = 0
                if isinstance(node, Text):
                    t = len(node.data)
                else:
                    for c in node.children:
                        cid = id(c)
                        t += tlen[cid]
                        l += lsum[cid]
                        e += ecnt[cid]
                    if isinstance(node, Element):
                        e += 1
                        if node.tag == "a":
                            # nested <a> double-counts, as the per-block
                            # sum over a.text_content it replaces did
                            l += t
                nid = id(node)
                tlen[nid] = t
                lsum[nid] = l
                ecnt[nid] = e
            for el in reversed(order):
                if not isinstance(el, Element) or el.tag not in _BLOCK_TAGS \
                        or el.parent is None:
                    continue
                eid = id(el)
                total = tlen[eid]
                if total == 0:
                    continue
                link_chars = lsum[eid]
                doom = (link_chars / total > cfg.max_link_density
                        and total - link_chars < cfg.min_block_chars)
                if not doom and cfg.min_text_density > 0:
                    doom = total / ecnt[eid] < cfg.min_text_density
                if doom:
                    # subtract this subtree from every live ancestor; k
                    # counts <a> ancestors passed so far — their text (and
                    # thus their own and higher link sums) shrank too
                    k = 0
                    anc = el.parent
                    el.parent.remove_child(el)
                    e_el = ecnt[eid]
                    l_el = lsum[eid]
                    while anc is not None and id(anc) in tlen:
                        if isinstance(anc, Element) and anc.tag == "a":
                            k += 1
                        aid = id(anc)
                        tlen[aid] -= total
                        lsum[aid] -= l_el + total * k
                        ecnt[aid] -= e_el
                        anc = anc.parent
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
        if self._cargs is not None:
            text = _CPARSE.extract(html, *self._cargs)
            if text is not None:
                return text
        doc = parse(html)
        self.strip_boilerplate(doc)
        return self.text_of(doc)

    def extract_html_many(self, texts: list) -> "object":
        """Batch of HTML payloads -> pyarrow StringArray of extracted text,
        elementwise identical to ``extract_html(t or "")``. Returns None
        when the C batch entry point is unavailable (caller falls back to
        per-doc calls). Docs the C parser bails on are re-run through the
        per-doc path (Python kernel); a doc whose Python parse RAISES gets
        a None slot — the caller owns on_error routing per document."""
        if self._cargs is None or _CPARSE is None \
                or not hasattr(_CPARSE, "extract_many"):
            return None
        import pyarrow as pa
        res = _CPARSE.extract_many(texts, *self._cargs)
        if res is None:
            return None
        data, offs, ok = res
        n = len(texts)
        arr = pa.Array.from_buffers(
            pa.utf8(), n, [None, pa.py_buffer(offs), pa.py_buffer(data)])
        if ok == b"\x01" * n:
            return arr
        vals = arr.to_pylist()
        for i, flag in enumerate(ok):
            if not flag:
                try:
                    vals[i] = self.extract_html(texts[i] or "")
                except Exception:
                    vals[i] = None          # caller maps to its doc
        return pa.array(vals, pa.string())

    def extract_html_many_arrow(self, arr) -> "object":
        """pyarrow StringArray of HTML -> StringArray of extracted text,
        elementwise identical to ``extract_html(s or "")``. The C entry
        reads straight from the array's (offsets, data) buffers, so no
        per-document PyUnicode is materialized on the input side (the
        ``to_pylist`` + re-encode round trip of the list path). Returns
        None when unavailable (caller falls back to the list path).
        Nulls are treated as empty documents; a doc whose C parse bails
        re-runs through the per-doc Python path, and one whose Python
        parse RAISES gets a None slot (same contract as
        ``extract_html_many``)."""
        if self._cargs is None or _CPARSE is None \
                or not hasattr(_CPARSE, "extract_arrow"):
            return None
        import pyarrow as pa
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not pa.types.is_string(arr.type):
            return None
        n = len(arr)
        if n == 0:
            return pa.array([], pa.string())
        if arr.null_count:
            import pyarrow.compute as pc
            arr = pc.fill_null(arr, "")
        bufs = arr.buffers()
        res = _CPARSE.extract_arrow(bufs[2] or b"", bufs[1], arr.offset, n,
                                    *self._cargs)
        if res is None:
            return None
        data, offs, ok = res
        out = pa.Array.from_buffers(
            pa.utf8(), n, [None, pa.py_buffer(offs), pa.py_buffer(data)])
        if ok == b"\x01" * n:
            return out
        vals = out.to_pylist()
        for i, flag in enumerate(ok):
            if not flag:
                try:
                    vals[i] = self.extract_html(arr[i].as_py() or "")
                except Exception:
                    vals[i] = None          # caller maps to its doc
        return pa.array(vals, pa.string())

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
