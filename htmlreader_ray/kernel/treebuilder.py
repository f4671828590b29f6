"""WHATWG HTML5 tree construction.

From-scratch re-derivation of the spec's tree-construction algorithm with the
same external behavior as the reference's 23-insertion-mode parser
(/root/reference/Sources/HTMLParser.m:157-2467): insertion-mode dispatch,
active-formatting-element reconstruction with the Noah's Ark clause
(HTMLParser.m:3181-3232), the adoption agency algorithm
(HTMLParser.m:1142-1267), foster parenting (HTMLParser.m:3014-3048),
implied end tags + scope queries (HTMLParser.m:2890-2993,3244-3258), quirks
classification (HTMLParser.m:172-305), foreign-content rules with SVG/MathML
case-adjustment tables (HTMLParser.m:2280-2467) and the fragment algorithm
(HTMLParser.m:71-107).

The entire parse of one document runs inside a single map_batches UDF call;
no parser state ever crosses a batch boundary (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Optional

from . import constants as C
from .dom import (HTML_NS, LIMITED_QUIRKS, MATHML_NS, NO_QUIRKS, QUIRKS,
                  SVG_NS, Comment, Doctype, Document, Element, Node, Text)
from .strings import WHITESPACE_SET
from .tokenizer import (DATA, PLAINTEXT, RAWTEXT, RCDATA, SCRIPT_DATA,
                        Tokenizer, ascii_lower)

MARKER = object()  # active-formatting-elements list marker

# insertion modes
(INITIAL, BEFORE_HTML, BEFORE_HEAD, IN_HEAD, IN_HEAD_NOSCRIPT, AFTER_HEAD,
 IN_BODY, TEXT, IN_TABLE, IN_CAPTION, IN_COLUMN_GROUP, IN_TABLE_BODY, IN_ROW,
 IN_CELL, IN_SELECT, IN_SELECT_IN_TABLE, IN_TEMPLATE, AFTER_BODY, IN_FRAMESET,
 AFTER_FRAMESET, AFTER_AFTER_BODY, AFTER_AFTER_FRAMESET) = range(22)

_BLOCK_CLOSERS = frozenset("""
address article aside blockquote button center details dialog dir div dl
fieldset figcaption figure footer header hgroup listing main menu nav ol pre
section summary ul
""".split())

_BLOCK_OPENERS = frozenset("""
address article aside blockquote center details dialog dir div dl fieldset
figcaption figure footer header hgroup main nav ol p section summary ul
""".split())
# menu is NOT in the plain block-opener group: the reference gives it a
# dedicated handler that also pops an open menuitem
# (Sources/HTMLParser.m:702-711) — see _s_menu.


def _is_special(node: Element) -> bool:
    if node.namespace == HTML_NS:
        return node.tag in C.SPECIAL_HTML
    if node.namespace == MATHML_NS:
        return node.tag in C.SPECIAL_MATHML
    return node.tag in C.SPECIAL_SVG


def _is_mathml_text_ip(node: Element) -> bool:
    return node.namespace == MATHML_NS and node.tag in (
        "mi", "mo", "mn", "ms", "mtext")


def _is_html_ip(node: Element) -> bool:
    if node.namespace == SVG_NS and node.tag in ("foreignObject", "desc", "title"):
        return True
    if node.namespace == MATHML_NS and node.tag == "annotation-xml":
        enc = node.attrs.get("encoding", "").lower()
        return enc in ("text/html", "application/xhtml+xml")
    return False


class StopParsing(Exception):
    pass


class TreeBuilder:
    def __init__(self, *, fragment_context: Optional[Element] = None,
                 collect_errors: bool = True,
                 on_meta_charset=None, scripting: bool = True) -> None:
        self.document = Document()
        self.open: list[Element] = []
        self.afe: list = []  # elements and MARKER
        self.mode = INITIAL
        self.original_mode = INITIAL
        self.template_modes: list[int] = []
        self.head_ptr: Optional[Element] = None
        self.form_ptr: Optional[Element] = None
        self.frameset_ok = True
        self.foster_parenting = False
        self.ignore_next_lf = False
        # "pending table character tokens" (spec's in-table-text mode):
        # consecutive chars tokens in a table context accumulate here and
        # are disposed of as ONE unit at the next non-chars token — a run
        # the tokenizer split (e.g. around a NUL) must not be flushed
        # piecewise, else a whitespace-only chunk lands in the table while
        # the rest is foster-parented.
        self._pending_tt: Optional[list] = None
        # Default True for reference parity: the reference always treats
        # noscript as raw text — in head (Sources/HTMLParser.m:500), in body
        # (HTMLParser.m:914) and as a fragment context (HTMLParser.m:93-95);
        # its HTMLInHeadNoscriptInsertionMode (HTMLParser.m:24) is declared
        # but never entered. scripting=False restores the full
        # spec-without-scripting path (in-head-noscript mode, parsed
        # noscript children).
        self.scripting = scripting
        self.fragment_context = fragment_context
        self.errors: list[str] = []
        self._collect_errors = collect_errors
        self.on_meta_charset = on_meta_charset
        self.tokenizer: Optional[Tokenizer] = None
        self.stopped = False
        # fast path: until a foreign (SVG/MathML) element is pushed, the
        # adjusted-current-node checks can be skipped entirely
        self.saw_foreign = False

    # ------------------------------------------------------------------ run
    def run(self, tokenizer: Tokenizer) -> Document:
        self.tokenizer = tokenizer
        ctx = self.fragment_context
        if ctx is not None:
            self._setup_fragment(tokenizer, ctx)
        for tok in tokenizer.tokens():
            self.process(tok)
            if self.stopped:
                break
            if self.saw_foreign:
                # keep the tokenizer's foreign-content flag in sync for CDATA
                acn = self._adjusted_current_node()
                tokenizer.adjusted_current_node_is_foreign = (
                    acn is not None and acn.namespace != HTML_NS)
        return self.document

    def _setup_fragment(self, tokenizer: Tokenizer, ctx: Element) -> None:
        self.document.quirks_mode = NO_QUIRKS
        root = Element("html")
        self.document.append_child(root)
        self.open.append(root)
        if ctx.namespace != HTML_NS:
            self.saw_foreign = True
        if ctx.namespace == HTML_NS:
            tag = ctx.tag
            if tag in ("title", "textarea"):
                tokenizer.state = RCDATA
            elif tag in ("style", "xmp", "iframe", "noembed", "noframes"):
                tokenizer.state = RAWTEXT
            elif tag == "script":
                tokenizer.state = SCRIPT_DATA
            elif tag == "noscript" and self.scripting:
                tokenizer.state = RAWTEXT
            elif tag == "plaintext":
                tokenizer.state = PLAINTEXT
            if tag == "template":
                self.template_modes.append(IN_TEMPLATE)
        self._reset_insertion_mode()
        node: Optional[Node] = ctx
        while node is not None:
            if isinstance(node, Element) and node.tag == "form" and node.namespace == HTML_NS:
                self.form_ptr = node
                break
            node = node.parent
        tokenizer.last_start_tag = ctx.tag if ctx.namespace == HTML_NS else None

    # ------------------------------------------------------------- utilities
    def _err(self, code: str) -> None:
        if self._collect_errors:
            self.errors.append(code)

    @property
    def current(self) -> Optional[Element]:
        return self.open[-1] if self.open else None

    def _adjusted_current_node(self) -> Optional[Element]:
        if self.fragment_context is not None and len(self.open) == 1:
            return self.fragment_context
        return self.current

    def _appropriate_place(self, override: Optional[Element] = None):
        """Returns (parent, index) per the spec's "appropriate place for
        inserting a node" incl. foster parenting
        (reference: Sources/HTMLParser.m:3014-3048)."""
        target = override if override is not None else self.current
        if (self.foster_parenting and target is not None
                and target.namespace == HTML_NS
                and target.tag in ("table", "tbody", "tfoot", "thead", "tr")):
            last_template = None
            last_table = None
            last_table_idx = -1
            last_template_idx = -1
            for i, el in enumerate(self.open):
                if el.tag == "template" and el.namespace == HTML_NS:
                    last_template = el
                    last_template_idx = i
                if el.tag == "table" and el.namespace == HTML_NS:
                    last_table = el
                    last_table_idx = i
            if last_template is not None and (
                    last_table is None or last_template_idx > last_table_idx):
                return last_template, len(last_template.children)
            if last_table is None:
                first = self.open[0]
                return first, len(first.children)
            if last_table.parent is not None:
                return last_table.parent, last_table.parent.children.index(last_table)
            above = self.open[last_table_idx - 1]
            return above, len(above.children)
        return target, len(target.children)

    def _insert_node(self, node: Node, override: Optional[Element] = None) -> None:
        parent, idx = self._appropriate_place(override)
        parent.insert_child(idx, node)

    def _insert_element(self, tag: str, attrs: dict, namespace: str = HTML_NS,
                        push: bool = True) -> Element:
        el = Element(tag, attrs, namespace)
        if not self.foster_parenting:
            parent = self.open[-1]
            el.parent = parent
            parent.children.append(el)
        else:
            self._insert_node(el)
        if push:
            self.open.append(el)
        return el

    def _insert_text(self, data: str) -> None:
        if not data:
            return
        if not self.foster_parenting:
            parent = self.open[-1]
            children = parent.children
            if children and isinstance(children[-1], Text):
                children[-1].data += data
                return
            t = Text(data)
            t.parent = parent
            children.append(t)
            return
        parent, idx = self._appropriate_place()
        if isinstance(parent, Document):
            return  # spec: never insert text into a Document
        if idx > 0 and isinstance(parent.children[idx - 1], Text):
            parent.children[idx - 1].data += data
        else:
            parent.insert_child(idx, Text(data))

    def _insert_comment(self, data: str, parent: Optional[Node] = None) -> None:
        if parent is not None:
            parent.append_child(Comment(data))
        else:
            self._insert_node(Comment(data))

    # scope checks ----------------------------------------------------------
    def _in_scope(self, target, barrier_html=C.SCOPE_BASE_HTML) -> bool:
        """target: tag name (str), set of names, or an Element object.
        (The target match is checked before the barrier on each node, so a
        tag that is its own barrier — e.g. html in the base scope — still
        matches.)"""
        if isinstance(target, str):
            for node in reversed(self.open):
                ns = node.namespace
                if ns == HTML_NS:
                    if node.tag == target:
                        return True
                    if node.tag in barrier_html:
                        return False
                elif ns == MATHML_NS:
                    if node.tag in C.SPECIAL_MATHML:
                        return False
                else:
                    if node.tag in C.SPECIAL_SVG:
                        return False
            return False
        is_set = isinstance(target, (set, frozenset))
        for node in reversed(self.open):
            if is_set:
                if node.tag in target and node.namespace == HTML_NS:
                    return True
            elif node is target:
                return True
            if node.namespace == HTML_NS:
                if node.tag in barrier_html:
                    return False
            elif node.namespace == MATHML_NS:
                if node.tag in C.SPECIAL_MATHML:
                    return False
            else:
                if node.tag in C.SPECIAL_SVG:
                    return False
        return False

    def _in_button_scope(self, tag: str) -> bool:
        return self._in_scope(tag, C.SCOPE_BUTTON_HTML)

    def _in_list_scope(self, tag: str) -> bool:
        return self._in_scope(tag, C.SCOPE_LIST_HTML)

    def _in_table_scope(self, target) -> bool:
        for node in reversed(self.open):
            if isinstance(target, (set, frozenset)):
                if node.tag in target and node.namespace == HTML_NS:
                    return True
            elif node.tag == target and node.namespace == HTML_NS:
                return True
            if node.namespace == HTML_NS and node.tag in C.SCOPE_TABLE_HTML:
                return False
        return False

    def _in_select_scope(self, tag: str) -> bool:
        for node in reversed(self.open):
            if node.tag == tag and node.namespace == HTML_NS:
                return True
            if not (node.namespace == HTML_NS and node.tag in ("optgroup", "option")):
                return False
        return False

    # stack helpers ---------------------------------------------------------
    def _pop_until(self, tags) -> Element:
        if isinstance(tags, str):
            tags = (tags,)
        while self.open:
            node = self.open.pop()
            if node.tag in tags and node.namespace == HTML_NS:
                return node
        raise AssertionError("pop_until underflow")

    def _generate_implied_end_tags(self, except_for: Optional[str] = None,
                                   thorough: bool = False) -> None:
        allowed = C.IMPLIED_END_THOROUGH if thorough else C.IMPLIED_END
        while self.open:
            cur = self.open[-1]
            if (cur.namespace == HTML_NS and cur.tag in allowed
                    and cur.tag != except_for):
                self.open.pop()
            else:
                return

    def _close_p(self) -> None:
        self._generate_implied_end_tags(except_for="p")
        if not (self.current and self.current.tag == "p"):
            self._err("unexpected-open-elements-closing-p")
        self._pop_until("p")

    def _clear_to_table_context(self) -> None:
        while self.open[-1].tag not in ("table", "template", "html") or \
                self.open[-1].namespace != HTML_NS:
            self.open.pop()

    def _clear_to_table_body_context(self) -> None:
        while self.open[-1].tag not in ("tbody", "tfoot", "thead", "template",
                                        "html") or self.open[-1].namespace != HTML_NS:
            self.open.pop()

    def _clear_to_table_row_context(self) -> None:
        while self.open[-1].tag not in ("tr", "template", "html") or \
                self.open[-1].namespace != HTML_NS:
            self.open.pop()

    # active formatting elements -------------------------------------------
    def _push_afe(self, el: Element) -> None:
        """Noah's Ark clause (max 3 identical entries since last marker;
        reference: Sources/HTMLParser.m:3181-3195)."""
        count = 0
        for entry in reversed(self.afe):
            if entry is MARKER:
                break
            if (entry.tag == el.tag and entry.namespace == el.namespace
                    and entry.attrs == el.attrs):
                count += 1
                if count == 3:
                    self.afe.remove(entry)
                    break
        self.afe.append(el)

    def _reconstruct_afe(self) -> None:
        """(reference: Sources/HTMLParser.m:3207-3232)"""
        if not self.afe:
            return
        last = self.afe[-1]
        if last is MARKER or last in self.open:
            return
        i = len(self.afe) - 1
        while i > 0:
            i -= 1
            entry = self.afe[i]
            if entry is MARKER or entry in self.open:
                i += 1
                break
        while i < len(self.afe):
            entry = self.afe[i]
            clone = Element(entry.tag, dict(entry.attrs), entry.namespace)
            self._insert_node(clone)
            self.open.append(clone)
            self.afe[i] = clone
            i += 1

    def _clear_afe_to_marker(self) -> None:
        while self.afe:
            entry = self.afe.pop()
            if entry is MARKER:
                return

    # reset insertion mode --------------------------------------------------
    def _reset_insertion_mode(self) -> None:
        for i in range(len(self.open) - 1, -1, -1):
            node = self.open[i]
            last = i == 0
            if last and self.fragment_context is not None:
                node = self.fragment_context
            tag = node.tag if node.namespace == HTML_NS else None
            if tag == "select":
                mode = IN_SELECT
                if not last:
                    for j in range(i - 1, 0, -1):
                        anc = self.open[j]
                        if anc.tag == "template":
                            break
                        if anc.tag == "table":
                            mode = IN_SELECT_IN_TABLE
                            break
                self.mode = mode
                return
            if tag in ("td", "th") and not last:
                self.mode = IN_CELL
                return
            if tag == "tr":
                self.mode = IN_ROW
                return
            if tag in ("tbody", "thead", "tfoot"):
                self.mode = IN_TABLE_BODY
                return
            if tag == "caption":
                self.mode = IN_CAPTION
                return
            if tag == "colgroup":
                self.mode = IN_COLUMN_GROUP
                return
            if tag == "table":
                self.mode = IN_TABLE
                return
            if tag == "template":
                self.mode = self.template_modes[-1]
                return
            if tag == "head" and not last:
                self.mode = IN_HEAD
                return
            if tag == "body":
                self.mode = IN_BODY
                return
            if tag == "frameset":
                self.mode = IN_FRAMESET
                return
            if tag == "html":
                self.mode = BEFORE_HEAD if self.head_ptr is None else AFTER_HEAD
                return
            if last:
                self.mode = IN_BODY
                return

    # ------------------------------------------------------------- dispatch
    def process(self, tok) -> None:
        kind = tok[0]
        if self._pending_tt is not None and kind != "chars":
            self._flush_table_text()
        if kind == "chars" and self.ignore_next_lf:
            self.ignore_next_lf = False
            data = tok[1]
            if data.startswith("\n"):
                data = data[1:]
                if not data:
                    return
                tok = ("chars", data)
        else:
            self.ignore_next_lf = False
        if not self.saw_foreign:
            # inline of _process_html (hot path: every token of a document
            # with no foreign content goes through here)
            dispatch = _MODE_DISPATCH
            while True:
                res = dispatch[self.mode](self, tok)
                if not res:
                    return
                if res is not True:
                    tok = res
        acn = self._adjusted_current_node()
        use_html = True
        if acn is not None and acn.namespace != HTML_NS:
            use_html = False
            if kind == "chars":
                if _is_mathml_text_ip(acn) or _is_html_ip(acn):
                    use_html = True
            elif kind == "start":
                name = tok[1]
                if _is_mathml_text_ip(acn) and name not in ("mglyph", "malignmark"):
                    use_html = True
                elif (acn.namespace == MATHML_NS and acn.tag == "annotation-xml"
                      and name == "svg"):
                    use_html = True
                elif _is_html_ip(acn):
                    use_html = True
            elif kind == "eof":
                use_html = True
        if use_html:
            # inline of _process_html (hot path)
            dispatch = _MODE_DISPATCH
            while True:
                res = dispatch[self.mode](self, tok)
                if not res:
                    return
                if res is not True:
                    tok = res
        else:
            self._process_foreign(tok)

    def _process_html(self, tok) -> None:
        # handlers return False/None (consumed), True (reprocess same token in
        # the new mode), or a replacement token to reprocess
        while True:
            res = _MODE_DISPATCH[self.mode](self, tok)
            if not res:
                return
            if res is not True:
                tok = res

    # ----------------------------------------------------------- mode: text
    def _mode_text(self, tok):
        kind = tok[0]
        if kind == "chars":
            self._insert_text(tok[1])
            return False
        if kind == "eof":
            self._err("eof-in-text-mode")
            self.open.pop()
            self.mode = self.original_mode
            return True
        # any end tag (incl. script — no execution)
        self.open.pop()
        self.mode = self.original_mode
        return False

    # --------------------------------------------------------- mode: initial
    def _mode_initial(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1].lstrip("\t\n\x0c\r ")
            if not data:
                return False
            self._err("expected-doctype-but-got-chars")
            self.document.quirks_mode = QUIRKS
            self.mode = BEFORE_HTML
            return ("chars", data)
        if kind == "comment":
            self.document.append_child(Comment(tok[1]))
            return False
        if kind == "doctype":
            name, public, system, force_quirks = tok[1], tok[2], tok[3], tok[4]
            node = Doctype(name or "", public or "", system or "")
            self.document.append_child(node)
            self.document.quirks_mode = self._classify_quirks(
                name, public, system, force_quirks)
            self.mode = BEFORE_HTML
            return False
        self._err("expected-doctype")
        self.document.quirks_mode = QUIRKS
        self.mode = BEFORE_HTML
        return True

    @staticmethod
    def _classify_quirks(name, public, system, force_quirks) -> str:
        if force_quirks or name != "html":
            return QUIRKS
        pl = public.lower() if public is not None else None
        sl = system.lower() if system is not None else None
        if pl is not None:
            if pl in C.QUIRKY_PUBLIC_EXACT:
                return QUIRKS
            if pl.startswith(C.QUIRKY_PUBLIC_PREFIXES):
                return QUIRKS
            if system is None and pl.startswith(C.QUIRKY_IF_NO_SYSTEM_PREFIXES):
                return QUIRKS
        if sl is not None and sl in C.QUIRKY_SYSTEM_EXACT:
            return QUIRKS
        if pl is not None:
            if pl.startswith(C.LIMITED_QUIRKS_PREFIXES):
                return LIMITED_QUIRKS
            if system is not None and pl.startswith(C.QUIRKY_IF_NO_SYSTEM_PREFIXES):
                return LIMITED_QUIRKS
        return NO_QUIRKS

    # ------------------------------------------------------ mode: before html
    def _mode_before_html(self, tok):
        kind = tok[0]
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "comment":
            self.document.append_child(Comment(tok[1]))
            return False
        if kind == "chars":
            data = tok[1].lstrip("\t\n\x0c\r ")
            if not data:
                return False
            tok = ("chars", data)
        elif kind == "start" and tok[1] == "html":
            el = Element("html", tok[2])
            self.document.append_child(el)
            self.open.append(el)
            self.mode = BEFORE_HEAD
            return False
        elif kind == "end" and tok[1] not in ("head", "body", "html", "br"):
            self._err("unexpected-end-tag-before-html")
            return False
        el = Element("html", {})
        self.document.append_child(el)
        self.open.append(el)
        self.mode = BEFORE_HEAD
        return tok

    # ------------------------------------------------------ mode: before head
    def _mode_before_head(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1].lstrip("\t\n\x0c\r ")
            if not data:
                return False
            tok = ("chars", data)
        elif kind == "comment":
            self._insert_comment(tok[1])
            return False
        elif kind == "doctype":
            self._err("unexpected-doctype")
            return False
        elif kind == "start":
            if tok[1] == "html":
                return self._mode_in_body(tok)
            if tok[1] == "head":
                self.head_ptr = self._insert_element("head", tok[2])
                self.mode = IN_HEAD
                return False
        elif kind == "end" and tok[1] not in ("head", "body", "html", "br"):
            self._err("unexpected-end-tag-before-head")
            return False
        self.head_ptr = self._insert_element("head", {})
        self.mode = IN_HEAD
        return tok

    # --------------------------------------------------------- mode: in head
    def _mode_in_head(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            i = 0
            while i < len(data) and data[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._insert_text(data[:i])
            if i == len(data):
                return False
            # anything-else with the remainder: pop head, reprocess
            self.open.pop()
            self.mode = AFTER_HEAD
            return ("chars", data[i:])
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            name, attrs = tok[1], tok[2]
            if name == "html":
                return self._mode_in_body(tok)
            if name in ("base", "basefont", "bgsound", "link"):
                self._insert_element(name, attrs, push=False)
                return False
            if name == "meta":
                self._insert_element(name, attrs, push=False)
                self._check_meta_charset(attrs)
                return False
            if name == "title":
                self._generic_rcdata(tok)
                return False
            if (name == "noscript" and not self.scripting):
                self._insert_element(name, attrs)
                self.mode = IN_HEAD_NOSCRIPT
                return False
            if name in ("noframes", "style") or (name == "noscript" and self.scripting):
                self._generic_rawtext(tok)
                return False
            if name == "script":
                self._insert_element(name, attrs)
                self.tokenizer.state = SCRIPT_DATA
                self.original_mode = self.mode
                self.mode = TEXT
                return False
            if name == "template":
                self._insert_element(name, attrs)
                self.afe.append(MARKER)
                self.frameset_ok = False
                self.mode = IN_TEMPLATE
                self.template_modes.append(IN_TEMPLATE)
                return False
            if name == "head":
                self._err("unexpected-head-in-head")
                return False
        else:  # end tag / eof
            if kind == "end":
                name = tok[1]
                if name == "head":
                    self.open.pop()
                    self.mode = AFTER_HEAD
                    return False
                if name == "template":
                    return self._end_template()
                if name not in ("body", "html", "br"):
                    self._err("unexpected-end-tag-in-head")
                    return False
        self.open.pop()
        self.mode = AFTER_HEAD
        return tok

    def _check_meta_charset(self, attrs: dict) -> None:
        if self.on_meta_charset is None:
            return
        charset = attrs.get("charset")
        if charset is None and attrs.get("http-equiv", "").lower() == "content-type":
            # WHATWG "extracting a character encoding from a meta
            # element": find 'charset' case-insensitively, allow
            # whitespace around '=', restart after a bare 'charset'
            # token, quoted value fails without its closing quote,
            # unquoted value ends at whitespace or ';'. (The
            # reference never prescans meta at all —
            # Sources/HTMLEncoding.m '// TODO Prescan?' — this whole
            # path is a documented extension.)
            content = attrs.get("content", "")
            low = content.lower()
            ws = " \t\n\f\r"
            pos = 0
            val = ""
            while True:
                idx = low.find("charset", pos)
                if idx == -1:
                    break
                j = idx + 7
                while j < len(content) and content[j] in ws:
                    j += 1
                if j < len(content) and content[j] == "=":
                    j += 1
                    while j < len(content) and content[j] in ws:
                        j += 1
                    if j >= len(content):
                        break
                    if content[j] in ("\"", "'"):
                        q = content[j]
                        end = content.find(q, j + 1)
                        if end != -1:
                            val = content[j + 1:end]
                        break
                    k = j
                    while k < len(content) \
                            and content[k] not in ws + ";":
                        k += 1
                    val = content[j:k]
                    break
                pos = j
            if val:
                charset = val
        if charset:
            self.on_meta_charset(charset)

    def _end_template(self):
        if not any(e.tag == "template" and e.namespace == HTML_NS
                   for e in self.open):
            self._err("unexpected-end-template")
            return False
        self._generate_implied_end_tags(thorough=True)
        if not (self.current and self.current.tag == "template"):
            self._err("unexpected-open-elements-end-template")
        self._pop_until("template")
        self._clear_afe_to_marker()
        if self.template_modes:
            self.template_modes.pop()
        self._reset_insertion_mode()
        return False

    def _generic_rcdata(self, tok) -> None:
        self._insert_element(tok[1], tok[2])
        self.tokenizer.state = RCDATA
        self.original_mode = self.mode
        self.mode = TEXT

    def _generic_rawtext(self, tok) -> None:
        self._insert_element(tok[1], tok[2])
        self.tokenizer.state = RAWTEXT
        self.original_mode = self.mode
        self.mode = TEXT

    # ----------------------------------------------- mode: in head noscript
    def _mode_in_head_noscript(self, tok):
        kind = tok[0]
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start" and tok[1] == "html":
            return self._mode_in_body(tok)
        if kind == "end" and tok[1] == "noscript":
            self.open.pop()
            self.mode = IN_HEAD
            return False
        if kind == "chars":
            data = tok[1]
            i = 0
            while i < len(data) and data[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._insert_text(data[:i])
            if i == len(data):
                return False
            self._err("unexpected-char-in-head-noscript")
            self.open.pop()
            self.mode = IN_HEAD
            return ("chars", data[i:])
        if kind == "comment":
            return self._mode_in_head(tok)
        if kind == "start":
            name = tok[1]
            if name in ("basefont", "bgsound", "link", "meta", "noframes", "style"):
                return self._mode_in_head(tok)
            if name in ("head", "noscript"):
                self._err("unexpected-start-tag-in-head-noscript")
                return False
        if kind == "end" and tok[1] != "br":
            self._err("unexpected-end-tag-in-head-noscript")
            return False
        self._err("unexpected-token-in-head-noscript")
        self.open.pop()
        self.mode = IN_HEAD
        return True

    # ------------------------------------------------------ mode: after head
    def _mode_after_head(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            i = 0
            while i < len(data) and data[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._insert_text(data[:i])
            if i == len(data):
                return False
            tok = ("chars", data[i:])
        elif kind == "comment":
            self._insert_comment(tok[1])
            return False
        elif kind == "doctype":
            self._err("unexpected-doctype")
            return False
        elif kind == "start":
            name, attrs = tok[1], tok[2]
            if name == "html":
                return self._mode_in_body(tok)
            if name == "body":
                self._insert_element("body", attrs)
                self.frameset_ok = False
                self.mode = IN_BODY
                return False
            if name == "frameset":
                self._insert_element("frameset", attrs)
                self.mode = IN_FRAMESET
                return False
            if name in ("base", "basefont", "bgsound", "link", "meta",
                        "noframes", "script", "style", "template", "title"):
                self._err("unexpected-start-tag-after-head")
                assert self.head_ptr is not None
                self.open.append(self.head_ptr)
                self._mode_in_head(tok)
                if self.head_ptr in self.open:
                    self.open.remove(self.head_ptr)
                return False
            if name == "head":
                self._err("unexpected-head-after-head")
                return False
        elif kind == "end":
            name = tok[1]
            if name == "template":
                return self._mode_in_head(tok)
            if name not in ("body", "html", "br"):
                self._err("unexpected-end-tag-after-head")
                return False
        self._insert_element("body", {})
        self.mode = IN_BODY
        return tok

    # --------------------------------------------------------- mode: in body
    def _mode_in_body(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            if "\0" in data:
                self._err("unexpected-null-character")
                data = data.replace("\0", "")
                if not data:
                    return False
            self._reconstruct_afe()
            self._insert_text(data)
            if self.frameset_ok and data.strip("\t\n\x0c\r "):
                self.frameset_ok = False
            return False
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            return self._in_body_start(tok)
        if kind == "end":
            return self._in_body_end(tok)
        # EOF
        if self.template_modes:
            return self._mode_in_template(tok)
        for node in self.open:
            if node.tag not in ("dd", "dt", "li", "optgroup", "option", "p",
                               "rb", "rp", "rt", "rtc", "tbody", "td", "tfoot",
                               "th", "thead", "tr", "body", "html"):
                self._err("expected-closing-tags-at-eof")
                break
        self.stopped = True
        return False

    def _in_body_start(self, tok):
        # dict dispatch: one lookup instead of a ~25-branch membership chain
        handler = _IN_BODY_START.get(tok[1])
        if handler is None:
            # any other start tag
            self._reconstruct_afe()
            self._insert_element(tok[1], tok[2])
            return False
        return handler(self, tok)

    def _s_html(self, tok):
        attrs = tok[2]
        self._err("unexpected-html-start-tag")
        if any(e.tag == "template" for e in self.open):
            return False
        top = self.open[0]
        for k, v in attrs.items():
            if k not in top.attrs:
                top.attrs[k] = v
        return False

    def _s_in_head(self, tok):
        return self._mode_in_head(tok)

    def _s_body(self, tok):
        attrs = tok[2]
        self._err("unexpected-body-start-tag")
        if (len(self.open) < 2 or self.open[1].tag != "body"
                or any(e.tag == "template" for e in self.open)):
            return False
        self.frameset_ok = False
        body = self.open[1]
        for k, v in attrs.items():
            if k not in body.attrs:
                body.attrs[k] = v
        return False

    def _s_frameset(self, tok):
        attrs = tok[2]
        self._err("unexpected-frameset-start-tag")
        if len(self.open) < 2 or self.open[1].tag != "body":
            return False
        if not self.frameset_ok:
            return False
        body = self.open[1]
        if body.parent is not None:
            body.parent.remove_child(body)
        while len(self.open) > 1:
            self.open.pop()
        self._insert_element("frameset", attrs)
        self.mode = IN_FRAMESET
        return False

    def _s_block(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        return False

    def _pop_current_menuitem(self) -> None:
        """2016-era spec behavior kept by the reference: menu/menuitem/hr
        start tags pop an open menuitem (Sources/HTMLParser.m:702-711,
        884-891, 938-945)."""
        cur = self.current
        if cur is not None and cur.tag == "menuitem" \
                and cur.namespace == HTML_NS:
            self.open.pop()

    def _s_menu(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._pop_current_menuitem()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_menuitem(self, tok):
        # acts like <option>: self-popping, with AFE reconstruction
        # (Sources/HTMLParser.m:938-945 incl. the SPEC-gap comment there)
        self._pop_current_menuitem()
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_heading(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        if self.current and self.current.tag in C.HEADINGS and \
                self.current.namespace == HTML_NS:
            self._err("nested-heading")
            self.open.pop()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_pre(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        self.ignore_next_lf = True
        self.frameset_ok = False
        return False

    def _s_form(self, tok):
        if self.form_ptr is not None and not any(
                e.tag == "template" for e in self.open):
            self._err("unexpected-form-in-form")
            return False
        if self._in_button_scope("p"):
            self._close_p()
        el = self._insert_element(tok[1], tok[2])
        if not any(e.tag == "template" for e in self.open):
            self.form_ptr = el
        return False

    def _s_li(self, tok):
        self.frameset_ok = False
        for node in reversed(self.open):
            if node.tag == "li" and node.namespace == HTML_NS:
                self._generate_implied_end_tags(except_for="li")
                if self.current.tag != "li":
                    self._err("unexpected-open-elements-li")
                self._pop_until("li")
                break
            if _is_special(node) and node.tag not in ("address", "div", "p"):
                break
        if self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_dd_dt(self, tok):
        self.frameset_ok = False
        for node in reversed(self.open):
            if node.tag in ("dd", "dt") and node.namespace == HTML_NS:
                self._generate_implied_end_tags(except_for=node.tag)
                if self.current.tag != node.tag:
                    self._err("unexpected-open-elements-dd-dt")
                self._pop_until(node.tag)
                break
            if _is_special(node) and node.tag not in ("address", "div", "p"):
                break
        if self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_plaintext(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        self.tokenizer.state = PLAINTEXT
        return False

    def _s_button(self, tok):
        if self._in_scope("button"):
            self._err("unexpected-button-in-button")
            self._generate_implied_end_tags()
            self._pop_until("button")
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        self.frameset_ok = False
        return False

    def _s_a(self, tok):
        for entry in reversed(self.afe):
            if entry is MARKER:
                break
            if entry.tag == "a":
                self._err("unexpected-a-in-a")
                self._adoption_agency("a")
                if entry in self.afe:
                    self.afe.remove(entry)
                if entry in self.open:
                    self.open.remove(entry)
                break
        self._reconstruct_afe()
        el = self._insert_element(tok[1], tok[2])
        self._push_afe(el)
        return False

    def _s_formatting(self, tok):
        self._reconstruct_afe()
        el = self._insert_element(tok[1], tok[2])
        self._push_afe(el)
        return False

    def _s_nobr(self, tok):
        self._reconstruct_afe()
        if self._in_scope("nobr"):
            self._err("unexpected-nobr-in-nobr")
            self._adoption_agency("nobr")
            self._reconstruct_afe()
        el = self._insert_element(tok[1], tok[2])
        self._push_afe(el)
        return False

    def _s_applet(self, tok):
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        self.afe.append(MARKER)
        self.frameset_ok = False
        return False

    def _s_table(self, tok):
        if self.document.quirks_mode != QUIRKS and self._in_button_scope("p"):
            self._close_p()
        self._insert_element(tok[1], tok[2])
        self.frameset_ok = False
        self.mode = IN_TABLE
        return False

    def _s_void(self, tok):
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2], push=False)
        self.frameset_ok = False
        return False

    def _s_input(self, tok):
        attrs = tok[2]
        self._reconstruct_afe()
        self._insert_element(tok[1], attrs, push=False)
        if attrs.get("type", "").lower() != "hidden":
            self.frameset_ok = False
        return False

    def _s_param(self, tok):
        self._insert_element(tok[1], tok[2], push=False)
        return False

    def _s_hr(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._pop_current_menuitem()
        self._insert_element(tok[1], tok[2], push=False)
        self.frameset_ok = False
        return False

    def _s_image(self, tok):
        self._err("image-start-tag")
        return self._in_body_start(("start", "img", tok[2], tok[3]))

    def _s_textarea(self, tok):
        self._insert_element(tok[1], tok[2])
        self.ignore_next_lf = True
        self.tokenizer.state = RCDATA
        self.original_mode = self.mode
        self.frameset_ok = False
        self.mode = TEXT
        return False

    def _s_xmp(self, tok):
        if self._in_button_scope("p"):
            self._close_p()
        self._reconstruct_afe()
        self.frameset_ok = False
        self._generic_rawtext(tok)
        return False

    def _s_iframe(self, tok):
        self.frameset_ok = False
        self._generic_rawtext(tok)
        return False

    def _s_noembed(self, tok):
        self._generic_rawtext(tok)
        return False

    def _s_noscript(self, tok):
        if self.scripting:
            self._generic_rawtext(tok)
            return False
        # scripting off: ordinary element
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_select(self, tok):
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        self.frameset_ok = False
        if self.mode in (IN_TABLE, IN_CAPTION, IN_TABLE_BODY, IN_ROW,
                         IN_CELL):
            self.mode = IN_SELECT_IN_TABLE
        else:
            self.mode = IN_SELECT
        return False

    def _s_option(self, tok):
        if self.current and self.current.tag == "option":
            self.open.pop()
        self._reconstruct_afe()
        self._insert_element(tok[1], tok[2])
        return False

    def _s_rb_rtc(self, tok):
        if self._in_scope("ruby"):
            self._generate_implied_end_tags()
            if self.current.tag != "ruby":
                self._err("unexpected-open-elements-ruby")
        self._insert_element(tok[1], tok[2])
        return False

    def _s_rp_rt(self, tok):
        if self._in_scope("ruby"):
            self._generate_implied_end_tags(except_for="rtc")
            if self.current.tag not in ("ruby", "rtc"):
                self._err("unexpected-open-elements-ruby")
        self._insert_element(tok[1], tok[2])
        return False

    def _s_math(self, tok):
        attrs = tok[2]
        self._reconstruct_afe()
        self._adjust_mathml_attrs(attrs)
        el = Element(tok[1], attrs, MATHML_NS)
        self._insert_node(el)
        if not tok[3]:
            self.open.append(el)
        self.saw_foreign = True
        return False

    def _s_svg(self, tok):
        self._reconstruct_afe()
        new_attrs = self._adjust_svg_attrs(tok[2])
        el = Element(tok[1], new_attrs, SVG_NS)
        self._insert_node(el)
        if not tok[3]:
            self.open.append(el)
        self.saw_foreign = True
        return False

    def _s_ignored(self, tok):
        self._err("unexpected-start-tag-ignored")
        return False

    def _in_body_end(self, tok):
        name = tok[1]
        if name == "template":
            return self._end_template()
        if name in ("body", "html"):
            if not self._in_scope("body"):
                self._err("unexpected-end-tag")
                return False
            for node in self.open:
                if node.tag not in ("dd", "dt", "li", "optgroup", "option",
                                    "p", "rb", "rp", "rt", "rtc", "tbody",
                                    "td", "tfoot", "th", "thead", "tr",
                                    "body", "html"):
                    self._err("expected-closed-elements-at-end-body")
                    break
            self.mode = AFTER_BODY
            return name == "html"
        if name in _BLOCK_CLOSERS or name == "pre":
            if not self._in_scope(name):
                self._err("unexpected-end-tag")
                return False
            self._generate_implied_end_tags()
            if self.current.tag != name:
                self._err("unexpected-open-elements-end-tag")
            self._pop_until(name)
            return False
        if name == "form":
            if not any(e.tag == "template" for e in self.open):
                node = self.form_ptr
                self.form_ptr = None
                if node is None or not self._in_scope(node):
                    self._err("unexpected-end-tag-form")
                    return False
                self._generate_implied_end_tags()
                if self.current is not node:
                    self._err("unexpected-open-elements-end-form")
                self.open.remove(node)
                return False
            if not self._in_scope("form"):
                self._err("unexpected-end-tag-form")
                return False
            self._generate_implied_end_tags()
            if self.current.tag != "form":
                self._err("unexpected-open-elements-end-form")
            self._pop_until("form")
            return False
        if name == "p":
            if not self._in_button_scope("p"):
                self._err("unexpected-end-tag-p")
                self._insert_element("p", {})
            self._close_p()
            return False
        if name == "li":
            if not self._in_list_scope("li"):
                self._err("unexpected-end-tag-li")
                return False
            self._generate_implied_end_tags(except_for="li")
            if self.current.tag != "li":
                self._err("unexpected-open-elements-end-li")
            self._pop_until("li")
            return False
        if name in ("dd", "dt"):
            if not self._in_scope(name):
                self._err("unexpected-end-tag")
                return False
            self._generate_implied_end_tags(except_for=name)
            if self.current.tag != name:
                self._err("unexpected-open-elements-end-tag")
            self._pop_until(name)
            return False
        if name in C.HEADINGS:
            if not self._in_scope(C.HEADINGS):
                self._err("unexpected-end-tag-heading")
                return False
            self._generate_implied_end_tags()
            if self.current.tag != name:
                self._err("unexpected-open-elements-end-heading")
            self._pop_until(C.HEADINGS)
            return False
        if name in C.FORMATTING:
            res = self._adoption_agency(name)
            if res:
                return self._any_other_end_tag(name)
            return False
        if name in ("applet", "marquee", "object"):
            if not self._in_scope(name):
                self._err("unexpected-end-tag")
                return False
            self._generate_implied_end_tags()
            if self.current.tag != name:
                self._err("unexpected-open-elements-end-tag")
            self._pop_until(name)
            self._clear_afe_to_marker()
            return False
        if name == "br":
            self._err("unexpected-end-tag-br")
            self._reconstruct_afe()
            self._insert_element("br", {}, push=False)
            self.frameset_ok = False
            return False
        return self._any_other_end_tag(name)

    def _any_other_end_tag(self, name: str):
        for node in reversed(self.open):
            if node.tag == name and node.namespace == HTML_NS:
                self._generate_implied_end_tags(except_for=name)
                if self.current is not node:
                    self._err("unexpected-open-elements-end-tag")
                while self.open:
                    if self.open.pop() is node:
                        break
                return False
            if _is_special(node):
                self._err("unexpected-end-tag")
                return False
        return False

    # --------------------------------------------------- adoption agency
    def _adoption_agency(self, subject: str):
        """Returns True when the caller must run the any-other-end-tag steps
        (reference: Sources/HTMLParser.m:1142-1267)."""
        cur = self.current
        if (cur is not None and cur.namespace == HTML_NS and cur.tag == subject
                and cur not in self.afe):
            self.open.pop()
            return False
        for _ in range(8):
            fmt = None
            for entry in reversed(self.afe):
                if entry is MARKER:
                    break
                if entry.tag == subject:
                    fmt = entry
                    break
            if fmt is None:
                return True
            if fmt not in self.open:
                self._err("adoption-agency-1.2")
                self.afe.remove(fmt)
                return False
            if not self._in_scope(fmt):
                self._err("adoption-agency-4.4")
                return False
            if fmt is not self.current:
                self._err("adoption-agency-1.3")
            fmt_idx = self.open.index(fmt)
            furthest = None
            for node in self.open[fmt_idx + 1:]:
                if _is_special(node):
                    furthest = node
                    break
            if furthest is None:
                del self.open[fmt_idx:]
                self.afe.remove(fmt)
                return False
            common_ancestor = self.open[fmt_idx - 1]
            bookmark = self.afe.index(fmt)
            node = furthest
            last_node = furthest
            node_above = self.open[self.open.index(node) - 1]
            inner = 0
            while True:
                inner += 1
                node = node_above
                if node is fmt:
                    break
                idx = self.open.index(node)
                node_above = self.open[idx - 1]
                if inner > 3 and node in self.afe:
                    self.afe.remove(node)
                if node not in self.afe:
                    self.open.remove(node)
                    continue
                clone = Element(node.tag, dict(node.attrs), node.namespace)
                self.afe[self.afe.index(node)] = clone
                self.open[self.open.index(node)] = clone
                node = clone
                if last_node is furthest:
                    bookmark = self.afe.index(clone) + 1
                node.append_child(last_node)
                last_node = node
            # insert last_node at the appropriate place with common_ancestor
            # as the override target (foster-parenting aware when the common
            # ancestor is a table section)
            if last_node.parent is not None:
                last_node.parent.remove_child(last_node)
            saved_foster = self.foster_parenting
            if (common_ancestor.namespace == HTML_NS and common_ancestor.tag
                    in ("table", "tbody", "tfoot", "thead", "tr")):
                self.foster_parenting = True
            parent, idx = self._appropriate_place(override=common_ancestor)
            self.foster_parenting = saved_foster
            parent.insert_child(idx, last_node)
            clone = Element(fmt.tag, dict(fmt.attrs), fmt.namespace)
            for c in list(furthest.children):
                clone.append_child(c)
            furthest.append_child(clone)
            fmt_afe_idx = self.afe.index(fmt)
            self.afe.remove(fmt)
            if fmt_afe_idx < bookmark:
                bookmark -= 1
            self.afe.insert(bookmark, clone)
            self.open.remove(fmt)
            self.open.insert(self.open.index(furthest) + 1, clone)
        return False

    # --------------------------------------------------------- mode: tables
    def _flush_table_text(self) -> None:
        """Dispose of the pending table character tokens as one unit (the
        spec's in-table-text "anything else" step)."""
        data = "".join(self._pending_tt)
        self._pending_tt = None
        nnul = data.count("\0")
        if nnul:
            for _ in range(nnul):
                self._err("unexpected-null-character")
            data = data.replace("\0", "")
        if not data:
            return
        if data.strip("\t\n\x0c\r "):
            # any non-whitespace: the WHOLE run is reprocessed under
            # in-body rules with foster parenting enabled
            self._err("unexpected-chars-in-table")
            self.foster_parenting = True
            self._mode_in_body(("chars", data))
            self.foster_parenting = False
        else:
            self._insert_text(data)

    def _mode_in_table(self, tok):
        kind = tok[0]
        if kind == "chars":
            cur = self.current
            if cur is not None and cur.namespace == HTML_NS and cur.tag in (
                    "table", "tbody", "tfoot", "thead", "tr", "template"):
                if self._pending_tt is None:
                    self._pending_tt = []
                self._pending_tt.append(tok[1])
                return False
            self._err("unexpected-token-in-table")
            self.foster_parenting = True
            self._mode_in_body(tok)
            self.foster_parenting = False
            return False
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            name, attrs = tok[1], tok[2]
            if name == "caption":
                self._clear_to_table_context()
                self.afe.append(MARKER)
                self._insert_element(name, attrs)
                self.mode = IN_CAPTION
                return False
            if name == "colgroup":
                self._clear_to_table_context()
                self._insert_element(name, attrs)
                self.mode = IN_COLUMN_GROUP
                return False
            if name == "col":
                self._clear_to_table_context()
                self._insert_element("colgroup", {})
                self.mode = IN_COLUMN_GROUP
                return True
            if name in ("tbody", "tfoot", "thead"):
                self._clear_to_table_context()
                self._insert_element(name, attrs)
                self.mode = IN_TABLE_BODY
                return False
            if name in ("td", "th", "tr"):
                self._clear_to_table_context()
                self._insert_element("tbody", {})
                self.mode = IN_TABLE_BODY
                return True
            if name == "table":
                self._err("unexpected-table-in-table")
                if not self._in_table_scope("table"):
                    return False
                self._pop_until("table")
                self._reset_insertion_mode()
                return True
            if name in ("style", "script", "template"):
                return self._mode_in_head(tok)
            if name == "input":
                if attrs.get("type", "").lower() == "hidden":
                    self._err("unexpected-hidden-input-in-table")
                    self._insert_element(name, attrs, push=False)
                    return False
            elif name == "form":
                self._err("unexpected-form-in-table")
                if self.form_ptr is None and not any(
                        e.tag == "template" for e in self.open):
                    el = self._insert_element(name, attrs)
                    self.form_ptr = el
                    self.open.pop()
                return False
        if kind == "end":
            name = tok[1]
            if name == "table":
                if not self._in_table_scope("table"):
                    self._err("unexpected-end-table")
                    return False
                self._pop_until("table")
                self._reset_insertion_mode()
                return False
            if name == "template":
                return self._end_template()
            if name in ("body", "caption", "col", "colgroup", "html", "tbody",
                        "td", "tfoot", "th", "thead", "tr"):
                self._err("unexpected-end-tag-in-table")
                return False
        if kind == "eof":
            return self._mode_in_body(tok)
        self._err("unexpected-token-in-table")
        self.foster_parenting = True
        self._mode_in_body(tok)
        self.foster_parenting = False
        return False

    def _mode_in_caption(self, tok):
        kind = tok[0]
        if kind == "end" and tok[1] == "caption":
            return self._close_caption(reprocess=False)
        if (kind == "start" and tok[1] in ("caption", "col", "colgroup",
                                           "tbody", "td", "tfoot", "th",
                                           "thead", "tr")) or \
                (kind == "end" and tok[1] == "table"):
            return self._close_caption(reprocess=True)
        if kind == "end" and tok[1] in ("body", "col", "colgroup", "html",
                                        "tbody", "td", "tfoot", "th", "thead",
                                        "tr"):
            self._err("unexpected-end-tag-in-caption")
            return False
        return self._mode_in_body(tok)

    def _close_caption(self, *, reprocess: bool):
        if not self._in_table_scope("caption"):
            self._err("unexpected-end-caption")
            return False
        self._generate_implied_end_tags()
        if self.current.tag != "caption":
            self._err("unexpected-open-elements-end-caption")
        self._pop_until("caption")
        self._clear_afe_to_marker()
        self.mode = IN_TABLE
        return reprocess

    def _mode_in_column_group(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            i = 0
            while i < len(data) and data[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._insert_text(data[:i])
            if i == len(data):
                return False
            tok = ("chars", data[i:])
        elif kind == "comment":
            self._insert_comment(tok[1])
            return False
        elif kind == "doctype":
            self._err("unexpected-doctype")
            return False
        elif kind == "start":
            name = tok[1]
            if name == "html":
                return self._mode_in_body(tok)
            if name == "col":
                self._insert_element(name, tok[2], push=False)
                return False
            if name == "template":
                return self._mode_in_head(tok)
        elif kind == "end":
            name = tok[1]
            if name == "colgroup":
                if not (self.current and self.current.tag == "colgroup"):
                    self._err("unexpected-end-colgroup")
                    return False
                self.open.pop()
                self.mode = IN_TABLE
                return False
            if name == "col":
                self._err("unexpected-end-col")
                return False
            if name == "template":
                return self._mode_in_head(tok)
        elif kind == "eof":
            return self._mode_in_body(tok)
        if not (self.current and self.current.tag == "colgroup"):
            self._err("unexpected-token-in-column-group")
            return False
        self.open.pop()
        self.mode = IN_TABLE
        # return the (possibly ws-trimmed) token: for a chars chunk whose
        # whitespace prefix was already inserted above, `True` would make
        # the caller re-dispatch the ORIGINAL untrimmed chunk
        return tok

    def _mode_in_table_body(self, tok):
        kind = tok[0]
        if kind == "start":
            name, attrs = tok[1], tok[2]
            if name == "tr":
                self._clear_to_table_body_context()
                self._insert_element(name, attrs)
                self.mode = IN_ROW
                return False
            if name in ("th", "td"):
                self._err("unexpected-cell-in-table-body")
                self._clear_to_table_body_context()
                self._insert_element("tr", {})
                self.mode = IN_ROW
                return True
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead"):
                if not self._in_table_scope({"tbody", "thead", "tfoot"}):
                    self._err("unexpected-start-tag-in-table-body")
                    return False
                self._clear_to_table_body_context()
                self.open.pop()
                self.mode = IN_TABLE
                return True
        if kind == "end":
            name = tok[1]
            if name in ("tbody", "tfoot", "thead"):
                if not self._in_table_scope(name):
                    self._err("unexpected-end-tag-in-table-body")
                    return False
                self._clear_to_table_body_context()
                self.open.pop()
                self.mode = IN_TABLE
                return False
            if name == "table":
                if not self._in_table_scope({"tbody", "thead", "tfoot"}):
                    self._err("unexpected-end-table-in-table-body")
                    return False
                self._clear_to_table_body_context()
                self.open.pop()
                self.mode = IN_TABLE
                return True
            if name in ("body", "caption", "col", "colgroup", "html", "td",
                        "th", "tr"):
                self._err("unexpected-end-tag-in-table-body")
                return False
        return self._mode_in_table(tok)

    def _mode_in_row(self, tok):
        kind = tok[0]
        if kind == "start":
            name, attrs = tok[1], tok[2]
            if name in ("th", "td"):
                self._clear_to_table_row_context()
                self._insert_element(name, attrs)
                self.mode = IN_CELL
                self.afe.append(MARKER)
                return False
            if name in ("caption", "col", "colgroup", "tbody", "tfoot",
                        "thead", "tr"):
                if not self._in_table_scope("tr"):
                    self._err("unexpected-start-tag-in-row")
                    return False
                self._clear_to_table_row_context()
                self.open.pop()
                self.mode = IN_TABLE_BODY
                return True
        if kind == "end":
            name = tok[1]
            if name == "tr":
                if not self._in_table_scope("tr"):
                    self._err("unexpected-end-tr")
                    return False
                self._clear_to_table_row_context()
                self.open.pop()
                self.mode = IN_TABLE_BODY
                return False
            if name == "table":
                if not self._in_table_scope("tr"):
                    self._err("unexpected-end-table-in-row")
                    return False
                self._clear_to_table_row_context()
                self.open.pop()
                self.mode = IN_TABLE_BODY
                return True
            if name in ("tbody", "tfoot", "thead"):
                if not self._in_table_scope(name):
                    self._err("unexpected-end-tag-in-row")
                    return False
                if not self._in_table_scope("tr"):
                    return False
                self._clear_to_table_row_context()
                self.open.pop()
                self.mode = IN_TABLE_BODY
                return True
            if name in ("body", "caption", "col", "colgroup", "html", "td",
                        "th"):
                self._err("unexpected-end-tag-in-row")
                return False
        return self._mode_in_table(tok)

    def _mode_in_cell(self, tok):
        kind = tok[0]
        if kind == "end":
            name = tok[1]
            if name in ("td", "th"):
                if not self._in_table_scope(name):
                    self._err("unexpected-end-cell")
                    return False
                self._generate_implied_end_tags()
                if self.current.tag != name:
                    self._err("unexpected-open-elements-end-cell")
                self._pop_until(name)
                self._clear_afe_to_marker()
                self.mode = IN_ROW
                return False
            if name in ("body", "caption", "col", "colgroup", "html"):
                self._err("unexpected-end-tag-in-cell")
                return False
            if name in ("table", "tbody", "tfoot", "thead", "tr"):
                if not self._in_table_scope(name):
                    self._err("unexpected-end-tag-in-cell")
                    return False
                self._close_cell()
                return True
        if kind == "start" and tok[1] in ("caption", "col", "colgroup", "tbody",
                                          "td", "tfoot", "th", "thead", "tr"):
            if not self._in_table_scope({"td", "th"}):
                self._err("unexpected-start-tag-in-cell")
                return False
            self._close_cell()
            return True
        return self._mode_in_body(tok)

    def _close_cell(self) -> None:
        self._generate_implied_end_tags()
        if self.current.tag not in ("td", "th"):
            self._err("unexpected-open-elements-close-cell")
        self._pop_until(("td", "th"))
        self._clear_afe_to_marker()
        self.mode = IN_ROW

    # --------------------------------------------------------- mode: select
    def _mode_in_select(self, tok):
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            if "\0" in data:
                self._err("unexpected-null-character")
                data = data.replace("\0", "")
            if data:
                self._insert_text(data)
            return False
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            name, attrs = tok[1], tok[2]
            if name == "html":
                return self._mode_in_body(tok)
            if name == "option":
                if self.current and self.current.tag == "option":
                    self.open.pop()
                self._insert_element(name, attrs)
                return False
            if name == "optgroup":
                if self.current and self.current.tag == "option":
                    self.open.pop()
                if self.current and self.current.tag == "optgroup":
                    self.open.pop()
                self._insert_element(name, attrs)
                return False
            if name == "hr":
                if self.current and self.current.tag == "option":
                    self.open.pop()
                if self.current and self.current.tag == "optgroup":
                    self.open.pop()
                self._insert_element(name, attrs, push=False)
                return False
            if name == "select":
                self._err("unexpected-select-in-select")
                if self._in_select_scope("select"):
                    self._pop_until("select")
                    self._reset_insertion_mode()
                return False
            if name in ("input", "keygen", "textarea"):
                self._err("unexpected-input-in-select")
                if not self._in_select_scope("select"):
                    return False
                self._pop_until("select")
                self._reset_insertion_mode()
                return True
            if name in ("script", "template"):
                return self._mode_in_head(tok)
        if kind == "end":
            name = tok[1]
            if name == "optgroup":
                if (self.current and self.current.tag == "option"
                        and len(self.open) >= 2
                        and self.open[-2].tag == "optgroup"):
                    self.open.pop()
                if self.current and self.current.tag == "optgroup":
                    self.open.pop()
                else:
                    self._err("unexpected-end-optgroup")
                return False
            if name == "option":
                if self.current and self.current.tag == "option":
                    self.open.pop()
                else:
                    self._err("unexpected-end-option")
                return False
            if name == "select":
                if not self._in_select_scope("select"):
                    self._err("unexpected-end-select")
                    return False
                self._pop_until("select")
                self._reset_insertion_mode()
                return False
            if name == "template":
                return self._end_template()
        if kind == "eof":
            return self._mode_in_body(tok)
        self._err("unexpected-token-in-select")
        return False

    def _mode_in_select_in_table(self, tok):
        kind = tok[0]
        tables = ("caption", "table", "tbody", "tfoot", "thead", "tr", "td",
                  "th")
        if kind == "start" and tok[1] in tables:
            self._err("unexpected-table-element-in-select")
            self._pop_until("select")
            self._reset_insertion_mode()
            return True
        if kind == "end" and tok[1] in tables:
            self._err("unexpected-table-end-tag-in-select")
            if not self._in_table_scope(tok[1]):
                return False
            self._pop_until("select")
            self._reset_insertion_mode()
            return True
        return self._mode_in_select(tok)

    # ------------------------------------------------------- mode: template
    def _mode_in_template(self, tok):
        kind = tok[0]
        if kind in ("chars", "comment", "doctype"):
            return self._mode_in_body(tok)
        if kind == "start":
            name = tok[1]
            if name in ("base", "basefont", "bgsound", "link", "meta",
                        "noframes", "script", "style", "template", "title"):
                return self._mode_in_head(tok)
            if name in ("caption", "colgroup", "tbody", "tfoot", "thead"):
                self._switch_template_mode(IN_TABLE)
                return True
            if name == "col":
                self._switch_template_mode(IN_COLUMN_GROUP)
                return True
            if name == "tr":
                self._switch_template_mode(IN_TABLE_BODY)
                return True
            if name in ("td", "th"):
                self._switch_template_mode(IN_ROW)
                return True
            self._switch_template_mode(IN_BODY)
            return True
        if kind == "end":
            if tok[1] == "template":
                return self._end_template()
            self._err("unexpected-end-tag-in-template")
            return False
        # EOF
        if not any(e.tag == "template" and e.namespace == HTML_NS
                   for e in self.open):
            self.stopped = True
            return False
        self._err("eof-in-template")
        self._pop_until("template")
        self._clear_afe_to_marker()
        if self.template_modes:
            self.template_modes.pop()
        self._reset_insertion_mode()
        return True

    def _switch_template_mode(self, mode: int) -> None:
        if self.template_modes:
            self.template_modes.pop()
        self.template_modes.append(mode)
        self.mode = mode

    # ---------------------------------------------------- mode: after body
    def _mode_after_body(self, tok):
        kind = tok[0]
        if kind == "chars":
            ws = tok[1]
            if not ws.strip("\t\n\x0c\r "):
                return self._mode_in_body(tok)
            i = 0
            while i < len(ws) and ws[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._mode_in_body(("chars", ws[:i]))
                tok = ("chars", ws[i:])
            self._err("unexpected-char-after-body")
            self.mode = IN_BODY
            return tok
        if kind == "comment":
            self.open[0].append_child(Comment(tok[1]))
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start" and tok[1] == "html":
            return self._mode_in_body(tok)
        if kind == "end" and tok[1] == "html":
            if self.fragment_context is not None:
                self._err("unexpected-end-html-in-fragment")
                return False
            self.mode = AFTER_AFTER_BODY
            return False
        if kind == "eof":
            self.stopped = True
            return False
        self._err("unexpected-token-after-body")
        self.mode = IN_BODY
        return True

    def _mode_after_after_body(self, tok):
        kind = tok[0]
        if kind == "comment":
            self.document.append_child(Comment(tok[1]))
            return False
        if kind == "doctype":
            return self._mode_in_body(tok)
        if kind == "chars":
            data = tok[1]
            if not data.strip("\t\n\x0c\r "):
                return self._mode_in_body(tok)
            i = 0
            while i < len(data) and data[i] in WHITESPACE_SET:
                i += 1
            if i:
                self._mode_in_body(("chars", data[:i]))
                tok = ("chars", data[i:])
            self._err("unexpected-char-after-after-body")
            self.mode = IN_BODY
            return tok
        if kind == "start" and tok[1] == "html":
            return self._mode_in_body(tok)
        if kind == "eof":
            self.stopped = True
            return False
        self._err("unexpected-token-after-after-body")
        self.mode = IN_BODY
        return True

    # ------------------------------------------------------ mode: frameset
    def _mode_in_frameset(self, tok):
        kind = tok[0]
        if kind == "chars":
            ws = "".join(c for c in tok[1] if c in WHITESPACE_SET)
            if ws:
                self._insert_text(ws)
            if ws != tok[1]:
                self._err("unexpected-char-in-frameset")
            return False
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            name = tok[1]
            if name == "html":
                return self._mode_in_body(tok)
            if name == "frameset":
                self._insert_element(name, tok[2])
                return False
            if name == "frame":
                self._insert_element(name, tok[2], push=False)
                return False
            if name == "noframes":
                return self._mode_in_head(tok)
        if kind == "end" and tok[1] == "frameset":
            if self.current and self.current.tag == "html":
                self._err("unexpected-end-frameset")
                return False
            self.open.pop()
            if (self.fragment_context is None and self.current
                    and self.current.tag != "frameset"):
                self.mode = AFTER_FRAMESET
            return False
        if kind == "eof":
            if not (self.current and self.current.tag == "html"):
                self._err("eof-in-frameset")
            self.stopped = True
            return False
        self._err("unexpected-token-in-frameset")
        return False

    def _mode_after_frameset(self, tok):
        kind = tok[0]
        if kind == "chars":
            ws = "".join(c for c in tok[1] if c in WHITESPACE_SET)
            if ws:
                self._insert_text(ws)
            if ws != tok[1]:
                self._err("unexpected-char-after-frameset")
            return False
        if kind == "comment":
            self._insert_comment(tok[1])
            return False
        if kind == "doctype":
            self._err("unexpected-doctype")
            return False
        if kind == "start":
            if tok[1] == "html":
                return self._mode_in_body(tok)
            if tok[1] == "noframes":
                return self._mode_in_head(tok)
        if kind == "end" and tok[1] == "html":
            self.mode = AFTER_AFTER_FRAMESET
            return False
        if kind == "eof":
            self.stopped = True
            return False
        self._err("unexpected-token-after-frameset")
        return False

    def _mode_after_after_frameset(self, tok):
        kind = tok[0]
        if kind == "comment":
            self.document.append_child(Comment(tok[1]))
            return False
        if kind == "doctype":
            return self._mode_in_body(tok)
        if kind == "chars":
            ws = "".join(c for c in tok[1] if c in WHITESPACE_SET)
            if ws:
                self._mode_in_body(("chars", ws))
            if ws != tok[1]:
                self._err("unexpected-char-after-after-frameset")
            return False
        if kind == "start":
            if tok[1] == "html":
                return self._mode_in_body(tok)
            if tok[1] == "noframes":
                return self._mode_in_head(tok)
        if kind == "eof":
            self.stopped = True
            return False
        self._err("unexpected-token-after-after-frameset")
        return False

    # ----------------------------------------------------- foreign content
    def _adjust_mathml_attrs(self, attrs: dict) -> None:
        if "definitionurl" in attrs:
            attrs["definitionURL"] = attrs.pop("definitionurl")

    def _adjust_svg_attrs(self, attrs: dict) -> dict:
        out = {}
        for k, v in attrs.items():
            out[C.SVG_ATTR_ADJUST.get(k, k)] = v
        return out

    def _process_foreign(self, tok) -> None:
        kind = tok[0]
        if kind == "chars":
            data = tok[1]
            if "\0" in data:
                self._err("unexpected-null-character")
                data = data.replace("\0", "�")
            self._insert_text(data)
            if self.frameset_ok and data.strip("\t\n\x0c\r "):
                self.frameset_ok = False
            return
        if kind == "comment":
            self._insert_comment(tok[1])
            return
        if kind == "doctype":
            self._err("unexpected-doctype")
            return
        if kind == "start":
            name, attrs, self_closing = tok[1], tok[2], tok[3]
            breakout = name in C.BREAKOUT or (
                name == "font" and any(a in attrs for a in ("color", "face",
                                                            "size")))
            if breakout:
                self._err("unexpected-html-element-in-foreign-content")
                while True:
                    cur = self.current
                    if (cur is None or cur.namespace == HTML_NS
                            or _is_mathml_text_ip(cur) or _is_html_ip(cur)):
                        break
                    if len(self.open) <= 1:
                        break  # fragment case: cannot pop the root
                    self.open.pop()
                # fragment case (spec): when the adjusted current node is
                # still foreign (the fragment context), breakout tags are
                # handled as any other start tag instead of reprocessing —
                # otherwise the dispatch would recurse forever
                acn = self._adjusted_current_node()
                if not (acn is not None and acn.namespace != HTML_NS
                        and not _is_mathml_text_ip(acn)
                        and not _is_html_ip(acn)):
                    self.process(tok)
                    return
                # fall through: ordinary foreign start tag
            acn = self._adjusted_current_node()
            ns = acn.namespace if acn is not None else HTML_NS
            if ns == SVG_NS:
                name = C.SVG_TAG_ADJUST.get(name, name)
                attrs = self._adjust_svg_attrs(attrs)
            elif ns == MATHML_NS:
                self._adjust_mathml_attrs(attrs)
            el = Element(name, attrs, ns)
            self._insert_node(el)
            if not self_closing:
                self.open.append(el)
            return
        if kind == "end":
            # Reference parity: end tags always use the generic ancestor
            # loop (Sources/HTMLParser.m:2447-2467). The reference predates
            # the WHATWG addition of </br> and </p> to the foreign-content
            # breakout rule, so e.g. <svg></p> creates an HTML p INSIDE the
            # svg rather than popping it first (pinned in conformance
            # batch 33).
            name = tok[1]
            node = self.current
            if node is not None and ascii_lower(node.tag) != name:
                self._err("unexpected-end-tag-in-foreign-content")
            for i in range(len(self.open) - 1, 0, -1):
                node = self.open[i]
                if ascii_lower(node.tag) == name:
                    while self.open[-1] is not node:
                        self.open.pop()
                    self.open.pop()
                    return
                if self.open[i - 1].namespace == HTML_NS:
                    break
            self._process_html(tok)
            return
        # EOF never routed here


_MODE_DISPATCH = {
    INITIAL: TreeBuilder._mode_initial,
    BEFORE_HTML: TreeBuilder._mode_before_html,
    BEFORE_HEAD: TreeBuilder._mode_before_head,
    IN_HEAD: TreeBuilder._mode_in_head,
    IN_HEAD_NOSCRIPT: TreeBuilder._mode_in_head_noscript,
    AFTER_HEAD: TreeBuilder._mode_after_head,
    IN_BODY: TreeBuilder._mode_in_body,
    TEXT: TreeBuilder._mode_text,
    IN_TABLE: TreeBuilder._mode_in_table,
    IN_CAPTION: TreeBuilder._mode_in_caption,
    IN_COLUMN_GROUP: TreeBuilder._mode_in_column_group,
    IN_TABLE_BODY: TreeBuilder._mode_in_table_body,
    IN_ROW: TreeBuilder._mode_in_row,
    IN_CELL: TreeBuilder._mode_in_cell,
    IN_SELECT: TreeBuilder._mode_in_select,
    IN_SELECT_IN_TABLE: TreeBuilder._mode_in_select_in_table,
    IN_TEMPLATE: TreeBuilder._mode_in_template,
    AFTER_BODY: TreeBuilder._mode_after_body,
    IN_FRAMESET: TreeBuilder._mode_in_frameset,
    AFTER_FRAMESET: TreeBuilder._mode_after_frameset,
    AFTER_AFTER_BODY: TreeBuilder._mode_after_after_body,
    AFTER_AFTER_FRAMESET: TreeBuilder._mode_after_after_frameset,
}


def _build_in_body_start_table():
    T = TreeBuilder
    table = {
        "html": T._s_html, "body": T._s_body, "frameset": T._s_frameset,
        "form": T._s_form, "li": T._s_li, "plaintext": T._s_plaintext,
        "button": T._s_button, "a": T._s_a, "nobr": T._s_nobr,
        "table": T._s_table, "input": T._s_input, "hr": T._s_hr,
        "image": T._s_image, "textarea": T._s_textarea, "xmp": T._s_xmp,
        "iframe": T._s_iframe, "noembed": T._s_noembed,
        "noscript": T._s_noscript, "select": T._s_select,
        "math": T._s_math, "svg": T._s_svg,
        "menu": T._s_menu, "menuitem": T._s_menuitem,
    }
    for t in ("base", "basefont", "bgsound", "link", "meta", "noframes",
              "script", "style", "template", "title"):
        table[t] = T._s_in_head
    for t in _BLOCK_OPENERS:
        table[t] = T._s_block
    for t in C.HEADINGS:
        table[t] = T._s_heading
    for t in ("pre", "listing"):
        table[t] = T._s_pre
    for t in ("dd", "dt"):
        table[t] = T._s_dd_dt
    for t in ("b", "big", "code", "em", "font", "i", "s", "small", "strike",
              "strong", "tt", "u"):
        table[t] = T._s_formatting
    for t in ("applet", "marquee", "object"):
        table[t] = T._s_applet
    for t in ("area", "br", "embed", "img", "keygen", "wbr"):
        table[t] = T._s_void
    for t in ("param", "source", "track"):
        table[t] = T._s_param
    for t in ("optgroup", "option"):
        table[t] = T._s_option
    for t in ("rb", "rtc"):
        table[t] = T._s_rb_rtc
    for t in ("rp", "rt"):
        table[t] = T._s_rp_rt
    for t in ("caption", "col", "colgroup", "frame", "head", "tbody", "td",
              "tfoot", "th", "thead", "tr"):
        table[t] = T._s_ignored
    return table


_IN_BODY_START = _build_in_body_start_table()
