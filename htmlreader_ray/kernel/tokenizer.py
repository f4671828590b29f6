"""WHATWG HTML5 tokenizer.

A from-scratch re-derivation of the spec's tokenization state machine with the
same external behavior as the reference's 69-state tokenizer
(/root/reference/Sources/HTMLTokenizer.m, state enum
Sources/HTMLTokenizerState.h:10-80), built for batch throughput:

- bulk jumps between interesting characters (``str.find`` over '<', '&', '-')
  instead of per-code-point dispatch — the Python analogue of the reference's
  ``consumeCharactersUpToFirstPassingTest`` fast path
  (Sources/HTMLTokenizer.m:83-89)
- tokens are plain tuples, never objects, so per-token overhead is tiny
- the tree builder drives the generator and may switch ``state`` /
  ``last_start_tag`` / ``adjusted_current_node_is_foreign`` between yields
  (mirrors the parser->tokenizer coupling in Sources/HTMLTokenizer.m:2337-2346)

Token shapes:
    ("chars", data)
    ("start", name, attrs_dict, self_closing)
    ("end", name)
    ("comment", data)
    ("doctype", name_or_None, public_or_None, system_or_None, force_quirks)
    ("eof",)

Parse errors are appended to ``self.errors`` (kept for conformance tests,
dropped in production pipelines — SURVEY.md §1.4).
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from .entities import consume_character_reference
from .strings import ASCII_ALPHA, input_stream_errors, preprocess_input

# States the tree builder can put the tokenizer into (plus internal ones).
DATA = 0
RCDATA = 1
RAWTEXT = 2
SCRIPT_DATA = 3
PLAINTEXT = 4

_WS = "\t\n\x0c "

# Spec case folding is ASCII-only (A-Z -> a-z). Python's str.lower() is
# Unicode-wide ('À'→'à', 'İ'→'i̇' — the latter even changes length), which
# diverges from the reference's ASCII fold (Sources/HTMLTokenizer.m:193-201)
# on non-ASCII tag/attribute names. Every fold of user-supplied name text
# must go through this table.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")


def ascii_lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)

_TAG_NAME_RE = re.compile(r"[^\t\n\x0c />]+")
_ATTR_NAME_RE = re.compile(r"[^\t\n\x0c /=>]+")

# Fast path: one regex consumes an entire "simple" tag — ASCII name, plain
# attributes, no character references / NULs / stray quotes — which is the
# overwhelming majority of real-world tags. Anything else falls back to the
# spec state machine. Mirrors the reference's bulk-consume fast-path idea
# (Sources/HTMLTokenizer.m:83-89) one level higher.
_FAST_START_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:[\t\n\x0c ]+[^\t\n\x0c /><=\"'\0][^\t\n\x0c /><=\"'\0]*"
    r"(?:=(?:\"[^\"&<\0]*\"|'[^'&<\0]*'|[^\t\n\x0c >\"'<=`&\0]+))?)*)"
    r"[\t\n\x0c ]*(/?)>")
_FAST_ATTR_RE = re.compile(
    r"([^\t\n\x0c /><=\"']+)"
    r"(?:=(?:\"([^\"]*)\"|'([^']*)'|([^\t\n\x0c >]+)))?")
_FAST_END_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9-]*)[\t\n\x0c ]*>")
_UNQUOTED_VALUE_RE = re.compile(r"[^\t\n\x0c >&\0]+")
_BOGUS_RE = re.compile(r"[^>]*")

Token = tuple

# Optional C accelerator for the data state (see _ctokenizer.c): returns
# batches of ready tokens and hands control back to this state machine at
# anything outside its conservative subset or at a start tag that may make
# the tree builder switch tokenizer state.
try:
    from . import _ctok_loader as _loader
    _CSCAN = _loader.load()
except Exception:  # pragma: no cover - loader never raises by contract
    _CSCAN = None

# start tags after which the tree builder may switch the tokenizer out of
# the data state (generic RCDATA/RAWTEXT/script/plaintext algorithms)
_PAUSE_TAGS = frozenset(
    ["title", "textarea", "style", "script", "xmp", "iframe", "noembed",
     "noframes", "plaintext", "noscript"])


def _entity_cb(s: str, pos: int):
    return consume_character_reference(s, pos, in_attribute=False)


class Tokenizer:
    def __init__(self, text: str, *, initial_state: int = DATA,
                 last_start_tag: Optional[str] = None,
                 collect_errors: bool = True) -> None:
        self.s = preprocess_input(text)
        self.n = len(self.s)
        self.pos = 0
        self.state = initial_state
        self.last_start_tag = last_start_tag
        # set by the tree builder: whether the adjusted current node is in
        # foreign content (enables CDATA sections).
        self.adjusted_current_node_is_foreign = False
        self.errors: list[str] = []
        self._collect_errors = collect_errors
        if collect_errors:
            self.errors.extend(input_stream_errors(self.s))
        # bound entity callback for the C scanner so character-reference
        # parse errors land in self.errors even on the fast path
        if collect_errors:
            def _cb(s: str, pos: int, _err=self._err):
                return consume_character_reference(
                    s, pos, in_attribute=False, on_error=_err)
            self._entity_cb = _cb
        else:
            self._entity_cb = _entity_cb

    # ------------------------------------------------------------------ util
    def _err(self, code: str) -> None:
        if self._collect_errors:
            self.errors.append(code)

    # ------------------------------------------------------------------ main
    def tokens(self) -> Iterator[Token]:
        """Yield tokens until EOF. The consumer may mutate ``state`` etc.
        between yields; each yield happens before the next char is consumed."""
        cscan = _CSCAN
        while True:
            st = self.state
            if st == DATA:
                if cscan is not None and self.pos < self.n:
                    toks, new_pos, reason = cscan.scan(
                        self.s, self.pos, _PAUSE_TAGS, self._entity_cb)
                    self.pos = new_pos
                    for t in toks:
                        if t[0] == "start":
                            self.last_start_tag = t[1]
                        yield t
                    if reason == 0:  # clean EOF
                        yield ("eof",)
                        return
                    if reason == 2:  # pause tag: consumer may switch state
                        continue
                    # reason == 1: complex construct at self.pos — run one
                    # step of the pure-Python machine, then resume C
                    if self.pos >= self.n:
                        yield ("eof",)
                        return
                tok = self._data_token()
            elif st == RCDATA:
                tok = self._rcdata_token()
            elif st == RAWTEXT:
                tok = self._rawtext_token()
            elif st == SCRIPT_DATA:
                tok = self._script_data_token()
            else:  # PLAINTEXT
                tok = self._plaintext_token()
            if isinstance(tok, list):
                for t in tok:
                    yield t
                    if t[0] == "eof":
                        return
            elif tok is not None:
                yield tok
                if tok[0] == "eof":
                    return

    # ------------------------------------------------------------ data state
    def _data_token(self):
        s, n = self.s, self.n
        pos = self.pos
        if pos >= n:
            return ("eof",)
        # bulk-scan plain text up to the next '<' or '&'
        buf: list[str] = []
        lt = -1   # first '<' at/after pos; -1 = unknown (cache: charrefs
        #           never contain '<', so it stays valid across them)
        while pos < n:
            c = s[pos]
            if c == "<":
                if buf:
                    self.pos = pos
                    return ("chars", "".join(buf))
                return self._tag_open(pos)
            if c == "&":
                decoded, pos = consume_character_reference(
                    s, pos, in_attribute=False, on_error=self._err)
                buf.append(decoded)
                continue
            # find run end; the '&' scan is BOUNDED by the next '<' and
            # the '<' scan is cached — an unbounded or recomputed find
            # rescanned the rest of the text per token/charref (O(n^2)
            # on large amp-free or entity-dense docs)
            if lt < pos:
                lt = s.find("<", pos)
                if lt == -1:
                    lt = n
            amp = s.find("&", pos, lt)
            end = lt if amp == -1 else amp
            chunk = s[pos:end]
            if "\0" in chunk:
                # data state: NUL is a parse error but is EMITTED as-is
                # (the tree stage filters it; spec data-state NUL branch)
                for _ in range(chunk.count("\0")):
                    self._err("unexpected-null-character")
            buf.append(chunk)
            pos = end
        self.pos = pos
        if buf:
            return ("chars", "".join(buf))
        return ("eof",)

    # -------------------------------------------------------------- tag open
    def _tag_open(self, pos: int):
        """``self.s[pos] == '<'`` in data state."""
        s, n = self.s, self.n
        i = pos + 1
        if i >= n:
            self._err("eof-before-tag-name")
            self.pos = n
            return [("chars", "<"), ("eof",)]
        c = s[i]
        if c == "!":
            return self._markup_declaration_open(i + 1)
        if c == "/":
            j = i + 1
            if j >= n:
                self._err("eof-before-tag-name")
                self.pos = n
                return [("chars", "</"), ("eof",)]
            cj = s[j]
            if cj in ASCII_ALPHA:
                m = _FAST_END_RE.match(s, j)
                if m is not None:
                    self.pos = m.end()
                    return ("end", m.group(1).lower())
                return self._consume_tag(j, is_end=True)
            if cj == ">":
                self._err("missing-end-tag-name")
                self.pos = j + 1
                return None
            self._err("invalid-first-character-of-tag-name")
            return self._bogus_comment(j)
        if c in ASCII_ALPHA:
            m = _FAST_START_RE.match(s, i)
            if m is not None:
                name = m.group(1)
                name = name.lower()
                attrs: dict = {}
                blob = m.group(2)
                if blob:
                    for am in _FAST_ATTR_RE.finditer(blob):
                        aname = ascii_lower(am.group(1))
                        if aname not in attrs:
                            li = am.lastindex
                            attrs[aname] = am.group(li) if li > 1 else ""
                        else:
                            self._err("duplicate-attribute")
                self.pos = m.end()
                self.last_start_tag = name
                return ("start", name, attrs, m.group(3) == "/")
            return self._consume_tag(i, is_end=False)
        if c == "?":
            self._err("unexpected-question-mark-instead-of-tag-name")
            return self._bogus_comment(i)
        self._err("invalid-first-character-of-tag-name")
        self.pos = i
        return ("chars", "<")

    # ------------------------------------------------------------- tags
    def _consume_tag(self, name_start: int, *, is_end: bool):
        """Parse tag name + attributes + self-closing flag starting at the
        first name character. Returns the tag token (or EOF handling)."""
        s, n = self.s, self.n
        m = _TAG_NAME_RE.match(s, name_start)
        # the first char is alpha so the match is non-empty
        name = ascii_lower(m.group())
        if "\0" in name:
            self._err("unexpected-null-character")
            name = name.replace("\0", "�")
        pos = m.end()
        attrs: dict[str, str] = {}
        self_closing = False
        while True:
            if pos >= n:
                self._err("eof-in-tag")
                self.pos = n
                return ("eof",)
            c = s[pos]
            if c in _WS:
                pos += 1
                continue
            if c == "/":
                if pos + 1 < n and s[pos + 1] == ">":
                    self_closing = True
                    pos += 2
                    break
                self._err("unexpected-solidus-in-tag")
                pos += 1
                continue
            if c == ">":
                pos += 1
                break
            # attribute
            pos = self._consume_attribute(pos, attrs)
            if pos < 0:
                self._err("eof-in-tag")
                self.pos = n
                return ("eof",)
        self.pos = pos
        if is_end:
            if attrs:
                self._err("end-tag-with-attributes")
            if self_closing:
                self._err("end-tag-with-trailing-solidus")
            return ("end", name)
        self.last_start_tag = name
        return ("start", name, attrs, self_closing)

    def _consume_attribute(self, pos: int, attrs: dict) -> int:
        """Parse one attribute starting at ``pos`` (a non-ws, non-'>', non-'/'
        char). Returns the new position, or -1 on EOF."""
        s, n = self.s, self.n
        c = s[pos]
        if c == "=":
            self._err("unexpected-equals-sign-before-attribute-name")
            # '=' begins the name per spec
            m = _ATTR_NAME_RE.match(s, pos + 1)
            name = "=" + (m.group() if m else "")
            pos = m.end() if m else pos + 1
        else:
            m = _ATTR_NAME_RE.match(s, pos)
            if m is None:
                return pos + 1  # defensive; caller loop handles
            name = m.group()
            pos = m.end()
        # attribute-name state: every '"', "'" or '<' in the name is its own
        # unexpected-character-in-attribute-name error (the chars stay in the
        # name)
        if self._collect_errors:
            bad = name.count('"') + name.count("'") + name.count("<")
            for _ in range(bad):
                self._err("unexpected-character-in-attribute-name")
        name = ascii_lower(name).replace("\0", "�")
        # after attribute name: skip ws
        while pos < n and s[pos] in _WS:
            pos += 1
        if pos >= n:
            return -1
        value = ""
        if s[pos] == "=":
            pos += 1
            while pos < n and s[pos] in _WS:
                pos += 1
            if pos >= n:
                return -1
            q = s[pos]
            if q == '"' or q == "'":
                pos += 1
                value, pos = self._consume_quoted_value(pos, q)
                if pos < 0:
                    return -1
                # after quoted value: must be ws, '/', or '>'
                if pos < n and s[pos] not in "\t\n\x0c />":
                    self._err("missing-whitespace-between-attributes")
            elif q == ">":
                self._err("missing-attribute-value")
                # leave pos at '>' for caller
            else:
                value, pos = self._consume_unquoted_value(pos)
                if pos < 0:
                    return -1
        if name in attrs:
            self._err("duplicate-attribute")
        else:
            attrs[name] = value
        return pos

    def _consume_quoted_value(self, pos: int, quote: str):
        s, n = self.s, self.n
        buf: list[str] = []
        qi = -2   # closing-quote cache; -2 = unknown (charrefs never
        #           span the quote, so it stays valid across them)
        while True:
            if pos >= n:
                return "", -1
            if qi < pos and qi != -1:
                qi = s.find(quote, pos)
            stop = qi if qi != -1 else n
            # '&' bounded by the closing quote (charrefs never span it);
            # unbounded/recomputed, this was O(n^2) per long quoted value
            amp = s.find("&", pos, stop)
            if amp != -1:
                chunk = s[pos:amp]
                if "\0" in chunk:
                    self._err("unexpected-null-character")
                    chunk = chunk.replace("\0", "�")
                buf.append(chunk)
                decoded, pos = consume_character_reference(
                    s, amp, in_attribute=True, additional_allowed=quote,
                    on_error=self._err)
                buf.append(decoded)
                continue
            if qi == -1:
                return "", -1
            chunk = s[pos:qi]
            if "\0" in chunk:
                self._err("unexpected-null-character")
                chunk = chunk.replace("\0", "�")
            buf.append(chunk)
            return "".join(buf), qi + 1

    def _consume_unquoted_value(self, pos: int):
        s, n = self.s, self.n
        buf: list[str] = []
        while pos < n:
            c = s[pos]
            if c in "\t\n\x0c >":
                break
            if c == "&":
                decoded, pos = consume_character_reference(
                    s, pos, in_attribute=True, additional_allowed=">",
                    on_error=self._err)
                buf.append(decoded)
                continue
            if c == "\0":
                self._err("unexpected-null-character")
                buf.append("�")
                pos += 1
                continue
            m = _UNQUOTED_VALUE_RE.match(s, pos)
            if m:
                chunk = m.group()
                # the bulk regex deliberately swallows " ' < = ` (they are
                # VALID value content, just parse errors) — report each
                for ch in "\"'<=`":
                    for _ in range(chunk.count(ch)):
                        self._err(
                            "unexpected-character-in-unquoted-attribute-value")
                buf.append(chunk)
                pos = m.end()
            else:
                buf.append(c)
                pos += 1
        if pos >= n:
            # EOF terminates the tag (eof-in-tag handled by caller)
            return "".join(buf), -1
        return "".join(buf), pos

    # ------------------------------------------------- markup declaration
    def _markup_declaration_open(self, pos: int):
        s, n = self.s, self.n
        if s.startswith("--", pos):
            return self._comment(pos + 2)
        if s[pos:pos + 7].upper() == "DOCTYPE":
            return self._doctype(pos + 7)
        if s.startswith("[CDATA[", pos):
            if self.adjusted_current_node_is_foreign:
                return self._cdata_section(pos + 7)
            self._err("cdata-in-html-content")
            # bogus comment whose data is "[CDATA[..."
            return self._bogus_comment(pos)
        self._err("incorrectly-opened-comment")
        return self._bogus_comment(pos)

    def _bogus_comment(self, pos: int):
        s, n = self.s, self.n
        m = _BOGUS_RE.match(s, pos)
        data = m.group().replace("\0", "�")
        end = m.end()
        self.pos = end + 1 if end < n else n
        return ("comment", data)

    def _comment(self, pos: int):
        """Comment state machinery, entered just after '<!--'."""
        s, n = self.s, self.n
        buf: list[str] = []
        # comment start state
        if pos < n and s[pos] == ">":
            self._err("abrupt-closing-of-empty-comment")
            self.pos = pos + 1
            return ("comment", "")
        if s.startswith("->", pos):
            self._err("abrupt-closing-of-empty-comment")
            self.pos = pos + 2
            return ("comment", "")
        while True:
            if pos >= n:
                self._err("eof-in-comment")
                self.pos = n
                return [("comment", "".join(buf)), ("eof",)]
            dash = s.find("-", pos)
            if dash == -1:
                chunk = s[pos:].replace("\0", "�")
                buf.append(chunk)
                self._err("eof-in-comment")
                self.pos = n
                return [("comment", "".join(buf)), ("eof",)]
            chunk = s[pos:dash]
            if "\0" in chunk:
                self._err("unexpected-null-character")
                chunk = chunk.replace("\0", "�")
            buf.append(chunk)
            # count dash run
            run_end = dash
            while run_end < n and s[run_end] == "-":
                run_end += 1
            run = run_end - dash
            # comment-less-than-sign-bang-dash-dash state: "<!" consumed as
            # data followed by two dashes, and the next char is not ">" (and
            # not EOF, where eof-in-comment fires instead) -> nested-comment
            if (run >= 2 and s[dash - 2:dash] == "<!" and dash + 2 < n
                    and s[dash + 2] != ">"):
                self._err("nested-comment")
            if run_end >= n:
                # EOF during dashes: the first two are consumed by the
                # comment-end-dash/comment-end states without appending;
                # only extras were appended (comment end state, '-')
                self._err("eof-in-comment")
                buf.append("-" * max(0, run - 2))
                self.pos = n
                return [("comment", "".join(buf)), ("eof",)]
            nxt = s[run_end]
            if run >= 2 and nxt == ">":
                buf.append("-" * (run - 2))
                self.pos = run_end + 1
                return ("comment", "".join(buf))
            if run >= 2 and nxt == "!":
                if run_end + 1 < n and s[run_end + 1] == ">":
                    self._err("incorrectly-closed-comment")
                    buf.append("-" * (run - 2))
                    self.pos = run_end + 2
                    return ("comment", "".join(buf))
                if run_end + 1 >= n:
                    # EOF in comment-end-bang: neither the two dashes nor
                    # the bang reach the data
                    self._err("eof-in-comment")
                    buf.append("-" * (run - 2))
                    self.pos = n
                    return [("comment", "".join(buf)), ("eof",)]
                # "--!" then ordinary char: append "--!" per comment-end-bang
                buf.append("-" * (run - 2) + "--!")
                pos = run_end + 1
                continue
            # dash run not followed by close: dashes are data
            buf.append("-" * run)
            pos = run_end
        # unreachable

    def _cdata_section(self, pos: int):
        s, n = self.s, self.n
        end = s.find("]]>", pos)
        if end == -1:
            self._err("eof-in-cdata")
            data = s[pos:]
            self.pos = n
            if data:
                return [("chars", data), ("eof",)]
            return ("eof",)
        self.pos = end + 3
        data = s[pos:end]
        if data:
            return ("chars", data)
        return None

    # ------------------------------------------------------------- doctype
    def _doctype(self, pos: int):
        s, n = self.s, self.n
        name: Optional[str] = None
        public: Optional[str] = None
        system: Optional[str] = None
        force_quirks = False

        def skip_ws(p: int) -> int:
            while p < n and s[p] in _WS:
                p += 1
            return p

        if pos < n and s[pos] not in _WS and s[pos] != ">":
            self._err("missing-whitespace-before-doctype-name")
        pos = skip_ws(pos)
        if pos >= n:
            self._err("eof-in-doctype")
            self.pos = n
            return [("doctype", None, None, None, True), ("eof",)]
        if s[pos] == ">":
            self._err("missing-doctype-name")
            self.pos = pos + 1
            return ("doctype", None, None, None, True)
        # doctype name
        start = pos
        while pos < n and s[pos] not in _WS and s[pos] != ">":
            pos += 1
        name = ascii_lower(s[start:pos]).replace("\0", "�")
        if pos >= n:
            self._err("eof-in-doctype")
            self.pos = n
            return [("doctype", name, None, None, True), ("eof",)]
        pos = skip_ws(pos)
        if pos < n and s[pos] == ">":
            self.pos = pos + 1
            return ("doctype", name, None, None, False)
        if pos >= n:
            self._err("eof-in-doctype")
            self.pos = n
            return [("doctype", name, None, None, True), ("eof",)]
        kw = s[pos:pos + 6].upper()
        if kw == "PUBLIC":
            pos += 6
            public, system, force_quirks, pos, eof = self._doctype_ids(pos, expect_public=True)
        elif kw == "SYSTEM":
            pos += 6
            _pub, system, force_quirks, pos, eof = self._doctype_ids(pos, expect_public=False)
        else:
            self._err("invalid-character-sequence-after-doctype-name")
            force_quirks = True
            pos, eof = self._bogus_doctype(pos)
        if eof:
            self._err("eof-in-doctype")
            self.pos = n
            return [("doctype", name, public, system, True), ("eof",)]
        self.pos = pos
        return ("doctype", name, public, system, force_quirks)

    def _doctype_ids(self, pos: int, *, expect_public: bool):
        """Parse PUBLIC/SYSTEM identifier section. Returns
        (public, system, force_quirks, pos, eof)."""
        s, n = self.s, self.n
        public: Optional[str] = None
        system: Optional[str] = None

        def skip_ws(p: int) -> int:
            while p < n and s[p] in _WS:
                p += 1
            return p

        def quoted(p: int, which: str):
            q = s[p]
            endq = s.find(q, p + 1)
            gt = s.find(">", p + 1)
            # '>' before the closing quote (or before EOF when the quote
            # never closes) aborts the doctype: spec's
            # abrupt-doctype-public/system-identifier branch
            if gt != -1 and (endq == -1 or gt < endq):
                self._err(f"abrupt-doctype-{which}-identifier")
                return s[p + 1:gt].replace("\0", "�"), gt + 1, False, True
            if endq == -1:
                return s[p + 1:].replace("\0", "�"), n, True, False
            return s[p + 1:endq].replace("\0", "�"), endq + 1, False, False

        if expect_public:
            # spec after-doctype-public-keyword: the missing-whitespace error
            # fires only when an identifier quote follows directly; '>' and
            # other chars report their own errors below
            if pos < n and s[pos] in "\"'":
                self._err("missing-whitespace-after-doctype-public-keyword")
            pos = skip_ws(pos)
            if pos >= n:
                return public, system, True, n, True
            if s[pos] == ">":
                self._err("missing-doctype-public-identifier")
                return public, system, True, pos + 1, False
            if s[pos] not in "\"'":
                self._err("missing-quote-before-doctype-public-identifier")
                p2, eof = self._bogus_doctype(pos)
                return public, system, True, p2, eof
            public, pos, eof, closed = quoted(pos, "public")
            if eof:
                return public, system, True, n, True
            if closed:
                return public, system, True, pos, False
            pos2 = skip_ws(pos)
            if pos2 >= n:
                return public, system, True, n, True
            if s[pos2] == ">":
                return public, system, False, pos2 + 1, False
            if s[pos2] in "\"'":
                if pos2 == pos:
                    self._err("missing-whitespace-between-doctype-public-and-system-identifiers")
                system, pos3, eof, closed = quoted(pos2, "system")
                if eof:
                    return public, system, True, n, True
                if closed:
                    return public, system, True, pos3, False
                pos3 = skip_ws(pos3)
                if pos3 >= n:
                    return public, system, True, n, True
                if s[pos3] == ">":
                    return public, system, False, pos3 + 1, False
                self._err("unexpected-character-after-doctype-system-identifier")
                p4, eof = self._bogus_doctype(pos3)
                return public, system, False, p4, eof
            self._err("missing-quote-before-doctype-system-identifier")
            p4, eof = self._bogus_doctype(pos2)
            return public, system, True, p4, eof
        else:
            if pos < n and s[pos] in "\"'":
                self._err("missing-whitespace-after-doctype-system-keyword")
            pos = skip_ws(pos)
            if pos >= n:
                return public, system, True, n, True
            if s[pos] == ">":
                self._err("missing-doctype-system-identifier")
                return public, system, True, pos + 1, False
            if s[pos] not in "\"'":
                self._err("missing-quote-before-doctype-system-identifier")
                p2, eof = self._bogus_doctype(pos)
                return public, system, True, p2, eof
            system, pos, eof, closed = quoted(pos, "system")
            if eof:
                return public, system, True, n, True
            if closed:
                return public, system, True, pos, False
            pos = skip_ws(pos)
            if pos >= n:
                return public, system, True, n, True
            if s[pos] == ">":
                return public, system, False, pos + 1, False
            self._err("unexpected-character-after-doctype-system-identifier")
            p4, eof = self._bogus_doctype(pos)
            return public, system, False, p4, eof

    def _bogus_doctype(self, pos: int):
        gt = self.s.find(">", pos)
        if gt == -1:
            return self.n, True
        return gt + 1, False

    # --------------------------------------------------- RCDATA / RAWTEXT
    def _rcdata_token(self):
        return self._rawtext_like(char_refs=True)

    def _rawtext_token(self):
        return self._rawtext_like(char_refs=False)

    def _rawtext_like(self, *, char_refs: bool):
        """RCDATA / RAWTEXT: text until an appropriate end tag ``</name``."""
        s, n = self.s, self.n
        pos = self.pos
        if pos >= n:
            return ("eof",)
        buf: list[str] = []
        lt_cache = -1   # first '<' at/after pos; n = none; -1 = unknown
        #                 (cached across charref iterations, see the
        #                 data-state O(n^2) note)
        while pos < n:
            if lt_cache < pos:
                f = s.find("<", pos)
                lt_cache = f if f != -1 else n
            lt = lt_cache if lt_cache < n else -1
            stop = lt if lt != -1 else n
            if char_refs:
                # bounded by stop: see the data-state O(n^2) note
                amp = s.find("&", pos, stop)
                if amp != -1:
                    chunk = s[pos:amp]
                    if "\0" in chunk:
                        self._err("unexpected-null-character")
                        chunk = chunk.replace("\0", "�")
                    buf.append(chunk)
                    decoded, pos = consume_character_reference(
                        s, amp, in_attribute=False, on_error=self._err)
                    buf.append(decoded)
                    continue
            chunk = s[pos:stop]
            if "\0" in chunk:
                self._err("unexpected-null-character")
                chunk = chunk.replace("\0", "�")
            buf.append(chunk)
            pos = stop
            if lt == -1:
                break
            # at '<': appropriate end tag?
            if self._is_appropriate_end_tag_at(lt):
                if buf and "".join(buf):
                    self.pos = lt
                    return ("chars", "".join(buf))
                self.state = DATA
                return self._consume_tag(lt + 2, is_end=True)
            buf.append("<")
            pos = lt + 1
        self.pos = pos
        data = "".join(buf)
        if data:
            return ("chars", data)
        return ("eof",)

    def _is_appropriate_end_tag_at(self, lt: int) -> bool:
        """True if ``self.s[lt:]`` starts an appropriate end tag ``</last``
        followed by ws / '/' / '>'."""
        s, n = self.s, self.n
        last = self.last_start_tag
        if not last:
            return False
        i = lt + 1
        if i >= n or s[i] != "/":
            return False
        j = i + 1
        end = j + len(last)
        if ascii_lower(s[j:end]) != last:
            return False
        if end >= n:
            return False
        return s[end] in "\t\n\x0c />"

    # --------------------------------------------------------- PLAINTEXT
    def _plaintext_token(self):
        s, n = self.s, self.n
        pos = self.pos
        if pos >= n:
            return ("eof",)
        data = s[pos:]
        if "\0" in data:
            self._err("unexpected-null-character")
            data = data.replace("\0", "�")
        self.pos = n
        return ("chars", data)

    # -------------------------------------------------------- script data
    def _script_data_token(self):
        """Script data incl. escaped / double-escaped states
        (reference: Sources/HTMLTokenizer.m:727-889)."""
        s, n = self.s, self.n
        pos = self.pos
        if pos >= n:
            return ("eof",)
        buf: list[str] = []
        escaped = False          # inside <!-- ... -->
        double_escaped = False   # inside <script> within escaped

        def flush_and_return_chars(p):
            self.pos = p
            data = "".join(buf)
            if "\0" in data:
                self._err("unexpected-null-character")
                data = data.replace("\0", "�")
            return ("chars", data) if data else None

        while pos < n:
            c = s[pos]
            if c == "<":
                nxt = s[pos + 1] if pos + 1 < n else ""
                if not escaped:
                    if self._is_appropriate_end_tag_at(pos):
                        if "".join(buf):
                            return flush_and_return_chars(pos)
                        self.state = DATA
                        return self._consume_tag(pos + 2, is_end=True)
                    if s.startswith("<!--", pos):
                        escaped = True
                        buf.append("<!--")
                        pos += 4
                        continue
                    buf.append("<")
                    pos += 1
                    continue
                else:
                    # escaped (or double-escaped)
                    if not double_escaped:
                        if self._is_appropriate_end_tag_at(pos):
                            if "".join(buf):
                                return flush_and_return_chars(pos)
                            self.state = DATA
                            return self._consume_tag(pos + 2, is_end=True)
                        # <script... => double escape start
                        if nxt and ascii_lower(s[pos + 1:pos + 7]) == "script":
                            after = pos + 7
                            if after < n and s[after] in "\t\n\x0c />":
                                double_escaped = True
                                buf.append(s[pos:after + 1])
                                pos = after + 1
                                continue
                            elif after >= n:
                                buf.append(s[pos:])
                                pos = n
                                continue
                        buf.append("<")
                        pos += 1
                        continue
                    else:
                        # double-escaped: '</script' ends double-escape
                        if s[pos + 1:pos + 2] == "/" and ascii_lower(s[pos + 2:pos + 8]) == "script":
                            after = pos + 8
                            if after < n and s[after] in "\t\n\x0c />":
                                double_escaped = False
                                buf.append(s[pos:after + 1])
                                pos = after + 1
                                continue
                        buf.append("<")
                        pos += 1
                        continue
            if c == "-" and escaped:
                if s.startswith("-->", pos):
                    escaped = False
                    double_escaped = False
                    buf.append("-->")
                    pos += 3
                    continue
                buf.append("-")
                pos += 1
                continue
            # bulk scan to next interesting char; '-' bounded by the next
            # '<' (see the data-state O(n^2) note)
            lt = s.find("<", pos)
            interesting = lt if lt != -1 else n
            if escaped:
                dash = s.find("-", pos, interesting)
                if dash != -1:
                    interesting = dash
            if interesting == pos:
                buf.append(c)
                pos += 1
            else:
                buf.append(s[pos:interesting])
                pos = interesting
        if "".join(buf):
            if pos >= n and escaped:
                self._err("eof-in-script-html-comment-like-text")
            return flush_and_return_chars(pos)
        self.pos = pos
        return ("eof",)
