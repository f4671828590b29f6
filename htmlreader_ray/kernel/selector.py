"""CSS Selectors Level 3 engine.

From-scratch re-derivation of the reference's selector engine semantics
(/root/reference/Sources/HTMLSelector.m): a selector string compiles ONCE
into a Python predicate closure (HTMLSelector.m:854-894); matching is a
linear scan of the subtree in tree order applying the predicate
(HTMLSelector.m:925-952). Supported surface per SURVEY.md §2.3:
type/universal, all four combinators + groups, attribute operators
([a] = ~= ^= $= *= |=), class/id, the structural pseudo-class family with
an+b, the state pseudo-classes with the WHATWG disabled cascade
(HTMLSelector.m:318-396), and :not(<any selector>). :target/:lang()/:dir()
and pseudo-elements are unsupported exactly like the reference
(Sources/include/HTMLSelector.h:13-19).

Compiled selectors should be cached per worker/actor (the reference's own
guidance, Sources/include/HTMLSelector.h:20-28); see stages/ for actor-pool
usage.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional

from .dom import Document, Element, Node

Predicate = Callable[[Element], bool]


class SelectorError(ValueError):
    """Raised on malformed selectors, with caret rendering like the
    reference's positional NSError (HTMLSelector.m:18-41)."""

    def __init__(self, source: str, pos: int, message: str) -> None:
        caret = " " * pos + "^"
        super().__init__(f"{message}\n{source}\n{caret}")
        self.source = source
        self.pos = pos
        self.reason = message


# ----------------------------------------------------------------- scanning

_HEX = "0123456789abcdefABCDEF"
_IDENT_START = re.compile(r"[a-zA-Z_ -￿]|\\|-")


def _scan_ident(s: str, pos: int) -> tuple[str, int]:
    """CSS identifier with escape handling (reference: scanner + CSS escapes,
    HTMLSelector.m:539-653)."""
    out: list[str] = []
    n = len(s)
    start = pos
    while pos < n:
        c = s[pos]
        if c == "\\":
            pos += 1
            if pos >= n:
                out.append("�")
                break
            if s[pos] in _HEX:
                hex_start = pos
                while pos < n and pos - hex_start < 6 and s[pos] in _HEX:
                    pos += 1
                cp = int(s[hex_start:pos], 16)
                if pos < n and s[pos] in "\t\n\x0c\r ":
                    pos += 1
                if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                    out.append("�")
                else:
                    out.append(chr(cp))
            elif s[pos] == "\n":
                break  # invalid escape
            else:
                out.append(s[pos])
                pos += 1
        elif c.isalnum() or c in "-_" or ord(c) >= 0xA0:
            out.append(c)
            pos += 1
        else:
            break
    return "".join(out), pos


def _skip_ws(s: str, pos: int) -> int:
    n = len(s)
    while pos < n and s[pos] in "\t\n\x0c\r ":
        pos += 1
    return pos


# ------------------------------------------------------------ an+b parsing

_ANB_RE = re.compile(
    r"^(?:(odd)|(even)|"
    r"(?:([+-]?\d*)(n)(?:([+-])(\d+))?)|"
    r"([+-]?\d+))$",
    re.IGNORECASE,
)


def parse_nth(expr: str) -> tuple[int, int]:
    """Parse an an+b expression -> (a, b)
    (reference: parseNth, HTMLSelector.m:966-1005). Whitespace is
    insignificant anywhere in the expression."""
    m = _ANB_RE.match(re.sub(r"\s+", "", expr))
    if m is None:
        raise ValueError(f"bad an+b expression: {expr!r}")
    if m.group(1):  # odd
        return 2, 1
    if m.group(2):  # even
        return 2, 0
    if m.group(4):  # has 'n'
        coef = m.group(3)
        if coef in ("", "+"):
            a = 1
        elif coef == "-":
            a = -1
        else:
            a = int(coef)
        b = 0
        if m.group(5):
            b = int(m.group(6))
            if m.group(5) == "-":
                b = -b
        return a, b
    return 0, int(m.group(7))


def _nth_matches(a: int, b: int, index: int) -> bool:
    """True if index (1-based) is in the set {an+b : n >= 0}."""
    if a == 0:
        return index == b
    delta = index - b
    if a > 0:
        return delta >= 0 and delta % a == 0
    return delta <= 0 and delta % a == 0


# ------------------------------------------------------------- predicates

def _parent_element(el: Element) -> Optional[Element]:
    p = el.parent
    return p if isinstance(p, Element) else None


def _child_index(el: Element, *, of_type: bool, from_end: bool) -> Optional[int]:
    parent = el.parent
    if parent is None or isinstance(parent, Document):
        siblings = [el]
    else:
        siblings = [c for c in parent.children if isinstance(c, Element)]
    if of_type:
        siblings = [c for c in siblings if c.tag == el.tag
                    and c.namespace == el.namespace]
    if from_end:
        siblings = siblings[::-1]
    try:
        return siblings.index(el) + 1
    except ValueError:
        return None


_TAG_FOLD: dict[str, str] = {}


def _tag_pred(name: str) -> Predicate:
    low = name.lower()
    fold = _TAG_FOLD

    def pred(el: Element) -> bool:
        # type selectors match ASCII-case-insensitively; tag names come
        # from a tiny interned vocabulary, so a fold cache beats calling
        # str.lower() per element on the match hot path
        t = el.tag
        if t == low:
            return True
        lt = fold.get(t)
        if lt is None:
            lt = fold[t] = t.lower()
        return lt == low

    return pred


def _attr_pred(name: str, op: Optional[str], value: Optional[str]) -> Predicate:
    name = name.lower()
    if op is None:
        return lambda el: name in el.attrs
    assert value is not None
    if op == "=":
        return lambda el: el.attrs.get(name) == value
    if op == "~=":
        return lambda el: value in (el.attrs.get(name) or "").split()
    if op == "^=":
        return lambda el: bool(value) and (el.attrs.get(name) or "").startswith(value)
    if op == "$=":
        return lambda el: bool(value) and (el.attrs.get(name) or "").endswith(value)
    if op == "*=":
        return lambda el: bool(value) and value in (el.attrs.get(name) or "")
    if op == "|=":
        def dash_match(el: Element) -> bool:
            v = el.attrs.get(name)
            return v is not None and (v == value or v.startswith(value + "-"))
        return dash_match
    raise ValueError(f"unknown attribute operator {op!r}")


def _descendant_of(pred: Predicate) -> Predicate:
    def check(el: Element) -> bool:
        node = _parent_element(el)
        while node is not None:
            if pred(node):
                return True
            node = _parent_element(node)
        return False
    return check


def _is_disabled(el: Element) -> bool:
    """WHATWG disabled concept incl. the fieldset/legend cascade
    (reference: isDisabledPredicate, HTMLSelector.m:328-365)."""
    tag = el.tag
    has_disabled = "disabled" in el.attrs
    if tag in ("optgroup", "fieldset", "menuitem") and has_disabled:
        return True
    if tag in ("button", "input", "select", "textarea"):
        if has_disabled:
            return True
        # descendant of a disabled fieldset, but not inside that fieldset's
        # first legend child
        node = _parent_element(el)
        inside_legend_chain: list[Element] = []
        while node is not None:
            if node.tag == "fieldset" and "disabled" in node.attrs:
                first_legend = None
                for c in node.children:
                    if isinstance(c, Element) and c.tag == "legend":
                        first_legend = c
                        break
                anc = _parent_element(el)
                in_first_legend = False
                while anc is not None and anc is not node:
                    if anc is first_legend:
                        in_first_legend = True
                        break
                    anc = _parent_element(anc)
                if not in_first_legend:
                    return True
            node = _parent_element(node)
        return False
    if tag == "option":
        if has_disabled:
            return True
        node = _parent_element(el)
        while node is not None:
            if node.tag == "optgroup" and "disabled" in node.attrs:
                return True
            node = _parent_element(node)
    return False


def _is_enabled(el: Element) -> bool:
    """(reference: isEnabledPredicate, HTMLSelector.m:367-392)"""
    if el.tag in ("a", "area", "link") and "href" in el.attrs:
        return True
    if el.tag in ("button", "input", "select", "textarea", "optgroup",
                  "option", "menuitem", "fieldset"):
        return not _is_disabled(el)
    return False


_NEVER: Predicate = lambda el: False


def _pseudo_pred(source: str, pos: int, name: str,
                 arg: Optional[str]) -> Predicate:
    name = name.lower()
    if name == "not":
        if arg is None:
            raise SelectorError(source, pos, ":not() requires an argument")
        inner = compile_selector(arg)
        return lambda el: not inner.matches(el)
    if name in ("nth-child", "nth-last-child", "nth-of-type",
                "nth-last-of-type"):
        if arg is None:
            raise SelectorError(source, pos, f":{name}() requires an argument")
        try:
            a, b = parse_nth(arg)
        except ValueError as exc:
            raise SelectorError(source, pos, str(exc)) from None
        of_type = name.endswith("of-type")
        from_end = "last" in name
        def nth(el: Element) -> bool:
            idx = _child_index(el, of_type=of_type, from_end=from_end)
            return idx is not None and _nth_matches(a, b, idx)
        return nth
    if arg is not None:
        raise SelectorError(source, pos, f":{name} does not take an argument")
    if name == "first-child":
        return lambda el: _child_index(el, of_type=False, from_end=False) == 1
    if name == "last-child":
        return lambda el: _child_index(el, of_type=False, from_end=True) == 1
    if name == "only-child":
        return lambda el: (_child_index(el, of_type=False, from_end=False) == 1
                           and _child_index(el, of_type=False, from_end=True) == 1)
    if name == "first-of-type":
        return lambda el: _child_index(el, of_type=True, from_end=False) == 1
    if name == "last-of-type":
        return lambda el: _child_index(el, of_type=True, from_end=True) == 1
    if name == "only-of-type":
        return lambda el: (_child_index(el, of_type=True, from_end=False) == 1
                           and _child_index(el, of_type=True, from_end=True) == 1)
    if name == "empty":
        def empty(el: Element) -> bool:
            from .dom import Text
            for c in el.children:
                if isinstance(c, Element):
                    return False
                if isinstance(c, Text) and c.data:
                    return False
            return True
        return empty
    if name == "root":
        return lambda el: _parent_element(el) is None
    if name == "link":
        return lambda el: (el.tag in ("a", "area", "link")
                           and "href" in el.attrs)
    if name == "enabled":
        return _is_enabled
    if name == "disabled":
        return _is_disabled
    if name == "checked":
        return lambda el: "checked" in el.attrs or "selected" in el.attrs
    if name in ("visited", "active", "hover", "focus"):
        return _NEVER
    raise SelectorError(source, pos, f"unsupported pseudo-class :{name}")


# --------------------------------------------------------------- compiler

class CompiledSelector:
    """A parsed selector; compile once, reuse (HTMLSelector.h:20-28)."""

    __slots__ = ("source", "_pred")

    def __init__(self, source: str, pred: Predicate) -> None:
        self.source = source
        self._pred = pred

    def matches(self, el: Element) -> bool:
        return self._pred(el)

    def __repr__(self) -> str:
        return f"CompiledSelector({self.source!r})"


def compile_selector(source: str) -> CompiledSelector:
    preds: list[Predicate] = []
    pos = 0
    n = len(source)
    if not source.strip():
        raise SelectorError(source, 0, "empty selector")
    while True:
        pred, pos = _compile_single(source, pos)
        preds.append(pred)
        pos = _skip_ws(source, pos)
        if pos >= n:
            break
        if source[pos] != ",":
            raise SelectorError(source, pos, "expected ',' between selectors")
        pos += 1
        pos = _skip_ws(source, pos)
        if pos >= n:
            raise SelectorError(source, pos, "trailing comma")
    if len(preds) == 1:
        return CompiledSelector(source, preds[0])
    def any_pred(el: Element) -> bool:
        return any(p(el) for p in preds)
    return CompiledSelector(source, any_pred)


def _compile_single(source: str, pos: int) -> tuple[Predicate, int]:
    """Compile one complex selector (no group commas) starting at pos."""
    pos = _skip_ws(source, pos)
    seq_pred, pos = _compile_sequence(source, pos)
    n = len(source)
    while True:
        ws_start = pos
        pos = _skip_ws(source, pos)
        if pos >= n or source[pos] == ",":
            return seq_pred, (ws_start if pos >= n or source[pos] == "," else pos)
        combinator = None
        if source[pos] in ">+~":
            combinator = source[pos]
            pos = _skip_ws(source, pos + 1)
        elif pos > ws_start:
            combinator = " "
        else:
            raise SelectorError(source, pos, "expected combinator")
        left = seq_pred
        right, pos = _compile_sequence(source, pos)
        if combinator == " ":
            seq_pred = _combine_descendant(left, right)
        elif combinator == ">":
            seq_pred = _combine_child(left, right)
        elif combinator == "+":
            seq_pred = _combine_adjacent(left, right)
        else:
            seq_pred = _combine_general_sibling(left, right)


def _combine_descendant(left: Predicate, right: Predicate) -> Predicate:
    def check(el: Element) -> bool:
        if not right(el):
            return False
        node = _parent_element(el)
        while node is not None:
            if left(node):
                return True
            node = _parent_element(node)
        return False
    return check


def _combine_child(left: Predicate, right: Predicate) -> Predicate:
    def check(el: Element) -> bool:
        if not right(el):
            return False
        p = _parent_element(el)
        return p is not None and left(p)
    return check


def _prev_sibling_element(el: Element) -> Optional[Element]:
    parent = el.parent
    if parent is None:
        return None
    prev: Optional[Element] = None
    for c in parent.children:
        if c is el:
            return prev
        if isinstance(c, Element):
            prev = c
    return None


def _combine_adjacent(left: Predicate, right: Predicate) -> Predicate:
    def check(el: Element) -> bool:
        if not right(el):
            return False
        prev = _prev_sibling_element(el)
        return prev is not None and left(prev)
    return check


def _combine_general_sibling(left: Predicate, right: Predicate) -> Predicate:
    def check(el: Element) -> bool:
        if not right(el):
            return False
        parent = el.parent
        if parent is None:
            return False
        for c in parent.children:
            if c is el:
                return False
            if isinstance(c, Element) and left(c):
                return True
        return False
    return check


def _compile_sequence(source: str, pos: int) -> tuple[Predicate, int]:
    """One simple-selector sequence: [type|*] (#id|.class|[attr]|:pseudo)*"""
    n = len(source)
    preds: list[Predicate] = []
    if pos >= n:
        raise SelectorError(source, pos, "expected selector")
    c = source[pos]
    if c == "*":
        pos += 1
    elif c not in ".#[:," and not c.isspace():
        name, new_pos = _scan_ident(source, pos)
        if not name:
            raise SelectorError(source, pos, "expected type selector")
        preds.append(_tag_pred(name))
        pos = new_pos
    got_any = bool(preds) or c == "*"
    while pos < n:
        c = source[pos]
        if c == ".":
            name, new_pos = _scan_ident(source, pos + 1)
            if not name:
                raise SelectorError(source, pos, "expected class name")
            preds.append(_attr_pred("class", "~=", name))
            pos = new_pos
        elif c == "#":
            name, new_pos = _scan_ident(source, pos + 1)
            if not name:
                raise SelectorError(source, pos, "expected id")
            preds.append(_attr_pred("id", "=", name))
            pos = new_pos
        elif c == "[":
            pred, pos = _compile_attr(source, pos + 1)
            preds.append(pred)
        elif c == ":":
            pred, pos = _compile_pseudo(source, pos + 1)
            preds.append(pred)
        else:
            break
        got_any = True
    if not got_any:
        raise SelectorError(source, pos, "expected selector")
    if not preds:
        return (lambda el: True), pos
    if len(preds) == 1:
        return preds[0], pos
    # specialized and-chains: a compound selector is evaluated per ELEMENT,
    # so the generator-expression form of all() is measurable overhead
    if len(preds) == 2:
        p0, p1 = preds
        return (lambda el: p0(el) and p1(el)), pos
    if len(preds) == 3:
        p0, p1, p2 = preds
        return (lambda el: p0(el) and p1(el) and p2(el)), pos

    def all_pred(el: Element) -> bool:
        for p in preds:
            if not p(el):
                return False
        return True
    return all_pred, pos


def _compile_attr(source: str, pos: int) -> tuple[Predicate, int]:
    n = len(source)
    pos = _skip_ws(source, pos)
    name, pos = _scan_ident(source, pos)
    if not name:
        raise SelectorError(source, pos, "expected attribute name")
    pos = _skip_ws(source, pos)
    if pos < n and source[pos] == "]":
        return _attr_pred(name, None, None), pos + 1
    op = None
    for candidate in ("~=", "^=", "$=", "*=", "|=", "="):
        if source.startswith(candidate, pos):
            op = candidate
            pos += len(candidate)
            break
    if op is None:
        raise SelectorError(source, pos, "expected attribute operator or ']'")
    pos = _skip_ws(source, pos)
    if pos >= n:
        raise SelectorError(source, pos, "unterminated attribute selector")
    if source[pos] in "\"'":
        quote = source[pos]
        end = source.find(quote, pos + 1)
        if end == -1:
            raise SelectorError(source, pos, "unterminated string")
        value = source[pos + 1:end]
        pos = end + 1
    else:
        value, pos = _scan_ident(source, pos)
    pos = _skip_ws(source, pos)
    if pos >= n or source[pos] != "]":
        raise SelectorError(source, pos, "expected ']'")
    return _attr_pred(name, op, value), pos + 1


def _compile_pseudo(source: str, pos: int) -> tuple[Predicate, int]:
    n = len(source)
    if pos < n and source[pos] == ":":
        raise SelectorError(source, pos, "pseudo-elements are unsupported")
    start = pos
    name, pos = _scan_ident(source, pos)
    if not name:
        raise SelectorError(source, pos, "expected pseudo-class name")
    arg = None
    if pos < n and source[pos] == "(":
        depth = 1
        end = pos + 1
        while end < n and depth:
            if source[end] == "(":
                depth += 1
            elif source[end] == ")":
                depth -= 1
            end += 1
        if depth:
            raise SelectorError(source, pos, "unterminated '('")
        arg = source[pos + 1:end - 1]
        pos = end
    return _pseudo_pred(source, start, name, arg), pos


# ------------------------------------------------------------------ query

def _iter_matches(root: Node, sel: CompiledSelector) -> Iterator[Element]:
    pred = sel._pred
    stack = [root]
    while stack:
        node = stack.pop()
        kids = node.children
        if kids:
            stack.extend(reversed(kids))
        if isinstance(node, Element) and pred(node):
            yield node


def select(root: Node, selector: "str | CompiledSelector") -> list[Element]:
    """All elements under root (inclusive) matching the selector, in tree
    order (reference: nodesMatchingSelector, HTMLSelector.m:925-938)."""
    sel = compile_selector(selector) if isinstance(selector, str) else selector
    return list(_iter_matches(root, sel))


def select_first(root: Node,
                 selector: "str | CompiledSelector") -> Optional[Element]:
    """(reference: firstNodeMatchingSelector, HTMLSelector.m:940-952)"""
    sel = compile_selector(selector) if isinstance(selector, str) else selector
    return next(_iter_matches(root, sel), None)
