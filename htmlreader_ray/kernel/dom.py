"""DOM node classes for the HTML5 kernel.

Re-derives the reference's data model (SURVEY.md §1.1) as plain Python
objects:
- Node / Document / Element / Text / Comment / Doctype mirror HTMLNode /
  HTMLDocument / HTMLElement / HTMLTextNode / HTMLComment / HTMLDocumentType
  (/root/reference/Sources/include/HTMLNode.h:13-40 etc.)
- attributes are a plain dict (Python dicts are insertion-ordered, which is
  exactly the HTMLOrderedDictionary requirement,
  /root/reference/Sources/HTMLOrderedDictionary.h:15-36)
- ``tree_order`` iteration is lazy preorder DFS like HTMLTreeEnumerator
  (/root/reference/Sources/HTMLTreeEnumerator.m:55-100)
- textContent getter/setter semantics per /root/reference/Sources/HTMLNode.m:219-239

These objects only ever live inside one map_batches UDF invocation; they are
never serialized across Ray tasks (SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Iterator, Optional

HTML_NS = "html"
MATHML_NS = "mathml"
SVG_NS = "svg"

NO_QUIRKS = "no-quirks"
QUIRKS = "quirks"
LIMITED_QUIRKS = "limited-quirks"


class Node:
    __slots__ = ("parent", "children", "__weakref__")

    def __init__(self) -> None:
        self.parent: Optional[Node] = None
        self.children: list[Node] = []

    # -- mutation (reference: Sources/HTMLNode.m:91-196) --------------------
    def append_child(self, child: "Node") -> "Node":
        if child.parent is not None:
            child.parent.remove_child(child)
        child.parent = self
        self.children.append(child)
        return child

    def insert_child(self, index: int, child: "Node") -> "Node":
        if child.parent is not None:
            child.parent.remove_child(child)
        child.parent = self
        self.children.insert(index, child)
        return child

    def remove_child(self, child: "Node") -> None:
        try:
            self.children.remove(child)
        except ValueError:
            return
        child.parent = None

    def remove_from_parent(self) -> None:
        if self.parent is not None:
            self.parent.remove_child(self)

    def insert_text(self, index: int, data: str) -> None:
        """Insert text at a child index, merging with an adjacent text node
        (reference: -insertString:atChildNodeIndex:, Sources/HTMLNode.m:118-141)."""
        if index > 0 and isinstance(self.children[index - 1], Text):
            self.children[index - 1].data += data  # type: ignore[union-attr]
        elif index < len(self.children) and isinstance(self.children[index], Text):
            t = self.children[index]
            t.data = data + t.data  # type: ignore[union-attr]
        else:
            self.insert_child(index, Text(data))

    # -- traversal ----------------------------------------------------------
    def tree_order(self) -> Iterator["Node"]:
        """Lazy preorder DFS ("tree order"), self included."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def descendants(self) -> Iterator["Node"]:
        it = self.tree_order()
        next(it)  # skip self
        return it

    def reversed_tree_order(self) -> list["Node"]:
        return list(self.tree_order())[::-1]

    def elements_in_tree_order(self) -> Iterator["Element"]:
        for node in self.tree_order():
            if isinstance(node, Element):
                yield node

    @property
    def document(self) -> Optional["Document"]:
        node: Optional[Node] = self
        while node is not None:
            if isinstance(node, Document):
                return node
            node = node.parent
        return None

    @property
    def index_in_parent(self) -> int:
        assert self.parent is not None
        return self.parent.children.index(self)

    # -- text (reference: Sources/HTMLNode.m:219-250) -----------------------
    @property
    def text_content(self) -> str:
        parts: list[str] = []
        stack = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, Text):
                parts.append(node.data)
            elif node.children:
                stack.extend(reversed(node.children))
        return "".join(parts)

    @text_content.setter
    def text_content(self, value: str) -> None:
        for c in list(self.children):
            self.remove_child(c)
        if value:
            self.append_child(Text(value))

    @property
    def text_components(self) -> list[str]:
        return [c.data for c in self.children if isinstance(c, Text)]

    # -- selector / serialization conveniences (API parity with the
    #    reference's -nodesMatchingSelector: / innerHTML surface,
    #    /root/reference/Sources/HTMLSelector.m:925-952,
    #    /root/reference/Sources/HTMLSerialization.m:100-103) ------------
    def css(self, selector: str) -> "list[Element]":
        from .selector import select
        return select(self, selector)

    def css_first(self, selector: str) -> "Optional[Element]":
        from .selector import select_first
        return select_first(self, selector)

    @property
    def inner_html(self) -> str:
        from .serialize import serialize_fragment
        return serialize_fragment(self)

    @inner_html.setter
    def inner_html(self, html: str) -> None:
        from .parser import parse_fragment
        context = self if isinstance(self, Element) else Element("body")
        nodes = parse_fragment(html, context)  # type: ignore[arg-type]
        for c in list(self.children):
            self.remove_child(c)
        for n in nodes:
            self.append_child(n)

    @property
    def outer_html(self) -> str:
        from .serialize import serialize
        return serialize(self)


class Document(Node):
    __slots__ = ("quirks_mode", "parsed_encoding", "parse_errors")

    def __init__(self) -> None:
        super().__init__()
        self.quirks_mode = NO_QUIRKS
        self.parsed_encoding: Optional[str] = None
        # populated by parse(..., collect_errors=True): tokenizer + tree
        # builder parse-error codes in document order
        self.parse_errors: list[str] = []

    @property
    def doctype(self) -> Optional["Doctype"]:
        for c in self.children:
            if isinstance(c, Doctype):
                return c
        return None

    @property
    def root_element(self) -> Optional["Element"]:
        for c in self.children:
            if isinstance(c, Element):
                return c
        return None

    @property
    def body_element(self) -> Optional["Element"]:
        root = self.root_element
        if root is not None and root.tag == "html":
            for c in root.children:
                if isinstance(c, Element) and c.tag in ("body", "frameset"):
                    return c
        return None

    @property
    def head_element(self) -> Optional["Element"]:
        root = self.root_element
        if root is not None and root.tag == "html":
            for c in root.children:
                if isinstance(c, Element) and c.tag == "head":
                    return c
        return None


class Element(Node):
    __slots__ = ("tag", "namespace", "attrs")

    def __init__(self, tag: str, attrs: Optional[dict[str, str]] = None,
                 namespace: str = HTML_NS) -> None:
        self.parent = None
        self.children = []
        self.tag = tag
        self.namespace = namespace
        self.attrs: dict[str, str] = attrs if attrs is not None else {}

    def get(self, name: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrs.get(name, default)

    @property
    def element_id(self) -> Optional[str]:
        return self.attrs.get("id")

    @property
    def classes(self) -> list[str]:
        v = self.attrs.get("class")
        return v.split() if v else []

    def has_class(self, name: str) -> bool:
        return name in self.classes

    def toggle_class(self, name: str) -> None:
        cls = self.classes
        if name in cls:
            cls.remove(name)
        else:
            cls.append(name)
        if cls:
            self.attrs["class"] = " ".join(cls)
        else:
            self.attrs.pop("class", None)

    # Ordered-attribute mutation API. Attributes keep insertion order
    # (Python dict), replacing a value never moves the key, and indexed
    # insertion matches the reference's ordered dictionary semantics
    # (Sources/HTMLOrderedDictionary.m:119-148, tested by
    # HTMLReaderTests/HTMLDictionaryTests.m): inserting an EXISTING key
    # updates the value in place and ignores the index; removing an
    # absent key is a no-op; an index beyond len(attrs) raises.

    def insert_attr(self, index: int, name: str, value: str) -> None:
        if index > len(self.attrs) or index < 0:
            raise IndexError(
                f"index {index} beyond count {len(self.attrs)}")
        if name in self.attrs:
            self.attrs[name] = value
            return
        items = list(self.attrs.items())
        items.insert(index, (name, value))
        self.attrs.clear()
        self.attrs.update(items)

    def remove_attr(self, name: str) -> None:
        self.attrs.pop(name, None)

    def index_of_attr(self, name: str) -> Optional[int]:
        for i, k in enumerate(self.attrs):
            if k == name:
                return i
        return None

    def attr_name_at(self, index: int) -> str:
        if index < 0:
            raise IndexError(f"index {index} out of range")
        for i, k in enumerate(self.attrs):
            if i == index:
                return k
        raise IndexError(
            f"index {index} beyond count {len(self.attrs)}")

    @property
    def first_attr_name(self) -> Optional[str]:
        return next(iter(self.attrs), None)

    @property
    def last_attr_name(self) -> Optional[str]:
        name = None
        for name in self.attrs:
            pass
        return name

    def child_elements(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def __repr__(self) -> str:  # debug aid only
        ns = "" if self.namespace == HTML_NS else self.namespace + " "
        return f"<{ns}{self.tag} {self.attrs!r}>"


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str = "") -> None:
        super().__init__()
        self.data = data

    def append(self, s: str) -> None:
        self.data += s


class Comment(Node):
    __slots__ = ("data",)

    def __init__(self, data: str = "") -> None:
        super().__init__()
        self.data = data

    # reference parity: a comment's textContent IS its data and is
    # writable (HTMLNodeTests.m:149-152), while comments contribute
    # nothing to an ancestor's textContent
    @property
    def text_content(self) -> str:
        return self.data

    @text_content.setter
    def text_content(self, value: str) -> None:
        self.data = value


class Doctype(Node):
    __slots__ = ("name", "public_id", "system_id")

    def __init__(self, name: str = "", public_id: str = "", system_id: str = "") -> None:
        super().__init__()
        self.name = name or ""
        self.public_id = public_id or ""
        self.system_id = system_id or ""
