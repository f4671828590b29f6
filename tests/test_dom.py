"""DOM invariants (reference: HTMLNodeTests.m:33-208,
HTMLTreeEnumeratorTests.m:14-48, HTMLDictionaryTests.m)."""

import pytest

from htmlreader_ray.kernel import parse
from htmlreader_ray.kernel.dom import Comment, Document, Element, Text


def test_attribute_insertion_order_preserved():
    el = Element("div")
    el.attrs["zeta"] = "1"
    el.attrs["alpha"] = "2"
    el.attrs["mid"] = "3"
    assert list(el.attrs) == ["zeta", "alpha", "mid"]
    doc = parse('<div z="1" a="2" m="3">')
    div = doc.body_element.children[0]
    assert list(div.attrs) == ["z", "a", "m"]


def test_mutation_parent_pointers():
    parent = Element("div")
    child = Element("p")
    parent.append_child(child)
    assert child.parent is parent
    other = Element("span")
    other.append_child(child)
    assert child.parent is other
    assert parent.children == []
    other.remove_child(child)
    assert child.parent is None


def test_insert_child_at_index():
    parent = Element("div")
    a, b, c = Element("a"), Element("b"), Element("c")
    parent.append_child(a)
    parent.append_child(c)
    parent.insert_child(1, b)
    assert [e.tag for e in parent.children] == ["a", "b", "c"]


def test_insert_text_merges_adjacent():
    parent = Element("div")
    parent.append_child(Text("one"))
    parent.insert_text(1, "two")
    assert len(parent.children) == 1
    assert parent.children[0].data == "onetwo"
    parent.insert_text(0, "zero")
    assert parent.children[0].data == "zeroonetwo"


def test_text_content_getter_setter():
    doc = parse("<div>a<span>b</span>c</div>")
    div = doc.body_element.children[0]
    assert div.text_content == "abc"
    div.text_content = "replaced"
    assert len(div.children) == 1
    assert div.text_content == "replaced"


def test_text_components():
    doc = parse("<div>a<span>b</span>c</div>")
    div = doc.body_element.children[0]
    assert div.text_components == ["a", "c"]


def test_tree_order_dfs():
    doc = parse("<a id=1><b id=2><c id=3></c></b><d id=4></d></a>")
    names = [n.tag for n in doc.body_element.tree_order()
             if isinstance(n, Element)]
    assert names == ["body", "a", "b", "c", "d"]
    rev = [n.tag for n in doc.body_element.reversed_tree_order()
           if isinstance(n, Element)]
    assert rev == ["d", "c", "b", "a", "body"]


def test_class_helpers():
    el = Element("div", {"class": "a b"})
    assert el.has_class("a") and el.has_class("b") and not el.has_class("c")
    el.toggle_class("c")
    assert el.attrs["class"] == "a b c"
    el.toggle_class("a")
    assert el.attrs["class"] == "b c"


def test_document_accessors():
    doc = parse("<!DOCTYPE html><html><head><title>t</title></head>"
                "<body>x</body></html>")
    assert doc.doctype.name == "html"
    assert doc.root_element.tag == "html"
    assert doc.head_element.tag == "head"
    assert doc.body_element.tag == "body"


def test_no_reference_cycles_via_weak_semantics():
    # children hold no strong back-ref problems for gc: parent removal clears
    doc = parse("<div><p>x</p></div>")
    div = doc.body_element.children[0]
    p = div.children[0]
    div.remove_child(p)
    assert p.parent is None


def test_css_convenience():
    doc = parse("<div id=a><p class=x>1</p><p>2</p></div>")
    assert [e.attrs.get("class") for e in doc.css("p")] == ["x", None]
    assert doc.css_first("p.x").text_content == "1"
    assert doc.css_first("em") is None


def test_inner_html_get_set():
    doc = parse("<div id=a><p>old</p></div>")
    div = doc.css_first("#a")
    assert div.inner_html == "<p>old</p>"
    div.inner_html = "<b>new</b> text"
    assert div.inner_html == "<b>new</b> text"
    assert div.text_content == "new text"
    assert div.outer_html == '<div id="a"><b>new</b> text</div>'


def test_inner_html_context_sensitive():
    # fragment parsing respects the context element (td inside tr)
    doc = parse("<table><tr id=r><td>x</td></tr></table>")
    tr = doc.css_first("#r")
    tr.inner_html = "<td>a</td><td>b</td>"
    assert [c.tag for c in tr.child_elements()] == ["td", "td"]


def test_reference_readme_manipulation_parity():
    """The reference README's usage story (README.md:26-56): select, wrap,
    reserialize."""
    doc = parse("<p>Ahoy there, <b>sailor</b>!</p>")
    assert doc.css_first("b").text_content == "sailor"
    p = doc.css_first("p")
    parent = p.parent
    wrapper = Element("div", {"class": "special"})
    parent.insert_child(parent.children.index(p), wrapper)
    wrapper.append_child(p)  # reparents p under the wrapper
    assert doc.root_element.outer_html == (
        '<html><head></head><body><div class="special">'
        "<p>Ahoy there, <b>sailor</b>!</p></div></body></html>")


# --------------------------------------------------------------- attrs
# Ordered-attribute mutation parity with the reference's ordered
# dictionary (HTMLReaderTests/HTMLDictionaryTests.m, semantics in
# Sources/HTMLOrderedDictionary.m:119-148).

FIXTURE_KEYS = ["sup", "ahoy", "howdy", "yo", "hola"]


def _populated():
    el = Element("div")
    for k in FIXTURE_KEYS:
        el.attrs[k] = k
    return el


def test_attrs_all_keys_insertion_order():
    el = Element("div")
    keys = []
    for i in range(30):
        keys.append(f"k{i}")
        el.attrs[f"k{i}"] = str(i)
    assert list(el.attrs) == keys


def test_attrs_indexed_key_access():
    el = Element("div")
    with pytest.raises(IndexError):
        el.attr_name_at(0)
    el = _populated()
    assert el.attr_name_at(0) == FIXTURE_KEYS[0]
    with pytest.raises(IndexError):
        el.attr_name_at(len(el.attrs))


def test_attrs_remove():
    el = Element("div")
    el.remove_attr("yo")  # absent key is a no-op, not an error
    el = _populated()
    assert el.get("yo") == "yo"
    el.remove_attr("yo")
    assert el.get("yo") is None
    assert list(el.attrs) == ["sup", "ahoy", "howdy", "hola"]


def test_attrs_replace_keeps_position():
    el = _populated()
    last = FIXTURE_KEYS[-1]
    el.attrs[last] = el.attrs[last]          # self-assignment
    assert el.attrs[last] == last
    el.attrs[last] = "1"                      # real replacement
    assert el.attrs[last] == "1"
    assert el.last_attr_name == last          # ...did not move
    el.attrs[FIXTURE_KEYS[0]] = "1"           # replace the first key
    assert el.last_attr_name == last          # ...still did not move
    assert el.first_attr_name == FIXTURE_KEYS[0]


def test_attrs_insert_at_index():
    el = Element("div")
    with pytest.raises(IndexError):
        el.insert_attr(1, "yo", "yo")         # beyond count of empty
    el = _populated()
    count = len(el.attrs)
    with pytest.raises(IndexError):
        el.insert_attr(count + 1, "yo", "yo")
    el.insert_attr(count, "aloha", "aloha")   # at count == append
    assert el.last_attr_name == "aloha"
    el.insert_attr(0, "ciao", "ciao")         # at 0 == prepend
    assert el.first_attr_name == "ciao"
    assert list(el.attrs) == ["ciao"] + FIXTURE_KEYS + ["aloha"]


def test_attrs_insert_existing_key_updates_in_place():
    el = _populated()
    el.insert_attr(0, "yo", "changed")        # existing: index ignored
    assert el.attrs["yo"] == "changed"
    assert list(el.attrs) == FIXTURE_KEYS     # position unchanged


def test_attrs_index_of():
    el = Element("div")
    assert el.index_of_attr("yo") is None
    el = _populated()
    assert el.index_of_attr("yo") == FIXTURE_KEYS.index("yo")


def test_attrs_first_last_key():
    el = Element("div")
    assert el.first_attr_name is None
    assert el.last_attr_name is None
    el = _populated()
    assert el.first_attr_name == FIXTURE_KEYS[0]
    assert el.last_attr_name == FIXTURE_KEYS[-1]


def test_attrs_copy_independence():
    el = _populated()
    clone = Element(el.tag, dict(el.attrs))
    assert list(clone.attrs.items()) == list(el.attrs.items())
    el.attrs["extra"] = "1"
    assert "extra" not in clone.attrs


def test_comment_text_content_is_its_data():
    """Reference parity (HTMLNodeTests.m:149-152): a comment's
    textContent is its data and is writable, yet comments contribute
    nothing to an ancestor's textContent."""
    from htmlreader_ray.kernel.dom import Comment, Element, Text

    root = Element("body")
    c = Comment("shhh")
    root.append_child(c)
    assert root.text_content == ""
    assert c.text_content == "shhh"
    c.text_content = "loud"
    assert c.data == "loud"
    root.append_child(Text("hi"))
    assert root.text_content == "hi"
