"""Selector engine tests: fixture document + golden ID lists ported from
the reference (/root/reference/HTMLReaderTests/HTMLSelectorTests.m:17-259)
plus an+b parsing vectors (:49-81)."""

import pytest

from htmlreader_ray.kernel import parse
from htmlreader_ray.kernel.selector import (SelectorError, compile_selector,
                                            parse_nth, select, select_first)

FIXTURE = (
    "<root id='root'>"
    "  <parent id='empty' class='big snoopy dog'></parent>"
    "  <arbitrary id='nonempty-yet-devoid-of-elements' class='big' lang='up-dog'> </arbitrary>"
    "  <parent id='one-child'> <elem id='only-child'> </elem> </parent>"
    "  <parent id='three-children'> <elem id='child1'> </elem> <other id='child2'> </other> <elem id='child3'> </elem> </parent>"
    "  <input id='root-enabled'>"
    "  <input id='root-disabled' disabled>"
    "  <fieldset disabled id='fieldset-disabled'>"
    "    <input id='input-disabled-by-fieldset'>"
    "    <legend>"
    "      <input id='input-enabled-by-legend'>"
    "    </legend>"
    "    <legend>"
    "      <input id='input-disabled-by-legend'>"
    "    </legend>"
    "  </fieldset>"
    "  <a href='' id='a-enabled'></a>"
    "  <a name='' id='a-neither-enabled-nor-disabled'></a>"
    "  <ahoy‽ id=interrobang>"
    "    <there id=there></there>"
    "    <some-ns:some-tag id='colon'></some-ns:some-tag>"
    "    <replacement� id='fffd'></replacement�>"
    "  </ahoy‽>"
    "</root>"
)


@pytest.fixture(scope="module")
def doc():
    return parse(FIXTURE)


def ids(doc, selector):
    return [el.attrs.get("id") or el.tag for el in select(doc, selector)]


GOLDEN = [
    ("root", ["root"]),
    ("parent", ["empty", "one-child", "three-children"]),
    ("elem", ["only-child", "child1", "child3"]),
    ("other", ["child2"]),
    ("some-ns\\:some-tag", ["colon"]),
    ("ahoy\\203D", ["interrobang"]),
    ("parent *", ["only-child", "child1", "child2", "child3"]),
    ("root * elem", ["only-child", "child1", "child3"]),
    ("ahoy\\203d  there", ["there"]),
    ("parent:empty", ["empty"]),
    ("elem:first-of-type", ["only-child", "child1"]),
    ("elem:last-of-type", ["only-child", "child3"]),
    ("other:first-of-type", ["child2"]),
    ("parent:first-child", ["empty"]),
    ("elem+other", ["child2"]),
    ("other+elem", ["child3"]),
    ("elem~elem", ["child3"]),
    ("arbitrary~a", ["a-enabled", "a-neither-enabled-nor-disabled"]),
    ("elem#child1", ["child1"]),
    ("#child1", ["child1"]),
    ("parent.dog", ["empty"]),
    (".dog", ["empty"]),
    (".big:not(arbitrary)", ["empty"]),
    ("elem:not(elem#only-child)", ["child1", "child3"]),
    ("elem:NOT(elem#only-child)", ["child1", "child3"]),
    ("elem:not(elem#only-child, #child3)", ["child1"]),
    (":link", ["a-enabled"]),
    (":visited", []),
    (":active", []),
    (":hover", []),
    (":focus", []),
    (":disabled", ["root-disabled", "fieldset-disabled",
                   "input-disabled-by-fieldset", "input-disabled-by-legend"]),
    (":enabled", ["root-enabled", "input-enabled-by-legend", "a-enabled"]),
    ("[class]", ["empty", "nonempty-yet-devoid-of-elements"]),
    ('[class="big snoopy dog"]', ["empty"]),
    ("[class = 'big snoopy dog']", ["empty"]),
    ("[class ~= 'dog']", ["empty"]),
    ("[id ~= 'child1']", ["child1"]),
    ("[lang |= 'up']", ["nonempty-yet-devoid-of-elements"]),
    ("[id ^= child]", ["child1", "child2", "child3"]),
    ("[id $= '-child']", ["one-child", "only-child"]),
    ("[id *= child]", ["one-child", "only-child", "three-children",
                       "child1", "child2", "child3"]),
    ("[id*='ly-child']", ["only-child"]),
    ("input#input-disabled-by-fieldset + legend input",
     ["input-enabled-by-legend"]),
    ("root, there", ["root", "there"]),
    (".non, #existent, [missing], gone", []),
    ("root, root parent, root > #there notthere",
     ["root", "empty", "one-child", "three-children"]),
    ("nonexistent:root > a, arbitrary, missing:not(b)",
     ["nonempty-yet-devoid-of-elements"]),
    # one space after a hex escape is swallowed: needs two for descendant
    ("ahoy\\203d there", []),
    ("replacement\\110000", ["fffd"]),
    ("replacement\\0", ["fffd"]),
    ("replacement\\d888", ["fffd"]),
    ("replacement\\de0f", ["fffd"]),
    ("replacement\\", ["fffd"]),
]


@pytest.mark.parametrize("selector,expected", GOLDEN,
                         ids=[g[0][:40] for g in GOLDEN])
def test_golden_ids(doc, selector, expected):
    assert ids(doc, selector) == expected


BAD = ["[id]asdf", "h2..foo", "", "\\\nuh", ",", ",uh", "buh,", ",,",
       ":not(,)"]


@pytest.mark.parametrize("selector", BAD)
def test_bad_input(selector):
    with pytest.raises(SelectorError):
        compile_selector(selector)


def test_first_match(doc):
    assert select_first(doc, "fieldset").tag == "fieldset"
    assert [el.tag for el in select(doc, "legend")] == ["legend", "legend"]


NTH = [
    ("odd", (2, 1)), ("even", (2, 0)), ("   odd    ", (2, 1)),
    (" oDD", (2, 1)), ("EVEN", (2, 0)),
    ("2", (0, 2)), ("-2", (0, -2)),
    ("n", (1, 0)), ("-n", (-1, 0)), ("2n", (2, 0)),
    ("n + 1", (1, 1)), ("2n + 3", (2, 3)), ("2n - 3", (2, -3)),
    ("2n + 0", (2, 0)), ("2n - 0", (2, 0)), ("0n + 5", (0, 5)),
    (" - 3", (0, -3)),
]


@pytest.mark.parametrize("expr,expected", NTH, ids=[n[0] for n in NTH])
def test_nth_parsing(expr, expected):
    assert parse_nth(expr) == expected


@pytest.mark.parametrize("expr", ["2 - 2n", "2n + 3b", "x"])
def test_nth_invalid(expr):
    with pytest.raises(ValueError):
        parse_nth(expr)


def test_nth_child_matrix():
    doc = parse("<ul>" + "".join(f"<li id=i{k}>" for k in range(1, 11)) + "</ul>")
    assert ids(doc, "li:nth-child(2n+1)") == [f"i{k}" for k in (1, 3, 5, 7, 9)]
    assert ids(doc, "li:nth-child(3n)") == [f"i{k}" for k in (3, 6, 9)]
    assert ids(doc, "li:nth-last-child(2)") == ["i9"]
    assert ids(doc, "li:nth-child(-n+3)") == ["i1", "i2", "i3"]
    assert ids(doc, "li:only-child") == []


# extra predicate coverage beyond the reference fixture

def test_attribute_case_insensitive_names(doc):
    # attribute NAMES are lowercased by the parser; selector folds too
    d = parse('<div ID="x" DATA-Foo="Bar">')
    el = d.css_first("div")
    assert el.attrs == {"id": "x", "data-foo": "Bar"}
    assert d.css_first("[DATA-FOO]") is el
    assert d.css_first('[data-foo="Bar"]') is el
    assert d.css_first('[data-foo="bar"]') is None  # values case-sensitive


def test_universal_with_modifiers():
    d = parse("<p class=a>1</p><span class=a>2</span>")
    assert [e.tag for e in d.css("*.a")] == ["p", "span"]
    assert [e.tag for e in d.css("body > *")] == ["p", "span"]


def test_nth_of_type_mixed_siblings():
    d = parse("<div><p>a<span>b<p>c<span>d<p>e</div>")
    ps = d.css("p:nth-of-type(2)")
    # the spans nest INSIDE the p's (span does not block the implied </p>)
    assert [e.text_content for e in ps] == ["cd"]
    # each span is alone within its own p, so both are last-of-type
    assert [e.text_content for e in d.css("span:last-of-type")] == ["b", "d"]


def test_not_with_combinator_inside():
    d = parse("<div id=o><p id=i1><b>x</b></p><p id=i2>y</p></div>")
    got = [e.attrs.get("id") for e in d.css("p:not(#i1)")]
    assert got == ["i2"]


def test_chained_pseudo_classes():
    d = parse("<ul><li id=a><li id=b class=x><li id=c></ul>")
    assert [e.attrs["id"] for e in d.css("li:not(.x):not(:first-child)")] \
        == ["c"]


def test_empty_ignores_comments_spec_difference():
    # :empty per reference implementation: comments DO NOT make a node
    # non-empty (only elements and non-empty text do)
    d = parse("<div id=a><!--c--></div><div id=b> </div>")
    assert [e.attrs["id"] for e in d.css("div:empty")] == ["a"]


def test_selector_fuzz_compile_and_match():
    """Adversarial selector strings either compile or raise the documented
    error type — and whatever compiles must match without crashing."""
    import random
    from htmlreader_ray.kernel.parser import parse
    from htmlreader_ray.kernel.selector import compile_selector, select
    rng = random.Random(777)
    frags = ["div", "p", "*", ">", "+", "~", " ", ",", ":", "::", "[", "]",
             "=", "~=", "|=", "^=", "$=", "*=", "nth-child(",
             "nth-of-type(", "not(", "2n+1", "odd", "even", ")", ".", "#",
             "cls", "id1", "a[href", "'q'", '"q"', "\\", "\\31 ", "§",
             "🙂", "-n", "n", "0", "-", "--x", "|", "x|y", ":first-child",
             ":disabled", ":empty", ":root", ":link", "  ", "\t"]
    doc = parse("<div id=id1 class=cls><p>x</p><a href=u>y</a></div>")
    for _ in range(5000):
        s = "".join(rng.choice(frags) for _ in range(rng.randint(0, 10)))
        try:
            sel = compile_selector(s)
        except Exception as e:
            assert type(e).__name__ in ("SelectorError", "ValueError"), \
                (s, type(e))
            continue
        select(doc, sel)
