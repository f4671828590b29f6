"""Large-document scaling regression: parse/extract must stay near-linear.

Round 3 found an O(n^2): the tokenizer's '&' (and script-data '-') scans
were unbounded, so every text token rescanned the remaining document when
the sought byte never occurred — 4 MB amp-free documents parsed at
0.9 MB/s (204x the per-byte cost of 1 KB docs). These tests pin the fix
by RATIO (4x input must cost < 10x time; quadratic costs ~16x), which is
robust to absolute host speed.
"""

import time

import pyarrow as pa

from htmlreader_ray.kernel.extract import Extractor


def _doc(n_chars: int) -> str:
    # amp-free, tag-dense: the shape that triggered the quadratic
    parts, total, i = [], 0, 0
    while total < n_chars:
        s = f"<p>w{i} lorem ipsu dolor sit amet consectetur adipiscing</p>"
        parts.append(s)
        total += len(s)
        i += 1
    return "<!DOCTYPE html><body>" + "".join(parts) + "</body>"


def _best(fn, reps: int = 3) -> float:
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def test_c_extract_scales_linearly():
    ex = Extractor()
    small, big = _doc(100_000), _doc(400_000)
    ex.extract_html(small)  # warm
    t_small = _best(lambda: ex.extract_html(small))
    t_big = _best(lambda: ex.extract_html(big))
    ratio = t_big / t_small
    assert ratio < 10, f"4x input cost {ratio:.1f}x time (quadratic ~16x)"


def test_python_tokenizer_scales_linearly():
    from htmlreader_ray.kernel.tokenizer import Tokenizer

    def run(doc):
        tok = Tokenizer(doc)
        for _ in tok.tokens():
            pass

    small, big = _doc(60_000), _doc(240_000)
    run(small)  # warm
    t_small = _best(lambda: run(small))
    t_big = _best(lambda: run(big))
    ratio = t_big / t_small
    assert ratio < 10, f"4x input cost {ratio:.1f}x time (quadratic ~16x)"


def test_deep_nesting_scales_linearly():
    """Barrier-less deep nesting made the per-block-opener
    p-in-button-scope stack walk O(depth^2): 1 MB of nested <div>s took
    50 s. The pscope[] parallel array answers it in O(1)."""
    ex = Extractor()
    def deep(n):
        return ("<!DOCTYPE html><body>" + "<div>" * (n // 6) + "x"
                + "</div>" * (n // 6) + "</body>")
    small, big = deep(100_000), deep(400_000)
    ex.extract_html(small)
    t_small = _best(lambda: ex.extract_html(small))
    t_big = _best(lambda: ex.extract_html(big))
    assert t_big / t_small < 10, f"{t_big / t_small:.1f}x"


def test_entity_dense_scales_linearly():
    """Per-charref recomputation of the next-'<' scan was O(n^2) on
    entity-dense text; the scan is now cached across charrefs."""
    ex = Extractor()
    def ent(n):
        return ("<!DOCTYPE html><body><p>"
                + "&amp;&lt;&gt;&quot;x " * (n // 24) + "</p></body>")
    small, big = ent(100_000), ent(400_000)
    ex.extract_html(small)
    t_small = _best(lambda: ex.extract_html(small))
    t_big = _best(lambda: ex.extract_html(big))
    assert t_big / t_small < 10, f"{t_big / t_small:.1f}x"


def test_pscope_adoption_agency_parity():
    """The pscope fast path must stay correct through the adoption
    agency's mid-stack splices: misnested formatting around open <p>
    elements, then block openers whose p-in-button-scope answer decides
    close_p. Compare C tree vs the Python kernel (which still walks)."""
    from htmlreader_ray.kernel import _cparser_build
    from htmlreader_ray.kernel import parse as pyparse
    from htmlreader_ray.testing.conformance import dump_html5lib

    mod = _cparser_build.load()
    assert mod is not None
    vectors = [
        "<p>a<b>b<i>c</b>d</i><p>e",
        "<p><b><p>x</b>y",
        "<div><p>a<b>b<div>c",
        "<p><button><p>inner<div>d",
        "<p>1<b>2<p>3<b>4<p>5</b>6",
        "<table><td><p>a<b>b</td><p>c",
        "<p><svg><desc><p>x</desc></svg><div>y",
        "<b><p><i>a<p>b</i><p>c</b><p>d",
        "<p>" * 30 + "x" + "<div>" * 30 + "<p>y",
    ]
    for v in vectors:
        c_doc = mod.parse(v)
        assert c_doc is not None, v
        assert dump_html5lib(c_doc) == dump_html5lib(pyparse(v)), v


def test_quoted_attr_and_rawtext_scale():
    """The attr-value and RCDATA '&' scans had the same unbounded bug."""
    ex = Extractor()
    def attr_doc(n):
        v = "x" * 2000
        return ("<!DOCTYPE html><body>"
                + "".join(f'<p data-k="{v}">t{i}</p>' for i in range(n))
                + "</body>")
    def rcdata_doc(n):
        return ("<!DOCTYPE html><body><textarea>"
                + ("no amps here just text " * 10 + "\n") * n
                + "</textarea></body>")
    for mk in (attr_doc, rcdata_doc):
        small, big = mk(40), mk(160)
        ex.extract_html(small)
        t_small = _best(lambda: ex.extract_html(small))
        t_big = _best(lambda: ex.extract_html(big))
        assert t_big / t_small < 10, mk.__name__
