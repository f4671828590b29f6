"""Long-running robustness soaks for the parse kernel (no Ray needed).

Two modes, both deterministic under --seed and parallel via mp.Pool:

  differential  random markup soup -> the C data-state scanner and the pure
                Python tokenizer must produce identical token streams AND
                identical parse-error multisets (the same invariant as
                tests/test_ctokenizer.py, at soak scale).
  mutation      deterministic corpus pages mutated by truncate / splice /
                byte-flip / insert -> parse never raises, parsing is
                deterministic, and serialize-then-reparse reaches a fixpoint
                within two rounds (three checked; plaintext excluded — its
                raw text can embed its own terminator, see
                tests/test_fuzz.py).
  cparse        random markup soup + mutated corpus pages -> the fused C
                parser (_cparser.c), where it does not bail, must build the
                EXACT tree of the pure-Python kernel (html5lib dump compare,
                both scripting flags).

Usage:
    python tools/soak.py --mode both --trials 200000 --procs 30
Prints one JSON line per mode; exit code 0 iff zero failures.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ALPHABET = (string.ascii_letters + string.digits +
             "<>&;/='\"!-[] \t\n`?#.:\x00é“"
             # non-ASCII uppercase probes the ASCII-only fold contract:
             # 'À' Unicode-lowers to 'à', 'İ' to 'i̇' (length change!),
             # U+212A KELVIN SIGN to ASCII 'k' — spec keeps all three
             "ÀİK")

_WORDS = ("the quick spark row table scan merge window batch stream key "
          "join order filter value data line slow big small hash").split()


def _tokens_and_errors(src: str, force_python: bool):
    from htmlreader_ray.kernel import tokenizer as tkz
    saved = tkz._CSCAN
    if force_python:
        tkz._CSCAN = None
    try:
        t = tkz.Tokenizer(src)
        out = []
        for tok in t.tokens():
            if tok[0] == "eof":
                break
            if tok[0] == "chars" and out and out[-1][0] == "chars":
                out[-1] = ("chars", out[-1][1] + tok[1])
            else:
                out.append(tok)
        return out, sorted(t.errors)
    finally:
        tkz._CSCAN = saved


def _soak_differential(args):
    seed, trials = args
    rng = random.Random(seed)
    bad = 0
    first = None
    for _ in range(trials):
        n = rng.randint(0, 160)
        src = "".join(rng.choice(_ALPHABET) for _ in range(n))
        py = _tokens_and_errors(src, True)
        c = _tokens_and_errors(src, False)
        if py != c:
            bad += 1
            if first is None:
                first = src
    return bad, first


_SOUP_TAGS = (
    "template", "table", "tr", "td", "th", "caption", "colgroup", "col",
    "tbody", "thead", "tfoot", "select", "option", "optgroup", "svg",
    "math", "mi", "ms", "annotation-xml", "foreignObject", "desc", "title",
    "p", "b", "i", "a", "u", "em", "nobr", "div", "span", "li", "ul", "ol",
    "dd", "dt", "dl", "button", "ruby", "rb", "rt", "rp", "frameset",
    "frame", "noframes", "form", "input", "head", "body", "html", "script",
    "style", "textarea", "xmp", "plaintext", "br", "img", "hr", "marquee",
    "object", "applet", "h1", "h2", "pre", "listing", "center", "font",
    "blockquote", "address", "article", "aside", "main", "menu",
)


def _structured_soup(rng: random.Random) -> str:
    """Markup built from well-formed-ish tokens over the tags with special
    tree-construction rules — reaches template/table/select/foreign modes
    that pure character soup almost never forms."""
    parts = []
    for _ in range(rng.randint(1, 25)):
        r = rng.random()
        tag = rng.choice(_SOUP_TAGS)
        if r < 0.45:
            # vary attributes enough to defeat Noah's Ark dedup: >=4
            # NON-identical formatting entries between a formatting
            # element and its furthest block drive the adoption agency's
            # inner-loop counter>3 path (the AFE-bookmark overflow fixed
            # in _cparser.c lived there, invisible to identical-attr soup)
            attrs = rng.choice(("", "", "", ' a="b"', " color", " size=2",
                                ' x="1" y="2"', " À=1", " aİ", ' K="k"'))
            parts.append(f"<{tag}{attrs}>")
        elif r < 0.75:
            parts.append(f"</{tag}>")
        elif r < 0.9:
            parts.append(rng.choice(_WORDS))
        else:
            parts.append(rng.choice(("<!--x-->", "&amp;", "&notit;",
                                     "<!doctype html>", "\x00", " ", "]]>",
                                     "<![CDATA[x]]>", "<?php ?>")))
    return "".join(parts)


def _soak_cparse(args):
    seed, trials = args
    from htmlreader_ray.kernel.parser import _CPARSE
    from htmlreader_ray.kernel.tokenizer import Tokenizer
    from htmlreader_ray.kernel.treebuilder import TreeBuilder
    from htmlreader_ray.sources.corpus import build_page
    from htmlreader_ray.testing.conformance import dump_html5lib

    if _CPARSE is None:
        return 0, None
    from htmlreader_ray.kernel.extract import ExtractConfig, Extractor
    xcfg = ExtractConfig()
    xex = Extractor(xcfg)
    rng = random.Random(seed)
    bad = 0
    first = None
    for k in range(trials):
        if k % 3 == 0:
            text = " ".join(rng.choice(_WORDS)
                            for _ in range(rng.randint(3, 30)))
            src = _mutate(rng, build_page(seed * 999983 + k, text))
        elif k % 3 == 1:
            n = rng.randint(0, 200)
            src = "".join(rng.choice(_ALPHABET) for _ in range(n))
        else:
            src = _structured_soup(rng)
        for scripting in (True, False):
            doc = _CPARSE.parse(src, scripting=scripting)
            if doc is None:
                continue
            py = TreeBuilder(scripting=scripting).run(Tokenizer(src))
            if dump_html5lib(doc) != dump_html5lib(py):
                bad += 1
                if first is None:
                    first = src
        # extraction head differential (default rule-set)
        out = _CPARSE.extract(src, *xex._cargs)
        if out is not None:
            pyd = TreeBuilder().run(Tokenizer(src))
            pex = Extractor(xcfg)
            pex._cargs = None
            pex.strip_boilerplate(pyd)
            if out != pex.text_of(pyd):
                bad += 1
                if first is None:
                    first = src
    return bad, first


def _mutate(rng: random.Random, page: str) -> str:
    kind = rng.randint(0, 3)
    if kind == 0:  # truncate
        return page[:rng.randint(0, len(page))]
    if kind == 1:  # splice two windows
        a = rng.randint(0, len(page))
        b = rng.randint(0, len(page))
        return page[:a] + page[b:]
    if kind == 2:  # flip one char
        if not page:
            return page
        i = rng.randrange(len(page))
        return page[:i] + rng.choice(_ALPHABET) + page[i + 1:]
    # insert a fragment from elsewhere in the page
    i = rng.randint(0, len(page))
    j = rng.randint(0, len(page))
    return page[:i] + page[j:j + rng.randint(1, 40)] + page[i:]


def _soak_mutation(args):
    seed, trials = args
    from htmlreader_ray.kernel import parse
    from htmlreader_ray.kernel.dom import Element
    from htmlreader_ray.kernel.parser import parse_fragment
    from htmlreader_ray.kernel.serialize import serialize_fragment
    from htmlreader_ray.sources.corpus import build_page
    from htmlreader_ray.testing.conformance import dump_html5lib

    def frag_rt(s: str) -> str:
        root = Element("body")
        for n in parse_fragment(s, "body"):
            root.append_child(n)
        return serialize_fragment(root)

    rng = random.Random(seed)
    crashes = 0
    nondet = 0
    nofix = 0
    first = None
    for k in range(trials):
        text = " ".join(rng.choice(_WORDS)
                        for _ in range(rng.randint(3, 40)))
        page = _mutate(rng, build_page(seed * 1000003 + k, text))
        if "<plaintext" in page.lower():
            continue
        try:
            doc = parse("<!DOCTYPE html>" + page)
            if dump_html5lib(doc) != dump_html5lib(
                    parse("<!DOCTYPE html>" + page)):
                nondet += 1
                first = first or page
                continue
            if doc.body_element is None:
                continue
            once = serialize_fragment(doc.body_element)
            twice = frag_rt(once)
            if once != twice and twice != frag_rt(twice):
                nofix += 1
                first = first or page
        except Exception:
            crashes += 1
            first = first or page
    return crashes + nondet + nofix, first


_CONF_INPUTS: list[str] | None = None


def _conf_inputs() -> list[str]:
    """All #data inputs from the vendored conformance corpus — the
    spec's hardest constructs, used as mutation/crossover seeds (a very
    different distribution from synthetic soup: these encode template /
    foreign-content / adoption / foster corners verbatim)."""
    global _CONF_INPUTS
    if _CONF_INPUTS is None:
        import glob
        from htmlreader_ray.testing.conformance import parse_dat
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "conformance")
        inputs = []
        for p in sorted(glob.glob(os.path.join(root, "*.dat"))):
            with open(p, encoding="utf-8") as f:
                for c in parse_dat(f.read()):
                    if c.data:
                        inputs.append(c.data)
        _CONF_INPUTS = inputs
    return _CONF_INPUTS


def _soak_confmut(args):
    """Mutate + crossover conformance-case inputs, then require the
    fused C parser (where it does not bail) to build the EXACT tree of
    the pure-Python kernel, both scripting flags."""
    seed, trials = args
    from htmlreader_ray.kernel.parser import _CPARSE
    from htmlreader_ray.kernel.tokenizer import Tokenizer
    from htmlreader_ray.kernel.treebuilder import TreeBuilder
    from htmlreader_ray.testing.conformance import dump_html5lib

    if _CPARSE is None:
        return 0, None
    corpus = _conf_inputs()
    rng = random.Random(seed)
    bad = 0
    first = None
    for _ in range(trials):
        a = rng.choice(corpus)
        if rng.random() < 0.5:
            src = _mutate(rng, a)
        else:                       # crossover: splice two cases
            b = rng.choice(corpus)
            i = rng.randint(0, len(a))
            j = rng.randint(0, len(b))
            src = a[:i] + b[j:] if rng.random() < 0.5 else \
                a[:i] + b[:j] + a[i:]
        for scripting in (True, False):
            doc = _CPARSE.parse(src, scripting=scripting)
            if doc is None:
                continue
            py = TreeBuilder(scripting=scripting).run(Tokenizer(src))
            if dump_html5lib(doc) != dump_html5lib(py):
                bad += 1
                if first is None:
                    first = src
    return bad, first


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["differential", "mutation", "cparse",
                             "confmut", "both", "all"],
                    default="both")
    ap.add_argument("--trials", type=int, default=50000)
    ap.add_argument("--procs", type=int, default=max(os.cpu_count() - 2, 1))
    ap.add_argument("--seed", type=int, default=20260817)
    args = ap.parse_args()

    import multiprocessing as mp
    modes = {"both": ["differential", "mutation"],
             "all": ["differential", "mutation", "cparse",
                     "confmut"]}.get(args.mode, [args.mode])
    rc = 0
    fns = {"differential": _soak_differential, "mutation": _soak_mutation,
           "cparse": _soak_cparse, "confmut": _soak_confmut}
    for mode in modes:
        fn = fns[mode]
        per = max(args.trials // args.procs, 1)
        work = [(args.seed + i, per) for i in range(args.procs)]
        start = time.perf_counter()
        with mp.Pool(args.procs) as pool:
            results = pool.map(fn, work)
        failures = sum(r[0] for r in results)
        first = next((r[1] for r in results if r[1]), None)
        print(json.dumps({
            "mode": mode, "trials": per * args.procs,
            "failures": failures, "secs": round(time.perf_counter() - start, 1),
            "first_failure": (first[:400] if first else None)}))
        rc = rc or (1 if failures else 0)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
