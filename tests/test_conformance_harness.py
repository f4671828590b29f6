"""Conformance harness self-tests: inline html5lib-format cases prove the
.dat / .test consumers work, and any vendored corpus under
tests/conformance/ is executed automatically."""

import glob
import json
import os

import pytest

from htmlreader_ray.testing.conformance import (DatCase, parse_dat,
                                                run_dat_case,
                                                run_tokenizer_case,
                                                should_skip_dat)

INLINE_DAT = """#data
<p>One<p>Two
#errors
(1,3): expected-doctype-but-got-start-tag
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "One"
|     <p>
|       "Two"

#data
<b>1<i>2</b>3</i>
#errors
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <i>
|         "2"
|     <i>
|       "3"

#data
<td>cell
#errors
#document-fragment
tr
#document
| <td>
|   "cell"

#data
<svg><path d=M0></svg>
#errors
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg path>
|         d="M0"
"""


def test_parse_dat_structure():
    cases = parse_dat(INLINE_DAT)
    assert len(cases) == 4
    assert cases[0].data == "<p>One<p>Two"
    assert cases[0].errors
    assert cases[2].fragment_context == "tr"
    assert cases[3].expected.endswith('d="M0"')


@pytest.mark.parametrize("idx", range(4))
def test_inline_dat_cases(idx):
    case = parse_dat(INLINE_DAT)[idx]
    got, want = run_dat_case(case)
    assert got == want, f"\n--- got ---\n{got}\n--- want ---\n{want}"


INLINE_TOKENIZER_TESTS = [
    {"description": "entity", "input": "&amp;x",
     "output": [["Character", "&x"]]},
    {"description": "tag with attrs", "input": "<a b='c'>",
     "output": [["StartTag", "a", {"b": "c"}]]},
    {"description": "self closing", "input": "<br/>",
     "output": [["StartTag", "br", {}, True]]},
    {"description": "comment", "input": "<!--x-->",
     "output": [["Comment", "x"]]},
    {"description": "doctype", "input": "<!DOCTYPE html>",
     "output": [["DOCTYPE", "html", None, None, True]]},
    {"description": "rcdata", "input": "a</xmp>b</title>c",
     "initialStates": ["RCDATA state"], "lastStartTag": "title",
     "output": [["Character", "a</xmp>b"], ["EndTag", "title"],
                ["Character", "c"]]},
    {"description": "double escaped", "input": "\\u003chtml\\u003e",
     "doubleEscaped": True,
     "output": [["StartTag", "html", {}]]},
]


@pytest.mark.parametrize("case", INLINE_TOKENIZER_TESTS,
                         ids=[c["description"] for c in INLINE_TOKENIZER_TESTS])
def test_inline_tokenizer_cases(case):
    for got, want in run_tokenizer_case(case):
        assert got == want


def test_skip_policy():
    assert should_skip_dat(DatCase(data="<template>x"), "")
    assert should_skip_dat(DatCase(), "template.dat")
    # script-on/script-off cases RUN (the reference skips them, but
    # run_dat_case honors the flag via parse(scripting=...))
    assert not should_skip_dat(DatCase(script_mode=True), "")
    assert not should_skip_dat(DatCase(script_mode=False), "")
    assert not should_skip_dat(DatCase(data="<p>"), "tests1.dat")


# ------------------------------------------------ vendored corpus (if any)

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "conformance")


def _vendored_dat_cases():
    out = []
    for path in sorted(glob.glob(os.path.join(CORPUS_DIR, "*.dat"))):
        fname = os.path.basename(path)
        with open(path, encoding="utf-8") as f:
            for i, case in enumerate(parse_dat(f.read())):
                if not should_skip_dat(case, fname):
                    out.append(pytest.param(case, id=f"{fname}:{i}"))
    return out


@pytest.mark.parametrize("case", _vendored_dat_cases() or
                         [pytest.param(None, id="no-corpus-vendored")])
def test_vendored_tree_construction(case):
    if case is None:
        pytest.skip("html5lib-tests corpus not vendored (no network)")
    got, want = run_dat_case(case)
    assert got == want


def _vendored_tokenizer_cases():
    out = []
    for path in sorted(glob.glob(os.path.join(CORPUS_DIR, "*.test"))):
        fname = os.path.basename(path)
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for i, case in enumerate(data.get("tests", [])):
            out.append(pytest.param(case, id=f"{fname}:{i}"))
    return out


@pytest.mark.parametrize("case", _vendored_tokenizer_cases() or
                         [pytest.param(None, id="no-corpus-vendored")])
def test_vendored_tokenizer(case):
    if case is None:
        pytest.skip("html5lib-tests corpus not vendored (no network)")
    for result in run_tokenizer_case(case):
        got, want = result[0], result[1]
        assert got == want
        if len(result) == 4:  # the case also pins parse-error codes
            got_errs, want_errs = result[2], result[3]
            assert got_errs == want_errs, (
                f"error codes differ: {got_errs} != {want_errs}")


def _vendored_encoding_cases():
    from htmlreader_ray.testing.conformance import parse_encoding_dat
    out = []
    for path in sorted(glob.glob(os.path.join(CORPUS_DIR, "encoding",
                                              "*.dat"))):
        fname = os.path.basename(path)
        with open(path, "rb") as f:
            for i, case in enumerate(parse_encoding_dat(f.read())):
                out.append(pytest.param(case, id=f"{fname}:{i}"))
    return out


@pytest.mark.parametrize("case", _vendored_encoding_cases() or
                         [pytest.param(None, id="no-corpus-vendored")])
def test_vendored_encoding_sniffing(case):
    from htmlreader_ray.testing.conformance import run_encoding_case
    if case is None:
        pytest.skip("html5lib-tests encoding corpus not vendored")
    got, want = run_encoding_case(case)
    assert got == want
