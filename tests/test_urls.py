"""URL normalization + link extraction (functions/urls.py,
pipelines/queries.LinkExtract)."""

import pyarrow as pa
import pytest

from htmlreader_ray.functions.urls import (normalize_url,
                                           normalize_url_column,
                                           url_host_column)


CASES = [
    # (input, normalized, host)
    ("HTTPS://H3.Example.COM:443/P/0?x=5#s0",
     "https://h3.example.com/P/0?x=5", "h3.example.com"),
    ("http://Host.com:80/a?", "http://host.com/a", "host.com"),
    ("http://Host.com:8080/a#f", "http://host.com:8080/a", "host.com"),
    ("https://a.b", "https://a.b", "a.b"),
    ("ftp://F.Q:21/f", "ftp://f.q/f", "f.q"),
    ("wss://X.y:8443/s?q=1#z", "wss://x.y:8443/s?q=1", "x.y"),
    # case-significant parts preserved
    ("http://h.example/CaSe/Path?Q=Va%2Fl", "http://h.example/CaSe/Path?Q=Va%2Fl",
     "h.example"),
    # non-absolute references pass through untouched
    ("/relative", "/relative", ""),
    ("page.html#frag", "page.html#frag", ""),
    ("mailto:x@y.z", "mailto:x@y.z", ""),
    ("", "", ""),
    (None, "", ""),
]


def test_normalize_url_column():
    arr = pa.array([c[0] for c in CASES], pa.string())
    got = normalize_url_column(arr).to_pylist()
    for (inp, want, _), g in zip(CASES, got):
        assert g == want, (inp, g, want)


def test_url_host_column():
    arr = pa.array([c[0] for c in CASES], pa.string())
    got = url_host_column(arr).to_pylist()
    for (inp, _, want), g in zip(CASES, got):
        assert g == want, (inp, g, want)


def test_normalize_url_scalar():
    assert normalize_url("HTTP://A.B:80/") == "http://a.b/"


def test_chunked_input():
    arr = pa.chunked_array([pa.array(["http://A.b:80/x"], pa.string()),
                            pa.array(["/rel"], pa.string())])
    assert normalize_url_column(arr).to_pylist() == ["http://a.b/x", "/rel"]
    assert url_host_column(arr).to_pylist() == ["a.b", ""]


def test_link_extract_tree_order_and_entities():
    """Boilerplate links come out in tree order with entity-decoded
    anchors; the per-doc ref block follows with raw (un-normalized)
    hrefs — one row per a[href], seq dense from 0."""
    from htmlreader_ray.pipelines.queries import LinkExtract, ref_links_block

    tbl = pa.Table.from_arrays(
        [pa.array([2], pa.int64()), pa.array(["some text"], pa.string())],
        names=["doc_id", "text"])
    out = LinkExtract()(tbl).to_pylist()
    assert [r["seq"] for r in out] == list(range(len(out)))
    assert out[0]["href"] == "/" and out[0]["anchor"] == "Home"
    assert out[2]["anchor"] == "Contact\xa0Us"       # &nbsp; decoded
    assert out[5]["href"] == "/2"
    extras = out[6:]
    assert len(extras) == 2 % 3 + 1 == 3
    assert extras[0]["href"].startswith("HTTPS://H4.Example.COM:443/P/0")
    assert extras[0]["anchor"] == "ref 0"
    # ref block stays in sync with the SQL oracle's arithmetic
    assert ref_links_block(2).count("<a href=") == 3


def test_link_extract_counts_per_variant():
    """Every template variant yields exactly 6 boilerplate links plus
    doc_id %% 3 + 1 refs — the invariant both SQL oracles rely on."""
    from htmlreader_ray.pipelines.queries import LinkExtract

    keys = list(range(10))
    tbl = pa.Table.from_arrays(
        [pa.array(keys, pa.int64()),
         pa.array([f"text {k}" for k in keys], pa.string())],
        names=["doc_id", "text"])
    out = LinkExtract()(tbl)
    import collections
    counts = collections.Counter(out.column("doc_id").to_pylist())
    for k in keys:
        assert counts[k] == 6 + k % 3 + 1, (k, counts[k])
