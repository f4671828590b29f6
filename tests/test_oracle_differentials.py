"""Differential property tests against DuckDB for the kernels whose SQL
oracles claim bit-exactness (no Ray needed — these exercise the pure
numpy/arrow kernels against the database the driver compares with)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from htmlreader_ray.functions.dedup import byte_jaccard_batch

text_st = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=24)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(text_st, text_st), min_size=1, max_size=8))
def test_byte_jaccard_matches_duckdb(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    sim = byte_jaccard_batch(pa.chunked_array([pa.array(a, pa.string())]),
                             pa.chunked_array([pa.array(b, pa.string())]))
    con = duckdb.connect()
    ref = [con.execute("select jaccard(?, ?)", [x, y]).fetchone()[0]
           for x, y in zip(a, b)]
    assert sim.tolist() == ref  # bit-exact, not approx


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 400), min_size=1, max_size=60,
                unique=True),
       st.integers(1, 64))
def test_prefix_scan_chunking_matches_row_number(order_keys, seq_len):
    """The token_pack chunk rule (chunk = exclusive running sum // seq_len
    along the order) against DuckDB's window function on the same rows."""
    vals = [(k * 13) % 29 + 1 for k in order_keys]
    acc = 0
    prefix = {}
    for k in sorted(order_keys):
        prefix[k] = acc
        acc += (k * 13) % 29 + 1
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(zip(order_keys, vals)))
    rows = con.execute("""
        SELECT k, CAST(COALESCE(sum(v) OVER (ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p
        FROM t""").fetchall()
    for k, p in rows:
        assert prefix[k] == p
        assert prefix[k] // seq_len == p // seq_len


pii_text_st = st.text(
    alphabet=st.characters(codec="utf-8", blacklist_categories=("Cs",)),
    max_size=40)


@settings(max_examples=60, deadline=None)
@given(st.lists(pii_text_st, min_size=1, max_size=6),
       st.booleans(), st.booleans())
def test_pii_scrub_matches_duckdb(texts, add_email, add_phone):
    """pyarrow RE2 replace/count vs DuckDB RE2 regexp_replace /
    regexp_extract_all on arbitrary text with optionally injected PII —
    the bit-exactness claim the pii_scrub oracle rests on."""
    from htmlreader_ray.functions.text import (PII_EMAIL_RE, PII_PHONE_RE,
                                               pii_scrub_batch)
    if add_email:
        texts = [t + " a.b-c+d@ex-1.example.org tail" for t in texts]
    if add_phone:
        texts = ["+1-555-0100-33 " + t for t in texts]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})
    out = pii_scrub_batch(batch)
    con = duckdb.connect()
    for t, clean, n in zip(texts, out.column("clean_text").to_pylist(),
                           out.column("n_pii").to_pylist()):
        ref_clean = con.execute(
            "select regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '<PHONE>', 'g')",
            [t, PII_EMAIL_RE, PII_PHONE_RE]).fetchone()[0]
        ref_n = con.execute(
            "select len(regexp_extract_all(?, ?))"
            " + len(regexp_extract_all(?, ?))",
            [t, PII_EMAIL_RE, t, PII_PHONE_RE]).fetchone()[0]
        assert clean == ref_clean
        assert n == ref_n


ws_text_st = st.text(
    alphabet=st.sampled_from(list("ab ") + ["\t", "\n", "\x0c", "\x0b",
                                            "\xa0", "　", " "]),
    max_size=16)


@settings(max_examples=80, deadline=None)
@given(st.lists(ws_text_st, min_size=1, max_size=5))
def test_word_repetition_matches_duckdb(texts):
    """Word multisets equal by construction on arbitrary (incl. exotic
    unicode) whitespace: split on RE2 \\s+ then drop empty tokens, both
    sides."""
    from htmlreader_ray.functions.text import word_repetition_batch
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = word_repetition_batch(batch)
    got = {d: (n, dup, top) for d, n, dup, top in zip(
        out.column("doc_id").to_pylist(), out.column("n_words").to_pylist(),
        out.column("dup_word_frac").to_pylist(),
        out.column("top_word_frac").to_pylist())}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    ref = con.execute(r"""
        WITH w0 AS (SELECT doc_id,
                    unnest(string_split_regex(text, '\s+')) AS word
                    FROM documents),
        w AS (SELECT doc_id, word FROM w0 WHERE word <> ''),
        c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2)
        SELECT doc_id, sum(n)::BIGINT,
               1.0 - count(*)::DOUBLE / sum(n),
               max(n)::DOUBLE / sum(n)
        FROM c GROUP BY doc_id""").fetchall()
    assert got == {d: (n, dup, top) for d, n, dup, top in ref}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="/abc", min_size=1, max_size=6),
                          st.booleans()), min_size=0, max_size=8),
       st.lists(st.text(alphabet="/abc", min_size=0, max_size=8),
                min_size=1, max_size=20),
       st.randoms())
def test_robots_decision_is_rule_order_independent(rules, paths, rnd):
    """Longest-match + allow-wins-ties makes the REP decision a pure
    function of the rule SET; shuffling rule order must not change it."""
    import pyarrow as pa
    from htmlreader_ray.functions.robots import allowed_mask
    hosts = pa.array(["h"] * len(paths))
    p = pa.array(paths)
    base = allowed_mask(hosts, p, {"h": rules}).to_pylist()
    shuffled = list(rules)
    rnd.shuffle(shuffled)
    assert allowed_mask(hosts, p, {"h": shuffled}).to_pylist() == base


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="/ab", min_size=1, max_size=5),
                          st.booleans()), min_size=0, max_size=6),
       st.text(alphabet="/ab", min_size=1, max_size=8))
def test_robots_longer_allow_overrides(rules, path):
    """Appending 'Allow: <the full path>' (the longest possible match
    <= len(path)) must make the path allowed."""
    import pyarrow as pa
    from htmlreader_ray.functions.robots import allowed_mask
    out = allowed_mask(pa.array(["h"]), pa.array([path]),
                       {"h": rules + [(path, True)]}).to_pylist()
    assert out == [True]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=20),
    st.binary(min_size=0, max_size=200)), min_size=0, max_size=6))
def test_warc_roundtrip_property(recs):
    from htmlreader_ray.sources.warc import records_table, warc_record_bytes
    data = b"".join(
        warc_record_bytes(uri, "2026-01-01T00:00:00Z", payload)
        for uri, payload in recs)
    t = records_table(data)
    assert t.num_rows == len(recs)
    assert t.column("uri").to_pylist() == [u for u, _ in recs]
    assert t.column("payload").to_pylist() == [p for _, p in recs]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=60),
       st.integers(1, 4))
def test_pagerank_local_matches_model(pairs, iters):
    import pyarrow as pa
    from htmlreader_ray.functions.graph import pagerank_local, SCALE
    named = [(f"n{a}", f"n{b}") for a, b in pairs]
    t = pagerank_local(pa.table({"src": [s for s, _ in named],
                                 "dst": [d for _, d in named]}),
                       iters=iters)
    # independent model
    edges = sorted(set(named))
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    out = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    base = SCALE // n
    r = {u: base for u in nodes}
    for _ in range(iters):
        inflow = {u: 0 for u in nodes}
        for s, d in edges:
            inflow[d] += r[s] // out[s]
        dang = sum(r[u] for u in nodes if out[u] == 0)
        r = {u: (15 * base) // 100 + (85 * (inflow[u] + dang // n)) // 100
             for u in nodes}
    got = dict(zip(t.column("node").to_pylist(),
                   t.column("rank").to_pylist()))
    assert got == r
