"""Inverted index and bigram-PMI (functions/indexing.py) vs naive
references, including the cross-document adjacency boundary and the
integer quantization contract."""

import math
from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from htmlreader_ray.functions.indexing import bigram_pmi, inverted_index

TEXTS = [
    "a b c a",
    "b c b c",
    "",
    "   ",
    "c",
    "x y x y x y x y x y",
    "y x y x y x",
]


def _words(t):
    return [w for w in t.split() if w]


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}))


def test_inverted_index_matches_naive(ray_session):
    got = {r["term"]: (r["postings"], r["df"])
           for r in inverted_index(_ds(TEXTS)).take_all()}
    expect = {}
    for i, t in enumerate(TEXTS):
        for w in set(_words(t)):
            expect.setdefault(w, []).append(i)
    expect = {w: (",".join(map(str, sorted(ids))), len(ids))
              for w, ids in expect.items()}
    assert got == expect


def test_inverted_index_postings_sorted_distinct(ray_session):
    # duplicate occurrences within a doc collapse to one posting
    out = inverted_index(_ds(["z z z", "z"])).take_all()
    assert out == [{"term": "z", "postings": "0,1", "df": 2}]


def test_inverted_index_df_cap_hot_term(ray_session):
    """The scale guard: a term in 100% of docs (stop-word analogue) is
    excluded from postings materialization when df exceeds the cap —
    exact df kept, postings NULL — and every cold term is untouched."""
    texts = [f"the w{i}" for i in range(40)]  # 'the' in every doc
    out = {r["term"]: (r["postings"], r["df"])
           for r in inverted_index(_ds(texts), df_cap=8).take_all()}
    assert out["the"] == (None, 40)
    for i in range(40):
        assert out[f"w{i}"] == (str(i), 1)
    assert len(out) == 41


def test_inverted_index_df_cap_noop_when_under(ray_session):
    """A cap nothing exceeds returns exactly the uncapped result."""
    uncapped = sorted(inverted_index(_ds(TEXTS)).take_all(),
                      key=lambda r: r["term"])
    capped = sorted(inverted_index(_ds(TEXTS), df_cap=100).take_all(),
                    key=lambda r: r["term"])
    assert uncapped == capped


def test_pmi_ln_bit_parity():
    """The vectorized PMI kernel's contract: pc.ln must be bit-identical
    to math.log for the quantization to match the scalar oracle."""
    import numpy as np
    import pyarrow.compute as pc
    rng = np.random.default_rng(7)
    x = ((rng.integers(1, 10000, 50000) / 1.23e7)
         / ((rng.integers(1, 100000, 50000) / 9.87e7)
            * (rng.integers(1, 100000, 50000) / 9.87e7)))
    lnpy = np.array([math.log(v) for v in x])
    lnar = pc.ln(pa.array(x)).to_numpy()
    assert (lnpy == lnar).all()


def naive_pmi(texts, min_count, top_k):
    uni = Counter()
    bi = Counter()
    for t in texts:
        ws = _words(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    u = float(sum(uni.values()))
    tt = float(sum(bi.values()))
    rows = []
    for (w1, w2), c in bi.items():
        if c < min_count:
            continue
        pmi = math.floor(1000 * math.log((c / tt) / ((uni[w1] / u)
                                                     * (uni[w2] / u)))
                         + 0.5)
        rows.append((w1, w2, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


@pytest.mark.parametrize("min_count", [1, 2, 5])
def test_bigram_pmi_matches_naive(ray_session, min_count):
    got = [(r["w1"], r["w2"], r["c"], r["pmi_e3"])
           for r in bigram_pmi(_ds(TEXTS), min_count=min_count,
                               top_k=10).take_all()]
    assert got == naive_pmi(TEXTS, min_count, 10)


def test_bigram_pmi_no_cross_document_pairs(ray_session):
    # last word of doc 0 and first of doc 1 must NOT pair
    out = bigram_pmi(_ds(["p q", "r s"]), min_count=1).take_all()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("q", "r") not in pairs
    assert pairs == {("p", "q"), ("r", "s")}


def test_bigram_pmi_negative_scores(ray_session):
    # a pair of two very common words occurring together once scores
    # negative PMI; the quantizer must floor correctly below zero
    texts = ["a b"] + ["a c"] * 20 + ["d b"] * 20
    out = {(r["w1"], r["w2"]): r["pmi_e3"]
           for r in bigram_pmi(_ds(texts), min_count=1, top_k=100).take_all()}
    assert out[("a", "b")] < 0
    ref = dict(((w1, w2), p) for w1, w2, _c, p in naive_pmi(texts, 1, 100))
    assert out == ref


def test_bigram_pmi_join_path_parity(ray_session):
    """broadcast_max_vocab=0 forces the hash-join fallback (web-scale
    vocab path); results must be identical to the broadcast path."""
    fast = [(r["w1"], r["w2"], r["c"], r["pmi_e3"])
            for r in bigram_pmi(_ds(TEXTS), min_count=1,
                                top_k=10).take_all()]
    slow = [(r["w1"], r["w2"], r["c"], r["pmi_e3"])
            for r in bigram_pmi(_ds(TEXTS), min_count=1, top_k=10,
                                broadcast_max_vocab=0).take_all()]
    assert fast == slow == naive_pmi(TEXTS, 1, 10)


def test_bigram_surprisal_brute(ray_session):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from htmlreader_ray.functions.indexing import bigram_surprisal

    docs = ["a b a b c", "b c b c", "a a a", "solo", ""]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    # brute force
    bigs = []
    per_doc = {}
    for i, d in enumerate(docs):
        ws = d.split()
        pairs = list(zip(ws, ws[1:]))
        if pairs:
            per_doc[i] = pairs
        bigs.extend(pairs)
    c12 = Counter(bigs)
    c1 = Counter(w1 for w1, _ in bigs)
    want = {}
    for i, pairs in per_doc.items():
        tot = 0
        for p in pairs:
            tot += math.floor(1000 * -math.log(c12[p] / c1[p[0]]) + 0.5)
        want[i] = (len(pairs), tot)
    out = {r["doc_id"]: (r["n_bigrams"], r["bg_surprisal_e3"])
           for r in bigram_surprisal(ray.data.from_arrow(t)).take_all()}
    assert out == want


def test_doc_similarity_topk_brute(ray_session):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from htmlreader_ray.functions.indexing import doc_similarity_topk

    docs = ["a b a b c", "a b c d", "x y x y", "x y z", "q r", ""]
    n = len(docs)
    cap = max(2, n // 25)
    tf, df = {}, Counter()
    for i, d in enumerate(docs):
        ws = d.split()
        c = Counter(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        tf[i] = c
        df.update(c.keys())
    score = {}
    for i, c in tf.items():
        for w, k in c.items():
            if df[w] <= cap:
                score[(i, w)] = math.floor(
                    1000 * (k * math.log(n / df[w])) + 0.5)
    sims = Counter()
    for (i, w), s in score.items():
        for (j, w2), s2 in score.items():
            if w == w2 and i < j:
                sims[(i, j)] += s * s2
    want = sorted(((v, a, b) for (a, b), v in sims.items()),
                  key=lambda t: (-t[0], t[1], t[2]))[:50]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = [(r["sim_e6"], r["doc_a"], r["doc_b"])
           for r in doc_similarity_topk(
               ray.data.from_arrow(t)).take_all()]
    assert out == want
