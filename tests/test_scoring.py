"""Corpus-statistics scoring (functions/scoring.py) vs naive references:
unigram-LM surprisal and per-doc top tf-idf term, including the integer
quantization contract the SQL oracles rely on."""

import math
from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from htmlreader_ray.functions.scoring import (top_tfidf, unigram_surprisal,
                                              word_counts)

TEXTS = [
    "a b c d e",
    "a a a b",
    "",
    "   ",
    "one",
    "b c  d\te",
    "a b c d e",
    "rare word appears once",
]


def _words(t: str) -> list:
    return [w for w in t.split() if w]


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}))


def naive_counts(texts) -> Counter:
    c = Counter()
    for t in texts:
        c.update(_words(t))
    return c


def test_word_counts_matches_naive(ray_session):
    got = {r["w"]: r["n"] for r in word_counts(_ds(TEXTS)).take_all()}
    assert got == dict(naive_counts(TEXTS))


def test_unigram_surprisal_matches_naive(ray_session):
    out = {r["doc_id"]: (r["n_words"], r["surprisal_e3"])
           for r in unigram_surprisal(_ds(TEXTS)).take_all()}
    counts = naive_counts(TEXTS)
    t = float(sum(counts.values()))

    def s(c):
        return math.floor(1000 * -math.log(c / t) + 0.5)

    for i, text in enumerate(TEXTS):
        ws = _words(text)
        assert out[i] == (len(ws), sum(s(float(counts[w])) for w in ws)), i
    # every doc present, empty docs score (0, 0)
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert len(out) == len(TEXTS)


def test_unigram_topk_cap_and_oov(ray_session):
    # cap the vocab to the 2 most frequent words; the rest score as OOV
    out = {r["doc_id"]: r["surprisal_e3"]
           for r in unigram_surprisal(_ds(TEXTS), top_k=2).take_all()}
    counts = naive_counts(TEXTS)
    t = float(sum(counts.values()))
    top2 = {w for w, _ in sorted(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:2]}

    def s(w):
        c = float(counts[w]) if w in top2 else 0.5
        return math.floor(1000 * -math.log(c / t) + 0.5)

    for i, text in enumerate(TEXTS):
        assert out[i] == sum(s(w) for w in _words(text)), i


def naive_top_tfidf(texts):
    n = float(len(texts))
    df = Counter()
    for t in texts:
        df.update(set(_words(t)))
    best = {}
    for i, t in enumerate(texts):
        tf = Counter(_words(t))
        scored = sorted(
            ((math.floor(1000 * (float(c) * math.log(n / float(df[w])))
                         + 0.5), w) for w, c in tf.items()),
            key=lambda sw: (-sw[0], sw[1]))
        if scored:
            best[i] = (scored[0][1], scored[0][0])
    return best


def test_top_tfidf_matches_naive(ray_session):
    got = {r["doc_id"]: (r["term"], r["score_e3"])
           for r in top_tfidf(_ds(TEXTS)).take_all()}
    assert got == naive_top_tfidf(TEXTS)
    # wordless docs are absent by contract
    assert 2 not in got and 3 not in got


def test_top_tfidf_tie_breaks_lexicographically(ray_session):
    # two docs of unique-to-them words with equal tf/df: quantized scores
    # tie exactly and the lexicographically smallest term must win
    texts = ["zeta alpha mid", "beta omega mid"]
    got = {r["doc_id"]: r["term"] for r in top_tfidf(_ds(texts)).take_all()}
    assert got == {0: "alpha", 1: "beta"}


def test_quantization_is_floor_half_up():
    # the SQL mirror is floor(x + 0.5): verify the Python expression is not
    # accidentally banker's rounding (round(0.5) == 0 would diverge)
    assert math.floor(0.5 + 0.5) == 1
    assert math.floor(1.5 + 0.5) == 2
    assert math.floor(2.5 + 0.5) == 3


@pytest.mark.parametrize("n_docs", [1, 7])
def test_single_and_small_corpora(ray_session, n_docs):
    texts = TEXTS[:n_docs]
    uni = unigram_surprisal(_ds(texts)).take_all()
    assert len(uni) == n_docs
    tf = top_tfidf(_ds(texts)).take_all()
    assert len(tf) == sum(1 for t in texts if _words(t))


def test_top_tfidf_join_path_parity(ray_session):
    """broadcast_max_vocab=0 forces the hash-join fallback; results
    must be identical to the broadcast path and the naive model."""
    got = {r["doc_id"]: (r["term"], r["score_e3"])
           for r in top_tfidf(_ds(TEXTS),
                              broadcast_max_vocab=0).take_all()}
    assert got == naive_top_tfidf(TEXTS)


def test_dsir_weights_matches_naive(ray_session):
    """dsir_weights vs an independent hashed-bucket model."""
    import hashlib
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from htmlreader_ray.functions.scoring import dsir_weights

    docs = [(0, "t", "the cat sat"), (1, "t", "dog dog dog"),
            (2, "c", "the the the"), (3, "c", "cat dog"),
            (4, "c", ""), (5, "t", "sat cat the")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string())}))
    out = dsir_weights(ds, target_mask_fn=lambda b: pc.equal(
        b.column("source"), "t"))
    got = sorted((r["doc_id"], r["dsir_e3"]) for r in out.take_all())

    B = 64

    def bk(w):
        return hashlib.md5(w.encode()).digest()[0] % B

    def iq(x):
        return math.floor(1000 * math.log(x) + 0.5)

    q, p = {}, {}
    for _, s, t in docs:
        for w in t.lower().split():
            q[bk(w)] = q.get(bk(w), 0) + 1
            if s == "t":
                p[bk(w)] = p.get(bk(w), 0) + 1
    Q, P = sum(q.values()), sum(p.values())
    wt = {b: iq((p.get(b, 0) + 1.0) / (P + B)) - iq((q[b] + 1.0) / (Q + B))
          for b in q}
    ref = sorted((i, sum(wt[bk(w)] for w in t.lower().split()))
                 for i, _, t in docs if t.split())
    assert got == ref


def naive_top_bm25(texts, k1=1.2, b=0.75):
    docs = {i: _words(t) for i, t in enumerate(texts)}
    nd = float(len(texts))
    tw = float(sum(len(w) for w in docs.values()))
    avgdl = tw / nd
    df = Counter()
    for ws in docs.values():
        df.update(set(ws))
    best = {}
    for i, ws in docs.items():
        tf = Counter(ws)
        scored = []
        for w, c in tf.items():
            idf = math.log(((nd - float(df[w])) + 0.5)
                           / (float(df[w]) + 0.5) + 1.0)
            dl = float(len(ws))
            norm = float(c) + k1 * ((1.0 - b) + b * (dl / avgdl))
            s = math.floor(
                1000 * (idf * ((float(c) * (k1 + 1.0)) / norm)) + 0.5)
            scored.append((s, w))
        scored.sort(key=lambda sw: (-sw[0], sw[1]))
        if scored:
            best[i] = (scored[0][1], scored[0][0])
    return best


def test_top_bm25_matches_naive(ray_session):
    from htmlreader_ray.functions.scoring import top_bm25
    got = {r["doc_id"]: (r["term"], r["score_e3"])
           for r in top_bm25(_ds(TEXTS)).take_all()}
    assert got == naive_top_bm25(TEXTS)
    assert 2 not in got and 3 not in got


def test_top_bm25_join_path_parity(ray_session):
    """broadcast_max_vocab=0 forces the word-keyed hash join; results
    must be bit-identical to the broadcast path."""
    from htmlreader_ray.functions.scoring import top_bm25
    a = {r["doc_id"]: (r["term"], r["score_e3"])
         for r in top_bm25(_ds(TEXTS)).take_all()}
    c = {r["doc_id"]: (r["term"], r["score_e3"])
         for r in top_bm25(_ds(TEXTS),
                           broadcast_max_vocab=0).take_all()}
    assert a == c
