"""BPE tokenizer tests: deterministic learning, correct greedy encoding
(verified against a naive reference), distributed count pipeline."""

import pyarrow as pa
import pytest

from htmlreader_ray.functions import bpe


def naive_bpe_pieces(token, merges):
    """Reference implementation: apply merges strictly in rank order."""
    sym = list(token)
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i:i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_pretokenize_gpt2_style():
    toks = bpe.pretokenize("Hello world, it's 42 degrees!")
    assert "Hello" in toks
    assert " world" in toks
    assert "'s" in toks
    assert " 42" in toks
    assert "!" in toks


def test_learn_bpe_deterministic_and_effective():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m1 = bpe.learn_bpe(wc, n_merges=10)
    m2 = bpe.learn_bpe(list(reversed(wc)), n_merges=10)
    assert m1 == m2  # order-independent determinism
    # 'est' appears in newest+widest (9 total): its pairs merge early
    assert ("e", "s") in m1 or ("s", "t") in m1
    enc = bpe.BpeEncoder(m1)
    assert enc.n_pieces("newest") < len("newest")


def test_encoder_matches_naive_reference():
    wc = [("banana", 4), ("bandana", 3), ("anaconda", 2), ("nab", 5)]
    merges = bpe.learn_bpe(wc, n_merges=8)
    enc = bpe.BpeEncoder(merges)
    for w in ("banana", "bandana", "anaconda", "nab", "ban", "unseen"):
        assert enc.n_pieces(w) == len(naive_bpe_pieces(w, merges)), w


def test_bpe_count_differs_from_whitespace_words():
    merges = bpe.learn_bpe([("hello", 3), ("help", 3)], n_merges=3)
    enc = bpe.BpeEncoder(merges)
    text = "hello help hellohelp unmergeable"
    n_words = len(text.split())
    assert enc.count(text) != n_words
    assert enc.count("") == 0


def test_bpe_token_counts_ray(ray_session):
    import ray.data
    texts = ["the cat sat on the mat", "the cat ran", "mat cat the the"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": texts})
    out = bpe.bpe_token_counts(ray.data.from_arrow(t),
                               n_merges=50).take_all()
    got = {r["doc_id"]: r["n_tokens_bpe"] for r in out}
    # reference: learn on the same corpus serially
    wc = {}
    for s in texts:
        for w in bpe.pretokenize(s):
            if not w.isspace():
                wc[w] = wc.get(w, 0) + 1
    merges = bpe.learn_bpe(sorted(wc.items()), n_merges=50)
    enc = bpe.BpeEncoder(merges)
    want = {i: enc.count(s) for i, s in enumerate(texts)}
    assert got == want
    # frequent short words compress to single tokens
    assert got[2] <= len("mat cat the the".split()) + 1
