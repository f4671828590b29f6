"""Vectorized decontamination kernel (functions/curation.py) vs a naive
per-row reference, including whitespace edge cases."""

import pyarrow as pa
import pytest

from htmlreader_ray.functions.curation import (decontaminate,
                                               distinct_grams_batch)


def naive_grams(text: str, n: int) -> set:
    w = [x for x in text.split() if x]
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


TEXTS = [
    "a b c d e",
    "a b c a b c",
    "",
    "   ",
    "one",
    "two words",
    "tab\tsep\nand  double  space edges ",
    "a b c d e",  # duplicate doc text, distinct id
]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_distinct_grams_matches_naive(n):
    batch = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    out = distinct_grams_batch(batch, n=n)
    got: dict[int, set] = {}
    for i, g in zip(out.column("doc_id").to_pylist(),
                    out.column("gram").to_pylist()):
        got.setdefault(i, set()).add(g)
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == naive_grams(t, n), (i, t)
    # distinctness: no (doc, gram) repeats
    pairs = list(zip(out.column("doc_id").to_pylist(),
                     out.column("gram").to_pylist()))
    assert len(pairs) == len(set(pairs))


def test_distinct_grams_empty_batch():
    batch = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = distinct_grams_batch(batch, n=3)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "gram"]


def test_decontaminate_counts_distinct_shared(ray_session):
    import ray.data
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["x y z q r",          # shares 'x y z' once
                 "x y z x y z",        # same gram repeated: counts once
                 "unrelated words here entirely",
                 "p q r s t x y"],     # no full shared trigram
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["x y z w"],  # grams: 'x y z', 'y z w'
    }))
    out = decontaminate(corpus, bench, n=3)
    rows = {r["doc_id"]: r["n_shared"] for r in out.take_all()}
    assert rows == {1: 1, 2: 1}


def test_grams_pos_batch_positions():
    import pyarrow as pa
    from htmlreader_ray.functions.curation import grams_pos_batch
    batch = pa.table({"doc_id": [0, 1, 2], "text":
                      ["a b c d", "x y", " p  q r "]})
    out = grams_pos_batch(batch, n=3)
    rows = sorted(zip(out.column("doc_id").to_pylist(),
                      out.column("pos").to_pylist(),
                      out.column("gram").to_pylist()))
    # doc 1 has only 2 words -> no 3-grams; positions are word offsets
    assert rows == [(0, 0, "a b c"), (0, 1, "b c d"), (2, 0, "p q r")]


def test_duplicated_spans_matches_naive(ray_session):
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.curation import duplicated_spans
    texts = ["a b c d e", "z z a b c", "q r s", "a b c"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    out = {r["doc_id"]: (r["n_dup_grams"], r["dup_positions"])
           for r in duplicated_spans(ds, n=3).take_all()}
    # "a b c" appears in docs 0, 1, 3 -> duplicated; everything else unique
    assert out == {0: (1, "0"), 1: (1, "2"), 3: (1, "0")}
