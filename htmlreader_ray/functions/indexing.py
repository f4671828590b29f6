"""Corpus indexing primitives: inverted index and bigram PMI statistics.

- ``inverted_index``: term -> sorted postings list (+ document frequency),
  the search-engine sink a corpus engine feeds. Block-local distinct
  (term, doc) pairs shrink the shuffle to one row per block x term; one
  groupby(term) merges postings. Postings lists are per-term, so group
  sizes are bounded by document frequency — a stop-word-grade hot term
  makes a long (but single-column, int64) list, not a pair explosion.

- ``bigram_pmi``: top-K adjacent word pairs by pointwise mutual
  information. Bigram and unigram counts are combiner aggregates; the
  unigram table joins back on each side of the bigram (distributed hash
  joins — the vocabulary is never broadcast), PMI quantizes to int64
  milli-nats via the same floor(scale*x + 0.5) contract as
  functions/scoring.py (ln/IEEE-division bit-parity with DuckDB), and
  the bounded top-K resolves with a sort-limit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .text import _split_words_flat

PMI_SCALE = 1000


def _narrow_partitions() -> int:
    from .dedup import _default_join_partitions
    return _default_join_partitions()


def _term_doc_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    row_ids, words = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col).take(pa.array(row_ids, pa.int64()))
    flat = pa.table({"term": words, "doc_id": ids})
    return flat.group_by(["term", "doc_id"]).aggregate([])


def _postings_group(group: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    docs = pc.array_sort_indices(group.column("doc_id"))
    sorted_ids = group.column("doc_id").take(docs)
    term = group.column("term")[0]
    # comma-joined string postings: hashes identically on both sides of
    # the oracle regardless of list-type canonicalization
    postings = ",".join(str(i) for i in sorted_ids.to_pylist())
    return pa.table({
        "term": pa.array([term.as_py()], pa.string()),
        "postings": pa.array([postings], pa.string()),
        "df": pa.array([len(group)], pa.int64()),
    })


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(term, postings, df): sorted unique doc_ids per term."""
    pairs = ds.map_batches(_term_doc_rows, fn_kwargs={
        "text_col": text_col, "id_col": id_col}, batch_format="pyarrow")
    return pairs.repartition(_narrow_partitions()).groupby("term") \
        .map_groups(_postings_group, batch_format="pyarrow")


# ---------------------------------------------------------------- PMI

def _bigram_rows(batch: pa.Table, text_col: str) -> pa.Table:
    """Block-local (w1, w2, c) adjacent-pair partial counts — all-Arrow:
    the two shifted views are zero-copy slices filtered by the
    same-document mask, never Python lists."""
    row_ids, words = _split_words_flat(batch.column(text_col))
    if len(words) < 2:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    adjacent = pa.array(row_ids[1:] == row_ids[:-1])
    flat = pa.table({"w1": words.slice(0, len(words) - 1).filter(adjacent),
                     "w2": words.slice(1).filter(adjacent)})
    g = flat.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return g.select(["w1", "w2", "count_all"]) \
        .rename_columns(["w1", "w2", "c"])


def _pmi_int(c12: float, t: float, c1: float, c2: float, u: float,
             scale: int) -> int:
    # mirrored verbatim by the SQL oracle:
    #   floor(scale * ln((c12 / t) / ((c1 / u) * (c2 / u))) + 0.5)
    # (floor, not floor(+0.5)-of-abs: PMI can be negative, and
    #  floor(x + 0.5) is well-defined and identical in DuckDB there too)
    return math.floor(scale * math.log((c12 / t) / ((c1 / u) * (c2 / u)))
                      + 0.5)


def bigram_pmi(ds, *, text_col: str = "text", top_k: int = 50,
               min_count: int = 5, scale: int = PMI_SCALE):
    """(w1, w2, c, pmi_e3): top-K adjacent pairs by quantized PMI,
    ties broken by (w1, w2). Pairs rarer than ``min_count`` are dropped
    before the join (noise floor, and it bounds the scored set)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .scoring import word_counts

    parts = _narrow_partitions()

    uni = word_counts(ds, text_col=text_col).materialize()  # vocab-sized
    u_total = float(uni.sum("n") or 0)

    bi_parts = ds.map_batches(_bigram_rows, fn_kwargs={"text_col": text_col},
                              batch_format="pyarrow")
    # materialized once: the bigram TYPE table (bounded by distinct
    # adjacent pairs, not corpus tokens) feeds both the total and the join
    bi = bi_parts.repartition(parts).groupby(["w1", "w2"]) \
        .aggregate(Sum("c")) \
        .map_batches(lambda b: b.rename_columns(["w1", "w2", "c"]),
                     batch_format="pyarrow").materialize()
    t_total = float(bi.sum("c") or 0)

    def above_floor(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("c"),
                                             pa.scalar(min_count)))

    bi = bi.map_batches(above_floor, batch_format="pyarrow")

    def rename_uni(name):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [name if c == "w" else ("c_" + name[-1]) if c == "n" else c
                 for c in b.column_names])
        return fn

    uni1 = uni.map_batches(rename_uni("w1"), batch_format="pyarrow")
    uni2 = uni.map_batches(rename_uni("w2"), batch_format="pyarrow")
    j = bi.repartition(parts).join(uni1.repartition(parts),
                                   join_type="inner", num_partitions=parts,
                                   on=("w1",), right_on=("w1",))
    j = j.repartition(parts).join(uni2.repartition(parts),
                                  join_type="inner", num_partitions=parts,
                                  on=("w2",), right_on=("w2",))

    def score(batch: pa.Table) -> pa.Table:
        c12 = batch.column("c").to_pylist()
        c1 = batch.column("c_1").to_pylist()
        c2 = batch.column("c_2").to_pylist()
        pmi = [_pmi_int(float(a), t_total, float(b), float(d), u_total,
                        scale)
               for a, b, d in zip(c12, c1, c2)]
        return pa.table({
            "w1": batch.column("w1"), "w2": batch.column("w2"),
            "c": batch.column("c"),
            "pmi_e3": pa.array(pmi, pa.int64())})

    scored = j.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi_e3", "w1", "w2"],
                       descending=[True, False, False]).limit(top_k)
