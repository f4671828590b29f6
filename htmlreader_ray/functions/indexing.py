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
    ids = group.column("doc_id").combine_chunks()
    sorted_ids = ids.take(pc.array_sort_indices(ids))
    term = group.column("term")[0]
    # comma-joined string postings: hashes identically on both sides of
    # the oracle regardless of list-type canonicalization. Built with
    # Arrow kernels (cast -> list wrap -> binary_join), never a Python
    # per-id loop.
    strs = pc.cast(sorted_ids, pa.string())
    lst = pa.ListArray.from_arrays(
        pa.array([0, len(strs)], pa.int32()), strs)
    postings = pc.binary_join(lst, ",")
    return pa.table({
        "term": pa.array([term.as_py()], pa.string()),
        "postings": postings,
        "df": pa.array([len(group)], pa.int64()),
    })


def _df_partials(batch: pa.Table) -> pa.Table:
    """Per-block (term, partial df) — the combiner: the df shuffle carries
    one row per (block, term), never one per (term, doc) pair."""
    g = batch.group_by("term").aggregate([([], "count_all")])
    return g.rename_columns(["term", "df"])


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   df_cap: int | None = None,
                   broadcast_max_hot: int = 2_000_000):
    """(term, postings, df): sorted unique doc_ids per term.

    (term, doc) pairs are distinct by construction — a document lives in
    exactly one block and ``_term_doc_rows`` dedups within the block —
    so df is an exact count and no global distinct pass is needed.

    ``df_cap`` is the scale guard: a stop-word-grade term's postings list
    is one row of O(corpus) ids no matter how the shuffle is arranged, so
    at scale the caller bounds it. Terms with df > df_cap skip postings
    materialization entirely (postings = NULL, exact df kept): their
    pairs are filtered out *before* the groupby via a broadcast of the
    (tiny) hot-term set, so no single group ever holds more than df_cap
    rows. df_cap=None (the oracle path) materializes everything.
    """
    import pyarrow.compute as pc

    import ray

    pairs = ds.map_batches(_term_doc_rows, fn_kwargs={
        "text_col": text_col, "id_col": id_col}, batch_format="pyarrow")
    parts = _narrow_partitions()

    if df_cap is None:
        return pairs.repartition(parts).groupby("term") \
            .map_groups(_postings_group, batch_format="pyarrow")

    pairs = pairs.materialize()  # feeds the df combiner AND the postings
    # groupby; at corpus scale trade this for a second tokenize pass if
    # object-store spill is worse than recompute
    from ray.data.aggregate import Sum
    df_tbl = pairs.map_batches(_df_partials, batch_format="pyarrow") \
        .repartition(parts).groupby("term").aggregate(Sum("df")) \
        .map_batches(lambda b: b.rename_columns(["term", "df"]),
                     batch_format="pyarrow")
    hot = df_tbl.filter(lambda r: r["df"] > df_cap).materialize()
    if hot.count() <= broadcast_max_hot:
        # groupby/filter output can carry zero-column empty blocks (the
        # dedup._scrub_empty_blocks pitfall) — drop them before concat
        hot_blocks = [t for t in (ray.get(r) for r in hot.to_arrow_refs())
                      if t.num_rows > 0]
        hot_terms = (pa.concat_tables(hot_blocks).column("term")
                     .combine_chunks() if hot_blocks
                     else pa.chunked_array([pa.array([], pa.string())]))
        hot_ref = ray.put(hot_terms)  # broadcast once, read per task

        def drop_hot(batch: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            if len(hs) == 0:
                return batch
            return batch.filter(
                pc.invert(pc.is_in(batch.column("term"), value_set=hs)))

        cold_pairs = pairs.map_batches(drop_hot, batch_format="pyarrow")
    else:
        # scale fallback: the hot set is the Zipf head (≤ n_tokens /
        # df_cap terms) — usually tiny, but it grows with the corpus
        # under a fixed absolute cap, so past the broadcast bound the
        # filter becomes a term-keyed anti join instead of a driver
        # round-trip (mirrors scoring.py's broadcast_max_vocab guard)
        cold_pairs = pairs.join(
            hot.select_columns(["term"]).repartition(parts),
            join_type="left_anti", num_partitions=parts, on=("term",))
    cold = cold_pairs.repartition(parts).groupby("term") \
        .map_groups(_postings_group, batch_format="pyarrow")

    def hot_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch.column("term"),
            "postings": pa.nulls(batch.num_rows, pa.string()),
            "df": batch.column("df"),
        })

    capped = hot.map_batches(hot_rows, batch_format="pyarrow")
    return cold.union(capped)


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
               min_count: int = 5, scale: int = PMI_SCALE,
               broadcast_max_vocab: int = 2_000_000):
    """(w1, w2, c, pmi_e3): top-K adjacent pairs by quantized PMI,
    ties broken by (w1, w2). Pairs rarer than ``min_count`` are dropped
    before the join (noise floor, and it bounds the scored set).

    Join strategy: when the unigram type table fits the broadcast bound
    it is ray.put ONCE and each bigram block scores via two vectorized
    ``index_in`` lookups — no shuffle at all on the scoring side. Past
    the bound (web-scale vocabularies) the original two hash joins run.
    Both paths share the same IEEE arithmetic, and the final top-K is
    block-local partials + one single-task merge instead of a global
    sort (scored rows per block >= top_k, so partials lose nothing)."""
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

    def _score_cols(batch: pa.Table, c1, c2) -> pa.Table:
        # elementwise floor(scale*ln((c12/t)/((c1/u)*(c2/u))) + 0.5) with
        # the exact IEEE op order of _pmi_int / the SQL oracle; pc.ln is
        # bit-identical to math.log here (same libm), pinned by
        # tests/test_indexing.py::test_pmi_ln_bit_parity
        f64 = pa.float64()
        c12 = pc.cast(batch.column("c"), f64)
        c1 = pc.cast(c1, f64)
        c2 = pc.cast(c2, f64)
        x = pc.divide(pc.divide(c12, pa.scalar(t_total)),
                      pc.multiply(pc.divide(c1, pa.scalar(u_total)),
                                  pc.divide(c2, pa.scalar(u_total))))
        pmi = pc.cast(
            pc.floor(pc.add(pc.multiply(pa.scalar(float(scale)), pc.ln(x)),
                            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "w1": batch.column("w1"), "w2": batch.column("w2"),
            "c": batch.column("c"), "pmi_e3": pmi})

    n_vocab = uni.count()
    if n_vocab <= broadcast_max_vocab:
        import ray
        blocks = [t for t in ray.get(uni.to_arrow_refs()) if t.num_rows]
        uni_tbl = (pa.concat_tables(blocks).combine_chunks() if blocks
                   else pa.table({"w": pa.array([], pa.string()),
                                  "n": pa.array([], pa.int64())}))
        uni_ref = ray.put(uni_tbl)

        def score_broadcast(batch: pa.Table) -> pa.Table:
            ut = ray.get(uni_ref)
            w, cnt = ut.column("w"), ut.column("n")
            i1 = pc.index_in(batch.column("w1"), value_set=w)
            i2 = pc.index_in(batch.column("w2"), value_set=w)
            # inner-join semantics: drop pairs whose word is absent
            # (cannot happen with the same tokenization, but stay exact)
            keep = pc.and_(i1.is_valid(), i2.is_valid())
            batch, i1, i2 = (batch.filter(keep), i1.filter(keep),
                             i2.filter(keep))
            return _score_cols(batch, pc.take(cnt, i1), pc.take(cnt, i2))

        scored = bi.map_batches(score_broadcast, batch_format="pyarrow")
    else:
        def rename_uni(name):
            def fn(b: pa.Table) -> pa.Table:
                return b.rename_columns(
                    [name if c == "w" else ("c_" + name[-1])
                     if c == "n" else c for c in b.column_names])
            return fn

        uni1 = uni.map_batches(rename_uni("w1"), batch_format="pyarrow")
        uni2 = uni.map_batches(rename_uni("w2"), batch_format="pyarrow")
        j = bi.repartition(parts).join(
            uni1.repartition(parts), join_type="inner",
            num_partitions=parts, on=("w1",), right_on=("w1",))
        j = j.repartition(parts).join(
            uni2.repartition(parts), join_type="inner",
            num_partitions=parts, on=("w2",), right_on=("w2",))
        scored = j.map_batches(
            lambda b: _score_cols(b, b.column("c_1"), b.column("c_2")),
            batch_format="pyarrow")

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[
            ("pmi_e3", "descending"), ("w1", "ascending"),
            ("w2", "ascending")])
        return batch.take(idx.slice(0, top_k))

    return scored.map_batches(local_topk, batch_format="pyarrow") \
        .repartition(1).map_batches(local_topk, batch_format="pyarrow")


def _doc_bigram_rows(batch: pa.Table, text_col: str,
                     id_col: str) -> pa.Table:
    """Block-local (doc_id, w1, w2, k) adjacent-pair partial counts —
    the per-document twin of _bigram_rows (same zero-copy shifted-view
    construction), pre-reduced per block so the score join moves
    (doc, bigram-type) rows, never raw token occurrences."""
    row_ids, words = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col).combine_chunks()
    empty = pa.table({id_col: pa.array([], ids.type),
                      "w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "k": pa.array([], pa.int64())})
    if len(words) < 2:
        return empty
    adjacent = pa.array(row_ids[1:] == row_ids[:-1])
    doc = ids.take(pa.array(row_ids[1:])).filter(adjacent)
    flat = pa.table({id_col: doc,
                     "w1": words.slice(0, len(words) - 1).filter(adjacent),
                     "w2": words.slice(1).filter(adjacent)})
    if flat.num_rows == 0:
        return empty
    g = flat.group_by([id_col, "w1", "w2"]).aggregate([([], "count_all")])
    return g.select([id_col, "w1", "w2", "count_all"]) \
        .rename_columns([id_col, "w1", "w2", "k"])


def bigram_surprisal(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     scale: int = 1000):
    """(doc_id, n_bigrams, bg_surprisal_e3): total corpus-bigram-LM
    surprisal per document in integer milli-nats, MLE conditional
    P(w2|w1) = c(w1,w2) / c(w1·) with c(w1·) the bigram-FIRST-position
    total (so the conditional normalizes exactly). The scoring corpus
    is the corpus itself, so every document bigram is in the model and
    there is no OOV branch. Documents with < 2 words emit no row (the
    SQL GROUP BY mirror).

    Scale shape: both the bigram and first-word tables are TYPE tables
    (bounded by distinct pairs, not tokens); the per-document side is
    block-pre-reduced (doc, w1, w2, k) partials. Scores attach via two
    narrow hash joins — the model is never broadcast — then one
    combiner groupby per document sums k and k·s in exact int64
    (the unigram_surprisal contract: floor(scale·−ln(c12/c1)+0.5),
    pc.ln ≡ libm ln, pinned by test_pmi_ln_bit_parity)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .shuffle import combine_aggregate

    parts = _narrow_partitions()

    bi = ds.map_batches(_bigram_rows, fn_kwargs={"text_col": text_col},
                        batch_format="pyarrow") \
        .repartition(parts).groupby(["w1", "w2"]).aggregate(Sum("c")) \
        .map_batches(lambda b: b.rename_columns(["w1", "w2", "c"]),
                     batch_format="pyarrow").materialize()
    c1 = bi.map_batches(
        lambda b: b.group_by("w1").aggregate([("c", "sum")])
        .rename_columns(["w1", "c1"]), batch_format="pyarrow") \
        .repartition(parts).groupby("w1").aggregate(Sum("c1")) \
        .map_batches(lambda b: b.rename_columns(["w1", "c1"]),
                     batch_format="pyarrow")

    def score_cols(b: pa.Table) -> pa.Table:
        f64 = pa.float64()
        ratio = pc.divide(pc.cast(b.column("c"), f64),
                          pc.cast(b.column("c1"), f64))
        s = pc.floor(pc.add(pc.multiply(
            pc.negate(pc.ln(ratio)), float(scale)), 0.5))
        return pa.Table.from_arrays(
            [b.column("w1"), b.column("w2"),
             pc.cast(s, pa.int64())], names=["w1", "w2", "s"])

    scores = bi.join(c1, "inner", parts, on=("w1",)) \
        .map_batches(score_cols, batch_format="pyarrow")

    occ = ds.map_batches(
        _doc_bigram_rows,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow")
    joined = occ.join(scores, "inner", parts, on=("w1", "w2"))

    def weight(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column(id_col), b.column("k"),
             pc.multiply(b.column("k"), b.column("s"))],
            names=[id_col, "k", "ks"])

    return combine_aggregate(
        joined.map_batches(weight, batch_format="pyarrow"), [id_col],
        [("k", "sum", "n_bigrams"), ("ks", "sum", "bg_surprisal_e3")])


def similarity_df_cap(n_docs: int, df_cap_den: int = 25,
                      abs_df_cap: int = 1024) -> int:
    """The doc_similarity_topk stop-word df cap: relative early (small
    corpora keep discriminative features), ABSOLUTE once saturated —
    constant in n_docs, so per-feature pair fan-out (cap²) is bounded
    by a constant at any corpus size. Pinned by test_plan_shape."""
    return max(2, min(n_docs // df_cap_den, abs_df_cap))


def doc_similarity_topk(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", scale: int = 1000,
                        top_k: int = 50, df_cap_den: int = 25,
                        abs_df_cap: int = 1024,
                        n_docs: int | None = None):
    """Sparse tf-idf document-similarity join over ADJACENT-BIGRAM
    features: top-K document pairs by the integer dot product of their
    quantized tf-idf vectors (sim_e6 = Σ_f s_a(f)·s_b(f), s = the
    top_tfidf score_e3 contract applied to bigram features — unigrams
    are too dense to discriminate on a small closed vocabulary, and at
    web scale the same argument picks shingles over words).

    Scale shape: features with df > min(n_docs // df_cap_den,
    abs_df_cap) are DROPPED before pairing (the stop-word fan-out
    guard — a feature shared by every document contributes O(n²) pairs
    and no discrimination; the same cap is applied by the SQL oracle,
    so the contract is exact, not approximate). The ABSOLUTE component
    matters at scale: a relative-only cap grows with the corpus, so at
    10⁹ docs a single hot feature could legally form a
    (n_docs/25)²-pair group; with abs_df_cap every feature group is
    ≤ abs_df_cap rows — pair fan-out per feature is bounded by a
    CONSTANT (abs_df_cap², ~0.5M pairs at the default), independent of
    n_docs, and the bound is deterministic (no sampling), so the SQL
    contract stays exact at every scale. tf·df attachment is a hash
    join partitioned on the feature — the df side scales with the
    corpus *vocabulary*, which must never transit the driver or be
    broadcast whole. Pair scores then flow through one combiner sum
    and a block-local + single-merge top-K — no global sort."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .scoring import _TfIdfScore

    parts = _narrow_partitions()
    if n_docs is None:
        # callers that know the corpus size (e.g. from parquet footer
        # metadata) pass it in and skip this full-dataset pass
        n_docs = ds.count()
    cap = similarity_df_cap(n_docs, df_cap_den, abs_df_cap)

    def _bigram_tf(batch: pa.Table) -> pa.Table:
        # (doc_id, w = "w1 w2", tf): per-doc adjacent-pair counts; a
        # document lives in one batch so the counts are final
        t = _doc_bigram_rows(batch, text_col, id_col)
        f = pc.binary_join_element_wise(t.column("w1"), t.column("w2"),
                                        " ")
        return pa.Table.from_arrays(
            [t.column(id_col), f, t.column("k")],
            names=["doc_id", "w", "tf"])

    def _bigram_df(batch: pa.Table) -> pa.Table:
        # tf rows are unique per (doc, feature): df partial = count
        g = batch.group_by("w").aggregate([([], "count_all")])
        return g.select(["w", "count_all"]).rename_columns(["w", "df"])

    tf = ds.map_batches(_bigram_tf, batch_format="pyarrow")
    df = tf.map_batches(_bigram_df, batch_format="pyarrow") \
        .repartition(parts).groupby("w").aggregate(Sum("df")) \
        .map_batches(lambda b: b.rename_columns(["w", "df"]),
                     batch_format="pyarrow")
    df = df.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("df"),
                                         pa.scalar(cap))),
        batch_format="pyarrow")

    # tf ⋈ df hash-partitioned on the feature: the surviving-feature df
    # table scales with the corpus VOCABULARY, so it must never be
    # collected to the driver or ray.put-broadcast whole (the round-4
    # scale flaw). Only the df side is repartitioned first: its
    # post-filter blocks can be empty and need coalescing before Acero
    # (see dedup._scrub_empty_blocks), while the corpus-scale tf side
    # comes straight from map_batches with its schema intact — an extra
    # all-to-all there would double-shuffle the big side for nothing.
    joined = tf.join(
        df.repartition(parts), join_type="inner",
        num_partitions=parts, on=("w",), right_on=("w",))
    scored = joined.map_batches(_TfIdfScore(n_docs, scale),
                                batch_format="pyarrow")

    def pair_group(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "p": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s = group.column("score_e3").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="mergesort")
        d, s = d[order], s[order]
        i, j = np.triu_indices(len(d), k=1)
        return pa.table({"doc_a": d[i], "doc_b": d[j], "p": s[i] * s[j]})

    pairs = scored.repartition(parts).groupby("term") \
        .map_groups(pair_group, batch_format="pyarrow")
    sims = pairs.repartition(parts).groupby(["doc_a", "doc_b"]) \
        .aggregate(Sum("p")) \
        .map_batches(lambda b: b.rename_columns(
            ["doc_a", "doc_b", "sim_e6"]), batch_format="pyarrow")

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[
            ("sim_e6", "descending"), ("doc_a", "ascending"),
            ("doc_b", "ascending")])
        return batch.take(idx.slice(0, min(top_k, len(idx))))

    return sims.map_batches(local_topk, batch_format="pyarrow") \
        .repartition(1).map_batches(local_topk, batch_format="pyarrow")
