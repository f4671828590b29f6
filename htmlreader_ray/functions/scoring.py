"""Corpus-statistics document scoring: unigram-LM surprisal and tf-idf.

Two classic two-pass quality-scoring operators a 100 TB training-data
pipeline needs (the reference engine has no analogue — these extend the
SURVEY.md §2 training-data rows; cf. the CCNet/Gopher quality filters):

- ``unigram_surprisal``: train a unigram language model on the corpus
  itself (one distributed word-count aggregate), broadcast the bounded
  top-K vocabulary once via ``ray.put``, and score every document in a
  single streaming pass — the "LM quality" proxy filter with the corpus
  as its own model. The broadcast is bounded by ``top_k`` (vocabulary
  TYPES, not tokens), never by corpus size; everything beyond the cap
  scores as out-of-vocabulary.

- ``top_tfidf``: each document's most distinctive term by tf-idf. The
  document-frequency table is vocabulary-sized but unbounded in
  principle, so it is NOT broadcast: (doc, word, tf) joins (word, df)
  in a distributed hash join partitioned on the word, a block-local
  argmax shrinks the per-doc exchange to O(blocks x docs-per-block),
  and a final groupby(doc_id) picks the winner.

Float discipline (same doctrine as ``quality_scores`` and the sketch
oracles): every per-word score is quantized to int64 via
``floor(scale * x + 0.5)`` — away-from-zero for the non-negative x here,
identical in DuckDB and Python — computed from an expression tree the
SQL oracle reproduces verbatim. ``ln()`` is bit-identical between
libm (Python ``math.log``) and DuckDB on this platform (verified) and
division is IEEE-exact, so the quantized integers match exactly; all
cross-row aggregation (sums, maxes) then happens in integers where
evaluation order cannot matter.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

from .text import _split_words_flat

DEFAULT_SCALE = 1000
DEFAULT_TOP_K = 65536


def _narrow_partitions() -> int:
    from .dedup import _default_join_partitions
    return _default_join_partitions()


def word_counts(ds, *, text_col: str = "text"):
    """Distributed (w, n) token counts: block-local Arrow group_by partials
    (one row per block x distinct word leaves each task), then one narrow
    groupby over the partials."""
    def partial(batch: pa.Table) -> pa.Table:
        _, words = _split_words_flat(batch.column(text_col))
        t = pa.table({"w": words})
        g = t.group_by("w").aggregate([([], "count_all")])
        return g.select(["w", "count_all"]).rename_columns(["w", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    agg = parts.repartition(_narrow_partitions()).groupby("w") \
        .aggregate(Sum("n"))
    return agg.map_batches(lambda b: b.rename_columns(["w", "n"]),
                           batch_format="pyarrow")


def _surprisal_int(c: float, t: float, scale: int) -> int:
    # mirrored verbatim by the SQL oracle:
    #   CAST(floor(scale * -ln(c / t) + 0.5) AS BIGINT)
    return math.floor(scale * -math.log(c / t) + 0.5)


class _ScoreDocs:
    """Per-worker cached scorer: vocab fetched from plasma once per worker
    process (task_cache keyed on the ObjectRef) as an Arrow value_set +
    int64 score vector; per-batch work is one index_in + two bincounts.
    Integer surprisals summed as float64 bincount weights stay exact far
    beyond any real document (< 2^53)."""

    def __init__(self, ref, text_col: str, id_col: str,
                 keep_cols: tuple = ()):
        import numpy as np
        import ray
        vocab, self.s_oov = ray.get(ref)
        self.keys = pa.array(list(vocab.keys()), pa.string())
        self.vals = np.fromiter(vocab.values(), dtype=np.int64,
                                count=len(vocab))
        self.text_col = text_col
        self.id_col = id_col
        self.keep_cols = tuple(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        row_ids, words = _split_words_flat(batch.column(self.text_col))
        n = len(batch)
        idx = pc.index_in(words, value_set=self.keys) \
            .to_numpy(zero_copy_only=False)
        oov = np.isnan(idx) if idx.dtype.kind == "f" else (idx < 0)
        safe = np.where(oov, 0, idx).astype(np.int64)
        scores = np.where(oov, self.s_oov,
                          self.vals[safe] if len(self.vals) else 0)
        n_words = np.bincount(row_ids, minlength=n).astype(np.int64)
        total = np.bincount(row_ids, weights=scores.astype(np.float64),
                            minlength=n).astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column(self.id_col),
             pa.array(n_words, pa.int64()),
             pa.array(total, pa.int64())]
            + [batch.column(c) for c in self.keep_cols],
            names=[self.id_col, "n_words", "surprisal_e3",
                   *self.keep_cols])


def unigram_surprisal(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      top_k: int = DEFAULT_TOP_K, scale: int = DEFAULT_SCALE,
                      keep_cols: tuple = ()):
    """(doc_id, n_words, surprisal_e3, *keep_cols): total corpus-unigram
    surprisal per document in integer milli-nats. Empty documents score
    (0, 0). ``keep_cols`` are carried through unchanged."""
    import ray

    counts = word_counts(ds, text_col=text_col).materialize()  # vocab-sized
    total_tokens = counts.sum("n") or 0
    t = float(total_tokens)
    vocab_rows = counts.sort(["n", "w"], descending=[True, False]) \
        .limit(top_k).take_all()
    vocab = {r["w"]: _surprisal_int(float(r["n"]), t, scale)
             for r in vocab_rows}
    s_oov = _surprisal_int(0.5, t, scale) if total_tokens else 0
    ref = ray.put((vocab, s_oov))

    from ..stages.task_cache import as_task
    return ds.map_batches(
        as_task(_ScoreDocs, ref=ref, text_col=text_col, id_col=id_col,
                keep_cols=tuple(keep_cols)),
        batch_format="pyarrow")


# ------------------------------------------------------------------ tf-idf

def _tf_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, w, tf) term-frequency rows via one Arrow group_by."""
    row_ids, words = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col).take(pa.array(row_ids, pa.int64()))
    flat = pa.table({"doc_id": ids, "w": words})
    g = flat.group_by(["doc_id", "w"]).aggregate([([], "count_all")])
    return g.select(["doc_id", "w", "count_all"]) \
        .rename_columns(["doc_id", "w", "tf"])


def _df_rows(batch: pa.Table, text_col: str) -> pa.Table:
    """(w, df-partial) rows: each word counted once per document."""
    row_ids, words = _split_words_flat(batch.column(text_col))
    flat = pa.table({"row": pa.array(row_ids, pa.int64()), "w": words})
    distinct = flat.group_by(["row", "w"]).aggregate([])
    g = distinct.group_by("w").aggregate([([], "count_all")])
    return g.select(["w", "count_all"]).rename_columns(["w", "df"])


class _TfIdfScore:
    def __init__(self, n_docs: int, scale: int):
        self.n = float(n_docs)
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        # mirrored verbatim by the SQL oracle:
        #   CAST(floor(scale * (CAST(tf AS DOUBLE)
        #                       * ln(n_docs / CAST(df AS DOUBLE))) + 0.5)
        #        AS BIGINT)
        # ln() evaluates through math.log per DISTINCT df (libm, the
        # bit-parity anchor — numpy's SIMD log is not guaranteed
        # ulp-identical); the multiply/floor are IEEE-exact vector ops.
        import numpy as np
        n, scale = self.n, self.scale
        tf = batch.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        df = batch.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(df, return_inverse=True)
        idf = np.array([math.log(n / float(d)) for d in uniq], np.float64)
        scores = np.floor(scale * (tf * idf[inv]) + 0.5).astype(np.int64)
        out = batch.select(["doc_id", "w"]).rename_columns(["doc_id", "term"])
        return out.append_column("score_e3", pa.array(scores, pa.int64()))


def _argmax_block(batch: pa.Table) -> pa.Table:
    """Block-local (doc_id, term, score_e3) winner per doc: shrinks the
    per-doc shuffle from one row per (doc, word) to one per (block, doc)."""
    if len(batch) == 0:
        return batch
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[
        ("doc_id", "ascending"), ("score_e3", "descending"),
        ("term", "ascending")])
    srt = batch.take(idx)
    import numpy as np
    ids = srt.column("doc_id").to_numpy(zero_copy_only=False)
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]
    return srt.filter(pa.array(keep))


def _argmax_group(batch: pa.Table) -> pa.Table:
    return _argmax_block(batch)


def top_tfidf(ds, *, text_col: str = "text", id_col: str = "doc_id",
              scale: int = DEFAULT_SCALE,
              broadcast_max_vocab: int = 2_000_000):
    """(doc_id, term, score_e3): each document's highest-tf-idf term,
    ties broken lexicographically. Documents with no words are absent.

    Distributed end to end: df via partial-count combiner; tf x df via
    a ray.put broadcast of the df type table + vectorized index_in
    lookups when the vocabulary is bounded (the common case — no
    shuffle touches the corpus-scale tf rows), falling back to a hash
    join partitioned on the word past ``broadcast_max_vocab``; then a
    two-level argmax (block-local partials, one groupby(doc_id))."""
    from ray.data.aggregate import Sum

    n_docs = ds.count()
    parts = _narrow_partitions()

    tf = ds.map_batches(_tf_rows, fn_kwargs={
        "text_col": text_col, "id_col": id_col}, batch_format="pyarrow")
    df_parts = ds.map_batches(_df_rows, fn_kwargs={"text_col": text_col},
                              batch_format="pyarrow")
    df = df_parts.repartition(parts).groupby("w").aggregate(Sum("df")) \
        .map_batches(lambda b: b.rename_columns(["w", "df"]),
                     batch_format="pyarrow").materialize()

    if df.count() <= broadcast_max_vocab:
        import ray
        blocks = [t for t in ray.get(df.to_arrow_refs()) if t.num_rows]
        df_tbl = (pa.concat_tables(blocks).combine_chunks() if blocks
                  else pa.table({"w": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())}))
        df_ref = ray.put(df_tbl)
        score_fn = _TfIdfScore(n_docs, scale)

        def score_broadcast(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            dt = ray.get(df_ref)
            idx = pc.index_in(batch.column("w"), value_set=dt.column("w"))
            keep = idx.is_valid()   # inner-join semantics
            batch, idx = batch.filter(keep), idx.filter(keep)
            return score_fn(batch.append_column(
                "df", pc.take(dt.column("df"), idx)))

        scored = tf.map_batches(score_broadcast, batch_format="pyarrow")
    else:
        # repartition both sides: groupby/map_batches output can carry
        # zero-column empty blocks that poison Acero hash joins (see
        # dedup._scrub_empty_blocks)
        joined = tf.repartition(parts).join(
            df.repartition(parts), join_type="inner",
            num_partitions=parts, on=("w",), right_on=("w",))
        scored = joined.map_batches(_TfIdfScore(n_docs, scale),
                                    batch_format="pyarrow")

    partials = scored.map_batches(_argmax_block, batch_format="pyarrow")
    return partials.repartition(parts).groupby(id_col) \
        .map_groups(_argmax_group, batch_format="pyarrow")


# ------------------------------------------------------------------ BM25

def _tf_dl_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, w, tf, dl) rows: term frequency plus the document length
    (total words) — dl is exact block-locally because a document never
    splits across blocks."""
    row_ids, words = _split_words_flat(batch.column(text_col))
    ids = batch.column(id_col).take(pa.array(row_ids, pa.int64()))
    flat = pa.table({"doc_id": ids, "w": words})
    g = flat.group_by(["doc_id", "w"]).aggregate([([], "count_all")])
    tf_tbl = g.select(["doc_id", "w", "count_all"]) \
        .rename_columns(["doc_id", "w", "tf"])
    dl = flat.group_by("doc_id").aggregate([([], "count_all")]) \
        .select(["doc_id", "count_all"]).rename_columns(["doc_id", "dl"])
    idx = pc.index_in(tf_tbl.column("doc_id"),
                      value_set=dl.column("doc_id").combine_chunks())
    return tf_tbl.append_column(
        "dl", pc.cast(pc.take(dl.column("dl"), idx), pa.int64()))


class _BM25Score:
    """Okapi BM25 per (doc, term), quantized to int64 milli-points with
    the floor(scale*x + 0.5) contract. Every float expression below is
    mirrored VERBATIM (same literals, same parenthesization, libm ln per
    distinct df) by the SQL oracle, so the integers match bit-for-bit:

        avgdl = tw / nd                       (both DOUBLE casts of counts)
        idf   = ln(((nd - df) + 0.5) / (df + 0.5) + 1.0)
        norm  = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
        score = floor(scale * (idf * ((tf * (k1 + 1.0)) / norm)) + 0.5)
    """

    def __init__(self, n_docs: int, total_words: int, scale: int,
                 k1: float = 1.2, b: float = 0.75):
        self.nd = float(n_docs)
        self.avgdl = float(total_words) / float(n_docs)
        self.scale, self.k1, self.b = scale, k1, b

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        nd, avgdl = self.nd, self.avgdl
        scale, k1, b = self.scale, self.k1, self.b
        tf = batch.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        df = batch.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(df, return_inverse=True)
        idf = np.array(
            [math.log(((nd - float(d)) + 0.5) / (float(d) + 0.5) + 1.0)
             for d in uniq], np.float64)
        norm = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
        scores = np.floor(
            scale * (idf[inv] * ((tf * (k1 + 1.0)) / norm)) + 0.5
        ).astype(np.int64)
        out = batch.select(["doc_id", "w"]) \
            .rename_columns(["doc_id", "term"])
        return out.append_column("score_e3", pa.array(scores, pa.int64()))


def top_bm25(ds, *, text_col: str = "text", id_col: str = "doc_id",
             scale: int = DEFAULT_SCALE, k1: float = 1.2, b: float = 0.75,
             broadcast_max_vocab: int = 2_000_000):
    """(doc_id, term, score_e3): each document's highest-BM25 term, ties
    broken lexicographically; documents with no words are absent.

    Same plan discipline as ``top_tfidf`` — df via the partial-count
    combiner; two corpus-global scalars (doc count, total word count)
    from streaming aggregates; the df table broadcast once via ray.put
    when the vocabulary is bounded, hash-joined on the word otherwise;
    then the two-level argmax. The tf rows additionally carry dl
    (block-exact, documents never split), so no per-doc length join is
    needed."""
    from ray.data.aggregate import Sum

    n_docs = ds.count()
    parts = _narrow_partitions()

    def _wc(batch: pa.Table) -> pa.Table:
        _, words = _split_words_flat(batch.column(text_col))
        return pa.table({"c": pa.array([len(words)], pa.int64())})

    total_words = int(ds.map_batches(
        _wc, batch_format="pyarrow").sum("c") or 0)

    tf = ds.map_batches(_tf_dl_rows, fn_kwargs={
        "text_col": text_col, "id_col": id_col}, batch_format="pyarrow")
    df_parts = ds.map_batches(_df_rows, fn_kwargs={"text_col": text_col},
                              batch_format="pyarrow")
    df = df_parts.repartition(parts).groupby("w").aggregate(Sum("df")) \
        .map_batches(lambda b: b.rename_columns(["w", "df"]),
                     batch_format="pyarrow").materialize()

    score_fn = _BM25Score(n_docs, total_words, scale, k1, b)
    if df.count() <= broadcast_max_vocab:
        import ray
        blocks = [t for t in ray.get(df.to_arrow_refs()) if t.num_rows]
        df_tbl = (pa.concat_tables(blocks).combine_chunks() if blocks
                  else pa.table({"w": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())}))
        df_ref = ray.put(df_tbl)

        def score_broadcast(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            dt = ray.get(df_ref)
            idx = pc.index_in(batch.column("w"), value_set=dt.column("w"))
            keep = idx.is_valid()
            batch, idx = batch.filter(keep), idx.filter(keep)
            return score_fn(batch.append_column(
                "df", pc.take(dt.column("df"), idx)))

        scored = tf.map_batches(score_broadcast, batch_format="pyarrow")
    else:
        joined = tf.repartition(parts).join(
            df.repartition(parts), join_type="inner",
            num_partitions=parts, on=("w",), right_on=("w",))
        scored = joined.map_batches(score_fn, batch_format="pyarrow")

    partials = scored.map_batches(_argmax_block, batch_format="pyarrow")
    return partials.repartition(parts).groupby(id_col) \
        .map_groups(_argmax_group, batch_format="pyarrow")


# ----------------------------------------------------------------- DSIR

DSIR_BUCKETS = 64


class _BucketCounts:
    """Per-batch hashed-unigram bucket counts: md5-first-byte % B per
    DISTINCT word (md5 cached per worker), scattered to per-row counts
    with one bincount. Emits (bucket, n) partials — the combiner input."""

    def __init__(self, text_col: str = "text", buckets: int = DSIR_BUCKETS,
                 mask_fn=None) -> None:
        self.text_col = text_col
        self.buckets = buckets
        self.mask_fn = mask_fn          # batch -> BooleanArray (target rows)
        self._cache: dict = {}

    def _buckets_of(self, words) -> "object":
        import hashlib

        import numpy as np
        uniq = pc.unique(words)
        cache = self._cache
        vals = np.empty(len(uniq), dtype=np.int64)
        for i, w in enumerate(uniq.to_pylist()):
            b = cache.get(w)
            if b is None:
                b = cache[w] = hashlib.md5(
                    w.encode("utf-8")).digest()[0] % self.buckets
            vals[i] = b
        idx = pc.index_in(words, value_set=uniq).to_numpy(
            zero_copy_only=False)
        return vals[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        col = batch.column(self.text_col)
        if self.mask_fn is not None:
            batch = batch.filter(self.mask_fn(batch))
            col = batch.column(self.text_col)
        _, words = _split_words_flat(pc.utf8_lower(col.combine_chunks()
                     if isinstance(col, pa.ChunkedArray) else col))
        if len(words) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        counts = np.bincount(self._buckets_of(words),
                             minlength=self.buckets)
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})


def _iq_ln(x: float, scale: int = 1000) -> int:
    # same int-quantized ln contract as unigram_surprisal: libm ln,
    # IEEE multiply, floor(+0.5) — bit-parity with DuckDB pinned by
    # tests/test_scoring.py
    return math.floor(scale * math.log(x) + 0.5)


def dsir_weights(ds, *, target_mask_fn, text_col: str = "text",
                 id_col: str = "doc_id", buckets: int = DSIR_BUCKETS):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): hashed
    unigram features into ``buckets``, Laplace-smoothed bucket models
    for the TARGET subset (rows where ``target_mask_fn`` is true) and
    the full corpus, then per-document

        dsir_e3 = sum over word occurrences of
                  iq_ln((p_b+1)/(P+B)) - iq_ln((q_b+1)/(Q+B))

    with iq_ln(x) = floor(1000*ln(x) + 0.5). Integer after the per-
    bucket quantization, so the result is summation-order independent
    and SQL-replayable exactly.

    Scale shape: two combiner passes produce the two B-row count
    tables (driver-side take of <= B rows each); the scoring pass
    streams with a broadcast int weight vector of length B. Documents
    with no words are absent (mirrors the SQL group-by)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def _counts(mask_fn):
        parts = ds.map_batches(
            _BucketCounts(text_col=text_col, buckets=buckets,
                          mask_fn=mask_fn), batch_format="pyarrow")
        agg = parts.repartition(4).groupby("bucket").aggregate(Sum("n"))
        rows = agg.take_all()
        out = {}
        for r in rows:
            if r.get("bucket") is not None:
                out[int(r["bucket"])] = int(r["sum(n)"])
        return out

    q_counts = _counts(None)
    p_counts = _counts(target_mask_fn)
    q_total = sum(q_counts.values())
    p_total = sum(p_counts.values())

    wt = np.zeros(buckets, dtype=np.int64)
    for b in q_counts:              # doc words only hit corpus buckets
        wt[b] = (_iq_ln((p_counts.get(b, 0) + 1.0) / (p_total + buckets))
                 - _iq_ln((q_counts[b] + 1.0) / (q_total + buckets)))

    bc = _BucketCounts(text_col=text_col, buckets=buckets)

    def score(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        row_ids, words = _split_words_flat(
            pc.utf8_lower(col.combine_chunks()
                     if isinstance(col, pa.ChunkedArray) else col))
        ids = batch.column(id_col)
        if len(words) == 0:
            return pa.table({id_col: pa.array([], ids.type),
                             "dsir_e3": pa.array([], pa.int64())})
        w_per_word = wt[bc._buckets_of(words)]
        sums = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(sums, row_ids, w_per_word)
        has_words = np.zeros(batch.num_rows, dtype=bool)
        has_words[row_ids] = True
        keep = np.nonzero(has_words)[0]
        return pa.table({id_col: pc.take(ids, pa.array(keep)),
                         "dsir_e3": pa.array(sums[keep], pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")
