"""Byte-pair-encoding tokenizer: corpus-learned merges + distributed
counting (the real implementation behind the ``token_count_bpe`` query).

Layout follows the classic BPE algorithm (Sennrich et al. 2016) with a
GPT-2-style regex pre-tokenizer:

1. ``word_counts_dataset``: distributed word-frequency table — per-batch
   partial counts (arrow group_by inside map_batches, the combiner
   pattern) then one small groupby(word).sum. Only (word, count) rows
   shuffle, bounded by vocabulary size, and the driver materializes at
   most ``max_vocab`` rows (sort + limit happens in the dataset).
2. ``learn_bpe``: deterministic merge learning on the (small) vocab —
   most-frequent adjacent symbol pair first, ties broken lexicographically.
3. ``BpeTokenCount``: map_batches stage; the merge ranks are broadcast
   once via ray.put and turned into a per-worker encoder with a token
   cache (built in __init__, used per batch).

At 100 TB the only driver-side object is the capped vocabulary (step 1's
limit) and the merge table — both O(vocab), independent of corpus size.
"""

from __future__ import annotations

import re

import pyarrow as pa

# GPT-2-flavoured pre-tokenizer (ASCII classes; the corpus is ASCII):
# contractions, space-prefixed letter runs, digit runs, punctuation runs,
# then residual whitespace
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)"
    r"|\s+")


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for sym, freq in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple:
    a, b = pair
    out = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe(word_counts: list[tuple[str, int]],
              n_merges: int = 200) -> list[tuple[str, str]]:
    """Deterministic BPE merge learning over a (word, count) vocabulary.
    Tie-break: highest count first, then lexicographically smallest pair —
    so every worker/rerun derives the identical merge table."""
    vocab = {tuple(w): c for w, c in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        vocab = {_merge_word(s, best): c for s, c in vocab.items()}
    return merges


class BpeEncoder:
    """Greedy lowest-rank-first BPE application with a per-instance cache
    (one instance per worker; the cache amortizes repeated tokens)."""

    def __init__(self, merges: list[tuple[str, str]]) -> None:
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def n_pieces(self, token: str) -> int:
        hit = self.cache.get(token)
        if hit is not None:
            return hit
        sym = tuple(token)
        while len(sym) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_pair = (sym[i], sym[i + 1])
            if best_pair is None:
                break
            sym = _merge_word(sym, best_pair)
        n = len(sym)
        if len(self.cache) < 200_000:
            self.cache[token] = n
        return n

    def count(self, text: str) -> int:
        return sum(self.n_pieces(t) for t in pretokenize(text))


def word_counts_dataset(ds, *, text_col: str = "text",
                        max_vocab: int = 65536):
    """Distributed (word, cnt) frequency table capped to the top
    ``max_vocab`` words (pre-tokenizer words, lowercased never — BPE is
    case-sensitive). The cap bounds what the driver ever materializes."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch.column(text_col).to_pylist():
            words.extend(w for w in pretokenize(t or "") if not w.isspace())
        if not words:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["word", "cnt"])
        wt = pa.Table.from_arrays([pa.array(words, pa.string())],
                                  names=["word"])
        g = wt.group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "cnt"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("cnt")))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["word", "cnt"])

    out = agg.map_batches(rename, batch_format="pyarrow")
    return out.sort(key=["cnt", "word"],
                    descending=[True, False]).limit(max_vocab)


def learn_bpe_from_dataset(ds, *, text_col: str = "text",
                           n_merges: int = 200,
                           max_vocab: int = 65536) -> list[tuple[str, str]]:
    rows = word_counts_dataset(ds, text_col=text_col,
                               max_vocab=max_vocab).take_all()
    return learn_bpe([(r["word"], r["cnt"]) for r in rows],
                     n_merges=n_merges)


class BpeTokenCount:
    """map_batches stage: (id, text) -> (id, n_tokens_bpe). The merge
    table is broadcast once (ray.put) and the encoder+cache built per
    worker in __init__."""

    def __init__(self, merges_ref, *, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        import ray
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.enc = BpeEncoder(merges)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = [self.enc.count(t or "") for t in texts]
        return pa.Table.from_arrays(
            [batch.column(self.id_col), pa.array(counts, pa.int64())],
            names=[self.id_col, "n_tokens_bpe"])


def bpe_token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     n_merges: int = 200, max_vocab: int = 65536):
    """End-to-end: learn merges from the corpus (one aggregation pass),
    broadcast them, count tokens per document (one map pass)."""
    import ray

    merges = learn_bpe_from_dataset(ds, text_col=text_col,
                                    n_merges=n_merges, max_vocab=max_vocab)
    merges_ref = ray.put(merges)
    return ds.map_batches(
        BpeTokenCount,
        fn_constructor_kwargs=dict(merges_ref=merges_ref,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8))
