"""Distributed cardinality sketch: HyperLogLog over a string column.

The sketch is the canonical combiner-shaped operator: each batch reduces
to at most ``m = 2^b`` (register, rho) rows, partials merge by MAX — so
the all-to-all moves O(blocks x m) integers no matter how many rows the
corpus has. Registers use the first 64 bits of md5 (the same hash the
fingerprint operator already exposes and DuckDB reproduces bit-for-bit),
split as: top ``b`` bits -> register index, rho = 1 + leading zeros of
the remaining ``64-b`` bits. Everything driver-visible is INTEGER, so
the SQL oracle (md5 + bin() string scan in DuckDB) matches exactly —
no floating-point leading-zero tricks.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


def _hash64(texts) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big")
    return out


def hll_partial_batch(batch: pa.Table, *, b: int = 8,
                      text_col: str = "text") -> pa.Table:
    """One batch -> its (register, rho) partial rows (only registers that
    were hit). MAX-mergeable; at most 2^b rows leave the task."""
    hv = _hash64(batch.column(text_col).to_pylist())
    m = 1 << b
    rest_bits = 64 - b
    regs = (hv >> np.uint64(rest_bits)).astype(np.int64)
    rest = hv & np.uint64((1 << rest_bits) - 1)
    # rho = 1 + leading zeros of the (64-b)-bit remainder. bit_length via
    # float log2 is EXACT only below ~2^53 (log2(2^56-1) rounds to 56.0),
    # so split into <=28-bit halves where no misrounding is possible.
    hi = rest >> np.uint64(28)
    use_hi = hi != 0
    chunk = np.where(use_hi, hi, rest).astype(np.float64)
    nbits = np.zeros(len(rest), dtype=np.int64)
    nz = rest != 0
    nbits[nz] = np.floor(np.log2(chunk[nz])).astype(np.int64) + 1
    nbits[use_hi] += 28
    rho = np.where(nz, rest_bits - nbits + 1, rest_bits + 1).astype(np.int64)
    table = np.zeros(m, dtype=np.int64)
    np.maximum.at(table, regs, rho)
    hit = np.flatnonzero(table)
    return pa.Table.from_arrays(
        [pa.array(hit, pa.int64()), pa.array(table[hit], pa.int64())],
        names=["register", "rho"])


def hll_registers(ds, *, b: int = 8, text_col: str = "text"):
    """Dataset -> (register, rho) with rho = max over all rows. One
    narrow groupby over <= 2^b x blocks integer rows."""
    from ray.data.aggregate import Max

    partials = ds.map_batches(
        lambda batch: hll_partial_batch(batch, b=b, text_col=text_col),
        batch_format="pyarrow")
    merged = partials.groupby("register").aggregate(Max("rho"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("register"), batch.column("max(rho)")],
            names=["register", "rho"])

    return merged.map_batches(rename, batch_format="pyarrow")


def hll_estimate(registers: dict[int, int], *, b: int = 8) -> float:
    """Classic HLL estimator with small-range (linear counting)
    correction, from the merged register table."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    inv_sum = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    est = alpha * m * m / inv_sum
    zeros = m - len([1 for j in registers.values() if j > 0])
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est


def _cm_hash(texts, seed: int) -> np.ndarray:
    """Row of md5-derived column indices: md5(seed || value) first 8
    bytes big-endian — reproducible in DuckDB as
    concat('0x', substr(md5(seed || text), 1, 16))::UBIGINT."""
    out = np.empty(len(texts), dtype=np.uint64)
    prefix = str(seed)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.md5((prefix + (t or "")).encode("utf-8")).digest()[:8],
            "big")
    return out


def cm_partial_batch(batch: pa.Table, *, depth: int = 4, width: int = 256,
                     text_col: str = "text") -> pa.Table:
    """Count-Min partial for one batch: (row, col, n) cells, at most
    depth x width rows leave the task regardless of batch size."""
    texts = batch.column(text_col).to_pylist()
    rows_out, cols_out, n_out = [], [], []
    for d in range(depth):
        hv = _cm_hash(texts, d)
        cols = (hv % np.uint64(width)).astype(np.int64)
        counts = np.bincount(cols, minlength=width)
        hit = np.flatnonzero(counts)
        rows_out.append(np.full(len(hit), d, dtype=np.int64))
        cols_out.append(hit.astype(np.int64))
        n_out.append(counts[hit].astype(np.int64))
    return pa.Table.from_arrays(
        [pa.array(np.concatenate(rows_out), pa.int64()),
         pa.array(np.concatenate(cols_out), pa.int64()),
         pa.array(np.concatenate(n_out), pa.int64())],
        names=["row", "col", "n"])


def cm_sketch(ds, *, depth: int = 4, width: int = 256,
              text_col: str = "text"):
    """Dataset -> merged Count-Min table (row, col, n): partials SUM.
    Cormode & Muthukrishnan, J. Algorithms 55 (2005)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: cm_partial_batch(b, depth=depth, width=width,
                                   text_col=text_col),
        batch_format="pyarrow")
    merged = partials.groupby(["row", "col"]).aggregate(Sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("row"), batch.column("col"),
             batch.column("sum(n)")],
            names=["row", "col", "n"])

    return merged.map_batches(rename, batch_format="pyarrow")


def cm_query(cells: dict[tuple[int, int], int], value: str, *,
             depth: int = 4, width: int = 256) -> int:
    """Point estimate: min over rows (upper bound on the true count)."""
    est = None
    for d in range(depth):
        hv = _cm_hash([value], d)[0]
        col = int(hv % np.uint64(width))
        c = cells.get((d, col), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


def bloom_partial_batch(batch: pa.Table, *, k: int = 4, m_bits: int = 2048,
                        text_col: str = "text") -> pa.Table:
    """Bloom-filter partial: the set bit positions for one batch (at most
    m_bits rows leave the task). Merge semantics are OR — a distinct
    union of positions — completing the sketch family's three merge
    shapes (HLL max, Count-Min sum, Bloom or)."""
    texts = batch.column(text_col).to_pylist()
    bits = np.zeros(m_bits, dtype=bool)
    for seed in range(k):
        hv = _cm_hash(texts, seed)
        bits[(hv % np.uint64(m_bits)).astype(np.int64)] = True
    return pa.Table.from_arrays(
        [pa.array(np.flatnonzero(bits).astype(np.int64), pa.int64())],
        names=["bit"])


def bloom_bits(ds, *, k: int = 4, m_bits: int = 2048,
               text_col: str = "text"):
    """Dataset -> sorted distinct set-bit positions."""
    from ray.data.aggregate import Count

    partials = ds.map_batches(
        lambda b: bloom_partial_batch(b, k=k, m_bits=m_bits,
                                      text_col=text_col),
        batch_format="pyarrow")
    merged = partials.groupby("bit").aggregate(Count())
    return merged.map_batches(lambda b: b.select(["bit"]),
                              batch_format="pyarrow")


def bloom_contains(bits: set, value: str, *, k: int = 4,
                   m_bits: int = 2048) -> bool:
    """Membership probe: no false negatives, tunable false positives."""
    for seed in range(k):
        hv = _cm_hash([value], seed)[0]
        if int(hv % np.uint64(m_bits)) not in bits:
            return False
    return True


def _word_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """Block-local whitespace word counts (the top_terms tokenizer:
    regex \\s+ split, empty tokens dropped)."""
    import pyarrow.compute as pc
    words = pc.list_flatten(pc.split_pattern_regex(
        batch.column(text_col), pattern=r"\s+"))
    words = words.filter(pc.not_equal(words, ""))
    if len(words) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["word", "cnt"])
    g = pa.Table.from_arrays([words], names=["word"]) \
        .group_by("word").aggregate([([], "count_all")])
    return g.rename_columns(["word", "cnt"])


def exact_heavy_hitters(ds, *, k: int = 200, text_col: str = "text"):
    """Deterministic two-pass frequent-items: every word with global
    count strictly above total/k, with EXACT counts.

    Pass 1 is the Misra-Gries guarantee set per block: words whose
    block-local count exceeds block_total/(k+1) — at most k per block
    by a counting argument, and by the averaging argument any word
    with global count > total/k must clear that bar in at least one
    block. Candidates (plus one null-word row carrying each block's
    token total) are the ONLY driver materialization — bounded by
    k x blocks, independent of corpus size. Pass 2 re-scans the corpus
    counting ONLY the broadcast candidate set (pc.is_in before the
    combiner), so the exchange carries candidate rows, never the
    vocabulary. Classic two-pass heavy hitters (Misra & Gries 1982);
    the corpus is read twice, the full word distribution is never
    shuffled (the top_terms groupby is what this replaces at scale).

    Returns Dataset[(word, n)] with n * k > total, exact.
    """
    import pyarrow.compute as pc

    def candidates(batch: pa.Table) -> pa.Table:
        c = _word_counts(batch, text_col)
        if c.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["word", "cnt"])
        cnt = c.column("cnt")
        bt = int(pc.sum(cnt).as_py())
        # strict MG bar: cnt * (k+1) > block_total
        keep = c.filter(pc.greater(pc.multiply(cnt, k + 1), bt))
        total_row = pa.Table.from_arrays(
            [pa.array([None], pa.string()), pa.array([bt], pa.int64())],
            names=["word", "cnt"])
        return pa.concat_tables([keep, total_row])

    rows = ds.map_batches(candidates, batch_format="pyarrow").take_all()
    total = sum(r["cnt"] for r in rows if r["word"] is None)
    cands = sorted({r["word"] for r in rows if r["word"] is not None})
    cand_arr = pa.array(cands, pa.string())

    def count_cands(batch: pa.Table) -> pa.Table:
        c = _word_counts(batch, text_col)
        if c.num_rows == 0 or len(cand_arr) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["word", "cnt"])
        return c.filter(pc.is_in(c.column("word"), value_set=cand_arr))

    from .shuffle import combine_aggregate
    counts = combine_aggregate(
        ds.map_batches(count_cands, batch_format="pyarrow"),
        ["word"], [("cnt", "sum", "n")])

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.int64())
        t = pa.Table.from_arrays([batch.column("word"), n],
                                 names=["word", "n"])
        return t.filter(pc.greater(pc.multiply(n, k), total))

    return counts.map_batches(finish, batch_format="pyarrow")
