"""Shuffle-frugal aggregation: partial (combiner) aggregation inside
map_batches before the groupby, so the all-to-all exchange moves one row per
(block x distinct key) instead of one row per input record.

At 100 TB this is the difference between shuffling the corpus and shuffling
a few KB per block: a block with 100k events and 5 event types contributes 5
partial rows to the exchange. Skewed keys are diluted for free — a hot key's
volume in the shuffle is bounded by the number of blocks, not its row count
(the classic salting effect without explicit salt management; explicit
salting remains available by adding a computed salt column to ``keys``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PARTIAL_FN = {"count": "count_all", "sum": "sum", "min": "min", "max": "max"}
_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def combine_aggregate(ds, keys: Sequence[str],
                      specs: Sequence[tuple[str, str, str]]):
    """Pre-aggregated groupby.

    specs: (column, fn, out_name) with fn in {count, sum, min, max}
    (column ignored for count). Returns Dataset with columns
    [*keys, *out_names].
    """
    keys = list(keys)
    aggs = []
    partial_names: list[str] = []
    for col, fn, _out in specs:
        if fn == "count":
            aggs.append(([], "count_all"))
            partial_names.append("count_all")
        else:
            aggs.append((col, fn))
            partial_names.append(f"{col}_{fn}")

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.select(keys)
        grouped = batch.group_by(keys).aggregate(aggs)
        # arrow puts aggregate columns first or last depending on version;
        # normalize the order to keys + partials
        return grouped.select(keys + partial_names)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from ray.data.aggregate import Max, Min, Sum
    final_aggs = []
    for (col, fn, _out), pname in zip(specs, partial_names):
        merge = _MERGE_FN[fn]
        if merge == "sum":
            final_aggs.append(Sum(pname))
        elif merge == "min":
            final_aggs.append(Min(pname))
        else:
            final_aggs.append(Max(pname))
    agg = partials.groupby(keys if len(keys) > 1 else keys[0]) \
        .aggregate(*final_aggs)

    out_names = keys + [out for _c, _f, out in specs]

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(out_names)

    return agg.map_batches(rename, batch_format="pyarrow")


def _head_k_per_group(batch: pa.Table, *, group_col: str, order_col: str,
                      id_col: str, k: int) -> pa.Table:
    """Vectorized head-k: top ``k`` rows per group by (order_col DESC,
    id_col ASC). One lexsort + run-length segmentation; no Python loop
    over groups."""
    if batch.num_rows == 0:
        return batch.select([group_col, id_col, order_col])
    grp = batch.column(group_col).combine_chunks()
    _, codes = np.unique(np.asarray(grp), return_inverse=True)
    order = batch.column(order_col).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    sidx = np.lexsort((ids, -order, codes))
    c = codes[sidx]
    starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
    run_id = np.cumsum(np.concatenate(
        ([False], c[1:] != c[:-1]))).astype(np.int64)
    pos = np.arange(len(c)) - starts[run_id]
    keep = sidx[pos < k]
    return batch.select([group_col, id_col, order_col]) \
        .take(pa.array(np.sort(keep)))


def grouped_topk(ds, *, group_col: str, order_col: str, id_col: str,
                 k: int = 3):
    """Top-k rows per group by (order_col DESC, id_col ASC tiebreak).

    Combiner pattern: each block reduces to <= k rows per group key
    (vectorized head-k), so the only shuffle moves <= k * blocks rows per
    group; the final per-group head-k runs on those bounded partials.
    No global sort, no full-table shuffle — scale is bounded by
    k * block_count per hot group."""
    from functools import partial as _p

    kern = _p(_head_k_per_group, group_col=group_col, order_col=order_col,
              id_col=id_col, k=k)

    def kern_group(group: pa.Table) -> pa.Table:
        return kern(group)

    partials = ds.select_columns([group_col, id_col, order_col]) \
        .map_batches(kern, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(
        kern_group, batch_format="pyarrow")


def grouped_dense_rank(ds, keys: Sequence[str], val_col: str, *,
                       out_col: str = "rnk", descending: bool = True,
                       join_partitions: int = 16):
    """DENSE_RANK() OVER (PARTITION BY keys ORDER BY val) without ever
    grouping the rows themselves: ranks depend only on the DISTINCT
    value set per key group, so the rank table is built from the
    combiner-reduced (keys, val) distribution — bounded by distinct
    values, not rows — and hash-joined back onto the input. A hot group
    with a billion rows but a thousand distinct values costs a
    thousand-row rank group plus a plain hash join; no single-group
    row materialization anywhere (the inverted-index lesson)."""
    keys = list(keys)
    dist = combine_aggregate(ds.select_columns(keys + [val_col]),
                             keys + [val_col], [("", "count", "__n")])

    def rank_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], group.column(c).type)
                 for c in keys + [val_col]] + [pa.array([], pa.int64())],
                names=[*keys, val_col, out_col])
        order = "descending" if descending else "ascending"
        group = group.take(pc.sort_indices(group.column(val_col),
                                           sort_keys=[("", order)]))
        rnk = pa.array(np.arange(1, group.num_rows + 1, dtype=np.int64))
        return pa.Table.from_arrays(
            [group.column(c) for c in keys + [val_col]] + [rnk],
            names=[*keys, val_col, out_col])

    ranks = dist.groupby(keys if len(keys) > 1 else keys[0]) \
        .map_groups(rank_group, batch_format="pyarrow")
    return ds.join(ranks, "inner", join_partitions,
                   on=tuple(keys) + (val_col,))


def grouped_exact_median(ds, keys: Sequence[str], val_col: str,
                         out_col: str = "median"):
    """Exact per-group median without sorting the data: shuffle only the
    VALUE DISTRIBUTION — combine_aggregate counts (keys..., val) rows
    (bounded by distinct values per group regardless of corpus size),
    then rank-select floor((n-1)/2)+1 per group on that tiny table.
    Rank rule matches the SQL row_number oracle bit-for-bit."""
    keys = list(keys)
    dist = combine_aggregate(ds.select_columns(keys + [val_col]),
                             keys + [val_col], [("", "count", "n")])

    def pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], group.column(kc).type) for kc in keys]
                + [pa.array([], pa.int64())],
                names=[*keys, out_col])
        idx = pc.sort_indices(group.column(val_col))
        group = group.take(idx)
        counts = group.column("n").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cum = np.cumsum(counts)
        rank = (cum[-1] - 1) // 2 + 1          # floor((n-1)/2)+1, 1-based
        row = int(np.searchsorted(cum, rank))
        val = group.column(val_col)[row]
        return pa.Table.from_arrays(
            [group.column(kc).slice(row, 1) for kc in keys]
            + [pa.array([val.as_py()], pa.int64())],
            names=[*keys, out_col])

    return dist.groupby(keys if len(keys) > 1 else keys[0]) \
        .map_groups(pick, batch_format="pyarrow")


def grouped_percentile_disc(ds, keys: Sequence[str], val_col: str,
                            fracs: Sequence[tuple[str, int, int]]):
    """PERCENTILE_DISC per group for several fractions at once, exactly:
    shuffle only the (keys..., val, count) VALUE DISTRIBUTION (the
    grouped_exact_median pattern), then per group pick the value at
    1-indexed rank ceil(num·n/den) — computed in pure integers
    ((num·n + den − 1) // den), so there is no 0.1·n float rounding
    hazard anywhere. fracs: (out_col, num, den) with 0 < num <= den.
    Returns one row per group: [*keys, *out_cols]."""
    keys = list(keys)
    dist = combine_aggregate(ds.select_columns(keys + [val_col]),
                             keys + [val_col], [("", "count", "n")])

    names = [f for f, _n, _d in fracs]

    def pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], group.column(c).type) for c in keys]
                + [pa.array([], group.column(val_col).type)
                   for _ in names],
                names=[*keys, *names])
        order = pc.sort_indices(group.column(val_col))
        group = group.take(order)
        cnt = group.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        vals = group.column(val_col)
        out = []
        for _f, num, den in fracs:
            k = (num * n + den - 1) // den
            k = max(1, min(k, n))
            idx = int(np.searchsorted(cum, k, side="left"))
            out.append(vals.slice(idx, 1))
        return pa.Table.from_arrays(
            [group.column(c).slice(0, 1) for c in keys] + out,
            names=[*keys, *names])

    return dist.groupby(keys if len(keys) > 1 else keys[0]) \
        .map_groups(pick, batch_format="pyarrow")


def grouped_percentile_cont(ds, keys: Sequence[str], val_col: str,
                            num: int, den: int, out_col: str = "p"):
    """PERCENTILE_CONT per group, exactly mirrorable: the order
    statistics come from the same distribution-only shuffle as
    grouped_percentile_disc; the interpolation index is the rational
    (n−1)·num/den split into integer part k0 and remainder m, and the
    ONE float expression — lo + (hi − lo)·(m/den) — is replayed with
    identical IEEE ops by the SQL oracle (both sides: int64→double
    casts, one divide, one multiply, one add). Returns one float64
    ``out_col`` row per group."""
    keys = list(keys)
    dist = combine_aggregate(ds.select_columns(keys + [val_col]),
                             keys + [val_col], [("", "count", "n")])

    def pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], group.column(c).type) for c in keys]
                + [pa.array([], pa.float64())], names=[*keys, out_col])
        order = pc.sort_indices(group.column(val_col))
        group = group.take(order)
        cnt = group.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        idx = (n - 1) * num
        k0, m = idx // den, idx % den
        vals = group.column(val_col)
        lo = vals[int(np.searchsorted(cum, k0 + 1, side="left"))].as_py()
        k1 = min(k0 + 2, n)
        hi = vals[int(np.searchsorted(cum, k1, side="left"))].as_py()
        p = float(lo) + (float(hi) - float(lo)) * (float(m) / float(den))
        return pa.Table.from_arrays(
            [group.column(c).slice(0, 1) for c in keys]
            + [pa.array([p], pa.float64())], names=[*keys, out_col])

    return dist.groupby(keys if len(keys) > 1 else keys[0]) \
        .map_groups(pick, batch_format="pyarrow")


def grouped_gini_e6(ds, keys: Sequence[str], val_col: str,
                    out_col: str = "gini_e6", n_col: str = "n"):
    """Exact Gini concentration index per group, in e6 fixed point,
    from the VALUE DISTRIBUTION only: combine_aggregate counts
    (keys..., val) rows — bounded by distinct values per group, never
    by row count — then one tiny per-group finalize applies the
    closed-form tie-block sum

        num = sum_k v_k * (2*c_k*s_k + c_k*(c_k+1) - c_k*(n+1))

    (s_k = items before block k in ascending order), which equals the
    textbook sum_i (2i - n - 1) x_i over any tie ordering. The
    accumulation runs in arbitrary-precision Python ints (DuckDB's
    SUM(BIGINT) is HUGEINT — same exactness), and the ONE float
    expression floor(1e6 * num / (n * tot)) is replayed identically by
    the SQL oracle. Returns [*keys, n_col, out_col]."""
    keys = list(keys)
    dist = combine_aggregate(ds.select_columns(keys + [val_col]),
                             keys + [val_col], [("", "count", "__c")])

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], group.column(c).type) for c in keys]
                + [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=[*keys, n_col, out_col])
        group = group.take(pc.sort_indices(group.column(val_col)))
        vals = group.column(val_col).to_numpy(zero_copy_only=False)
        cnts = group.column("__c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        starts = (cum - cnts).tolist()
        num = 0
        tot = 0
        for v, c, s in zip(vals.tolist(), cnts.tolist(), starts):
            num += v * (2 * c * s + c * (c + 1) - c * (n + 1))
            tot += v * c
        den = n * tot
        g = int(np.floor(1e6 * float(num) / float(den))) if den else 0
        return pa.Table.from_arrays(
            [group.column(c).slice(0, 1) for c in keys]
            + [pa.array([n], pa.int64()), pa.array([g], pa.int64())],
            names=[*keys, n_col, out_col])

    return dist.groupby(keys if len(keys) > 1 else keys[0]) \
        .map_groups(finalize, batch_format="pyarrow")
