"""Distributed ordered prefix-scan (cumulative sum along a total order).

Ray Data has no scan/window primitive; this builds one from two narrow
passes (SURVEY.md §2.10 — the engine-level additions training pipelines
need). The motivating operator is concat-and-chunk sequence packing: lay
documents end-to-end along a deterministic order and cut fixed
token-budget chunks, so ``chunk_id = running_token_offset // seq_len``.

Scale design:
- the order column is bucketed into contiguous ranges (``order // bucket``),
  so a row's global prefix = (sum of all earlier buckets) + (prefix within
  its bucket);
- pass 1 computes per-bucket sums with the combiner pattern — the driver
  sees only the tiny (bucket, sum) table, never rows — and prefix-sums it
  into per-bucket offsets, broadcast via ray.put;
- pass 2 is one groupby(bucket): each group sorts its own rows by the
  order column, cumsums, and adds the bucket offset.

Partitioning assumption: one bucket's rows fit in one group (pick
bucket_size accordingly); skew is impossible because buckets are fixed
ranges of a unique order key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ordered_prefix_sum(ds, *, order_col: str, value_col: str,
                       out_col: str = "prefix_sum",
                       bucket_size: int = 100_000):
    """Adds ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive prefix sum). ``order_col``
    must be unique integers."""
    import ray
    from .shuffle import combine_aggregate

    def with_bucket(batch: pa.Table) -> pa.Table:
        bucket = pc.divide(batch.column(order_col),
                           pa.scalar(bucket_size, pa.int64()))
        return batch.append_column("__bucket", bucket.cast(pa.int64()))

    bucketed = ds.map_batches(with_bucket, batch_format="pyarrow")

    sums = combine_aggregate(
        bucketed.select_columns(["__bucket", value_col]),
        ["__bucket"], [(value_col, "sum", "__sum")]).take_all()
    sums.sort(key=lambda r: r["__bucket"])
    offsets, acc = {}, 0
    for r in sums:
        offsets[r["__bucket"]] = acc
        acc += r["__sum"]
    offsets_ref = ray.put(offsets)

    def scan_group(group: pa.Table, *, _ref=offsets_ref) -> pa.Table:
        off = ray.get(_ref)
        idx = pc.sort_indices(group.column(order_col))
        group = group.take(idx)
        vals = group.column(value_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        prefix = np.concatenate(([0], np.cumsum(vals)[:-1]))
        base = off.get(group.column("__bucket")[0].as_py(), 0)
        out = group.append_column(out_col,
                                  pa.array(prefix + base, pa.int64()))
        return out.drop_columns(["__bucket"])

    return bucketed.groupby("__bucket").map_groups(
        scan_group, batch_format="pyarrow")


def _grouped_scan(ds, *, part_cols, order_col, tiebreak_col, value_col,
                  bucket_size, finish_group, skip_group=None):
    """Shared two-pass machinery for per-partition ordered scans.

    Rows are bucketed by fixed ``order_col // bucket_size`` ranges inside
    each partition; pass 1 moves only (part, bucket, sum) through a
    combiner groupby and prefix-sums it into per-(part, bucket) exclusive
    offsets + per-part totals (both broadcast via ray.put); pass 2 is one
    groupby((part, bucket)) whose groups sort locally and call
    ``finish_group(group_sorted, offset, total)``. ``skip_group`` (given
    offset, total) can drop a whole bucket before its rows are scanned —
    the scale lever for budget-style early exit. ``order_col`` must be
    non-negative integers; uniqueness comes from (order, tiebreak)."""
    import ray

    from .shuffle import combine_aggregate

    part_cols = list(part_cols)

    def with_bucket(batch: pa.Table) -> pa.Table:
        bucket = pc.divide(batch.column(order_col),
                           pa.scalar(bucket_size, pa.int64()))
        return batch.append_column("__bucket", bucket.cast(pa.int64()))

    bucketed = ds.map_batches(with_bucket, batch_format="pyarrow")

    sums = combine_aggregate(
        bucketed.select_columns(part_cols + ["__bucket", value_col]),
        part_cols + ["__bucket"], [(value_col, "sum", "__sum")]).take_all()
    sums.sort(key=lambda r: (tuple(str(r[c]) for c in part_cols),
                             r["__bucket"]))
    offsets, totals = {}, {}
    for r in sums:
        part = tuple(r[c] for c in part_cols)
        offsets[part + (r["__bucket"],)] = totals.get(part, 0)
        totals[part] = totals.get(part, 0) + r["__sum"]
    state_ref = ray.put((offsets, totals))

    def scan_group(group: pa.Table, *, _ref=state_ref) -> pa.Table:
        offs, tots = ray.get(_ref)
        part = tuple(group.column(c)[0].as_py() for c in part_cols)
        off = offs.get(part + (group.column("__bucket")[0].as_py(),), 0)
        total = tots.get(part, 0)
        if skip_group is not None and skip_group(off, total):
            return group.drop_columns(["__bucket"]).slice(0, 0)
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending"),
                                                (tiebreak_col, "ascending")])
        group = group.take(idx).drop_columns(["__bucket"])
        return finish_group(group, off, total)

    return bucketed.groupby(part_cols + ["__bucket"]).map_groups(
        scan_group, batch_format="pyarrow")


def grouped_budget_filter(ds, *, part_cols, order_col, tiebreak_col,
                          value_col, budget: int, out_col: str = "cum",
                          bucket_size: int = 1 << 52):
    """Keeps rows whose INCLUSIVE running ``value_col`` sum within their
    partition (ordered by (order_col, tiebreak_col)) is <= ``budget``, and
    adds that running sum as ``out_col``. Buckets that start past the
    budget are dropped before their rows are sorted — per-partition work
    is proportional to the kept prefix, not the partition."""

    def finish(group: pa.Table, off: int, _total: int) -> pa.Table:
        vals = group.column(value_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(vals) + off
        out = group.append_column(out_col, pa.array(cum, pa.int64()))
        return out.filter(pa.array(cum <= budget))

    return _grouped_scan(ds, part_cols=part_cols, order_col=order_col,
                         tiebreak_col=tiebreak_col, value_col=value_col,
                         bucket_size=bucket_size, finish_group=finish,
                         skip_group=lambda off, _t: off > budget)


def grouped_ntile(ds, *, part_cols, order_col, tiebreak_col, tiles: int,
                  out_col: str = "tile", bucket_size: int = 256):
    """Adds ``out_col`` = ((rank-1)*tiles) // n + 1 where rank is the
    1-based position within the partition ordered by (order_col,
    tiebreak_col) and n the partition size — the exact integer formula a
    SQL oracle replays verbatim (CCNet-style head/middle/tail bucketing
    when tiles=3). One count-only pass, then one bounded-group scan."""

    def with_one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__one", pa.array(np.ones(len(batch), np.int64)))

    def finish(group: pa.Table, off: int, total: int) -> pa.Table:
        n = len(group)
        rank = off + np.arange(1, n + 1, dtype=np.int64)
        tile = (rank - 1) * tiles // max(total, 1) + 1
        return group.drop_columns(["__one"]).append_column(
            out_col, pa.array(tile, pa.int64()))

    return _grouped_scan(ds.map_batches(with_one, batch_format="pyarrow"),
                         part_cols=part_cols, order_col=order_col,
                         tiebreak_col=tiebreak_col, value_col="__one",
                         bucket_size=bucket_size, finish_group=finish)


def token_pack(ds, *, order_col: str = "doc_id", tokens_col: str = "n_tokens",
               seq_len: int = 2048, bucket_size: int = 100_000):
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    ``order_col`` order and cut into fixed ``seq_len`` token chunks;
    ``chunk_id`` is the chunk in which each document STARTS. Adds
    (prefix_tokens, chunk_id)."""
    scanned = ordered_prefix_sum(ds, order_col=order_col,
                                 value_col=tokens_col,
                                 out_col="prefix_tokens",
                                 bucket_size=bucket_size)

    def chunk(batch: pa.Table) -> pa.Table:
        cid = pc.divide(batch.column("prefix_tokens"),
                        pa.scalar(seq_len, pa.int64()))
        return batch.append_column("chunk_id", cid.cast(pa.int64()))

    return scanned.map_batches(chunk, batch_format="pyarrow")


def temperature_sample(ds, *, source_col: str = "source",
                       hkey_col: str = "__hkey"):
    """Temperature-flattened source sampling (the alpha = 1/2 mixing rule
    of multilingual / multi-source training-data recipes): source s is
    downsampled at rate r_s = (w_s / n_s) / max_t(w_t / n_t) with
    w_s = floor(sqrt(n_s) * 1000 + 0.5), so the kept mixture's source
    shares are proportional to sqrt(n_s). A row is kept iff its
    precomputed 52-bit hash key < floor(w_s * n_m * 2^52 / (n_s * w_m))
    — all threshold arithmetic in arbitrary-precision ints (the SQL
    oracle replays it in hugeint), and sqrt is IEEE correctly rounded on
    both sides, so keep/drop decisions are bit-deterministic.

    Input must already carry ``hkey_col`` (the repo's md5-prefix
    convention, 13 hex digits = 52 bits). Two passes: a combiner
    count-by-source (one (source, n) row per block-distinct source on
    the wire), then a broadcast threshold map — the corpus itself never
    shuffles. The argmax source resolves ties by lowest source string,
    mirrored by the oracle's exact-rational NOT EXISTS."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from .shuffle import combine_aggregate

    sizes = combine_aggregate(
        ds.map_batches(lambda b: b.select([source_col]),
                       batch_format="pyarrow"),
        [source_col], [("", "count", "n")]).take_all()  # bounded: #sources
    n_by_src = {r[source_col]: int(r["n"]) for r in sizes}
    w_by_src = {s: math.floor(math.sqrt(float(n)) * 1000 + 0.5)
                for s, n in n_by_src.items()}
    # exact-rational argmax of w/n, ties -> lowest source string
    m_src = None
    for s in sorted(n_by_src):
        if m_src is None or (w_by_src[s] * n_by_src[m_src]
                             > w_by_src[m_src] * n_by_src[s]):
            m_src = s
    mn, mw = n_by_src[m_src], w_by_src[m_src]
    srcs = sorted(n_by_src)
    # clamp to int64 for the vectorized take (rate-1 thresholds are 2^52,
    # far below the clamp; anything above every 52-bit key keeps all)
    thr_arr = np.array([min((w_by_src[s] * mn * (1 << 52))
                            // (n_by_src[s] * mw), (1 << 62))
                        for s in srcs], dtype=np.int64)
    ref = ray.put((pa.array(srcs, pa.string()), thr_arr))

    def keep(batch: pa.Table, *, _ref=ref) -> pa.Table:
        src_set, t = ray.get(_ref)
        # every source is present in the pass-1 sizes by construction, so
        # index_in never yields a null here (a null would fail loudly)
        idx = pc.index_in(batch.column(source_col), value_set=src_set) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        lim = t[idx.astype(np.int64)]
        return batch.filter(
            pc.less(batch.column(hkey_col), pa.array(lim, pa.int64())))

    return ds.map_batches(keep, batch_format="pyarrow")
