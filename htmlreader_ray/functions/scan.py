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
