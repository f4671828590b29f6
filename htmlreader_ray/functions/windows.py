"""Windowed / ordered operators Ray Data lacks natively (SURVEY.md §2.10:
the reference has no windows at all; these are the engine-level additions
the north rule's training-data pipelines need).

Partitioning assumptions (documented per the custom-operator contract):
- tumbling windows need NO co-location: the window id is a pure function of
  the timestamp, so assignment is a stateless vectorized map and the
  aggregate is an ordinary groupby on (window, key).
- session windows need all of one user's events in one group: expressed as
  groupby(user).map_groups(sessionize) — the shuffle key is the user id and
  skew is bounded by the busiest single user.
- the as-of join broadcasts the (small) right side sorted per key and
  binary-searches inside map_batches — no shuffle; when the right side
  outgrows the object store, hash-partition both sides on the key and run
  the same merge per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def assign_tumbling_window(batch: pa.Table, *, ts_col: str = "ts",
                           width_s: int = 3600) -> pa.Table:
    """Vectorized: add ``window_start`` (timestamp) = floor(ts / width)."""
    ts = batch.column(ts_col)
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.int64())
    width_us = width_s * 1_000_000
    start = pc.multiply(pc.divide(us, width_us), width_us)
    return batch.append_column(
        "window_start", start.cast(pa.timestamp("us")))


def tumbling_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                        width_s: int = 3600):
    """Tumbling-window count/min/max per key, via the combiner pattern:
    per-batch partials first, so the shuffle moves O(blocks x windows x
    keys) rows instead of every event. Returns
    (window_start, key, n_events, min_value, max_value)."""
    from .shuffle import combine_aggregate

    assigned = ds.map_batches(
        assign_tumbling_window, fn_kwargs={"ts_col": ts_col,
                                           "width_s": width_s},
        batch_format="pyarrow")
    agg = combine_aggregate(
        assigned.select_columns(["window_start", key_col, "value"]),
        ["window_start", key_col],
        [("", "count", "n_events"), ("value", "min", "min_value"),
         ("value", "max", "max_value")])

    def us_start(batch: pa.Table) -> pa.Table:
        # the groupby round-trips timestamps through a seconds resolution;
        # restore [us] so the output dtype matches the SQL oracle exactly
        return batch.set_column(
            0, "window_start",
            batch.column("window_start").cast(pa.timestamp("us")))

    return agg.map_batches(us_start, batch_format="pyarrow")


def sessionize_group(group: pa.Table, *, ts_col: str = "ts",
                     user_col: str = "user_id",
                     gap_s: int = 1800) -> pa.Table:
    """map_groups kernel: one user's events -> session assignments.
    Sessions split where the gap to the previous event exceeds ``gap_s``.
    Vectorized (sort + diff + cumsum)."""
    idx = pc.sort_indices(group.column(ts_col))
    group = group.take(idx)
    us = group.column(ts_col).combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    if len(us) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64()),
             pa.array([], pa.timestamp("us")),
             pa.array([], pa.timestamp("us"))],
            names=[user_col, "session_id", "n_events", "session_start",
                   "session_end"])
    gap_us = gap_s * 1_000_000
    new_session = np.ones(len(us), dtype=np.int64)
    new_session[1:] = (np.diff(us) > gap_us).astype(np.int64)
    session_ids = np.cumsum(new_session)  # 1-based
    user = group.column(user_col)[0].as_py()
    out_user, out_sid, out_n, out_start, out_end = [], [], [], [], []
    boundaries = np.flatnonzero(new_session)
    ends = np.append(boundaries[1:], len(us))
    for b, e in zip(boundaries, ends):
        out_user.append(user)
        out_sid.append(int(session_ids[b]))
        out_n.append(int(e - b))
        out_start.append(int(us[b]))
        out_end.append(int(us[e - 1]))
    return pa.Table.from_arrays(
        [pa.array(out_user, pa.int64()), pa.array(out_sid, pa.int64()),
         pa.array(out_n, pa.int64()),
         pa.array(out_start, pa.int64()).cast(pa.timestamp("us")),
         pa.array(out_end, pa.int64()).cast(pa.timestamp("us"))],
        names=[user_col, "session_id", "n_events", "session_start",
               "session_end"])


def session_windows(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                    gap_s: int = 1800):
    """Gap-based session windows per user (the one genuinely order-dependent
    stage: groupby(user) is the only shuffle)."""
    return ds.groupby(user_col).map_groups(
        sessionize_group,
        fn_kwargs={"ts_col": ts_col, "user_col": user_col, "gap_s": gap_s},
        batch_format="pyarrow")


# ------------------------------------------------------------- as-of join

def asof_join_broadcast(left_ds, right_rows: list[dict], *,
                        left_key: str, left_ts: str,
                        right_key: str, right_ts: str,
                        right_val: str, out_col: str,
                        direction: str = "backward"):
    """As-of join. direction="backward": latest right row with
    right_ts <= left_ts; "forward": earliest right row with
    right_ts >= left_ts. NULL when none. Right side is broadcast once via
    ray.put as {key: (sorted_ts_array, vals_list)}."""
    import ray

    by_key: dict = {}
    for r in sorted(right_rows, key=lambda r: (r[right_key], r[right_ts])):
        by_key.setdefault(r[right_key], ([], []))
        ts_list, val_list = by_key[r[right_key]]
        ts_list.append(r[right_ts])
        val_list.append(r[right_val])
    for k, (ts_list, val_list) in by_key.items():
        by_key[k] = (np.array([t.timestamp() if hasattr(t, "timestamp")
                               else t for t in ts_list]), val_list)
    index_ref = ray.put(by_key)

    forward = direction == "forward"

    class AsOf:
        def __init__(self, ref):
            self.index = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(left_key).to_pylist()
            times = batch.column(left_ts).to_pylist()
            out = []
            for k, t in zip(keys, times):
                hit = self.index.get(k)
                if hit is None:
                    out.append(None)
                    continue
                ts_arr, vals = hit
                tv = t.timestamp() if hasattr(t, "timestamp") else t
                if forward:
                    i = int(np.searchsorted(ts_arr, tv, side="left"))
                    out.append(vals[i] if i < len(vals) else None)
                else:
                    i = int(np.searchsorted(ts_arr, tv, side="right")) - 1
                    out.append(vals[i] if i >= 0 else None)
            return batch.append_column(out_col, pa.array(out))

    return left_ds.map_batches(
        AsOf, fn_constructor_kwargs={"ref": index_ref},
        batch_format="pyarrow", concurrency=(1, 4))


def _ts_to_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Normalize a timestamp/date column to int64 microseconds."""
    t = col.type
    if pa.types.is_date(t):
        col = col.cast(pa.timestamp("us"))
    elif pa.types.is_timestamp(t) and t.unit != "us":
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64())


def asof_join_partitioned(left_ds, right_ds, *,
                          left_key: str, left_ts: str,
                          right_key: str, right_ts: str,
                          right_val: str, out_col: str,
                          left_carry: list[str],
                          direction: str = "backward"):
    """Partitioned sorted-merge as-of join — the scale path when the right
    side is the unbounded one (so broadcasting it is not an option).

    Both sides are projected to a common narrow schema
    (key, ts_us, side, carry…, val), unioned, and hash-partitioned ONCE on
    the key by a single groupby; inside each group the right rows are
    sorted and every left row binary-searches its match. Ties on equal
    timestamps resolve to the maximum ``right_val`` (matching the
    ``max(val) .. GROUP BY key, ts`` pre-dedup an oracle would do).

    Partitioning assumption: all rows of one key fit in one group — skew is
    bounded by the hottest single key, same contract as session windows.
    Returns a Dataset with columns [*left_carry, out_col] where out_col is
    NULL for left rows with no match ("inner" filtering is the caller's
    one extra filter away).
    """
    import ray.data  # noqa: F401  (Dataset.union)

    forward = direction == "forward"
    left_schema = left_ds.schema()
    carry_types = {c: left_schema.base_schema.field(c).type
                   for c in left_carry}
    val_type = right_ds.schema().base_schema.field(right_val).type

    def norm_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays = [batch.column(left_key).combine_chunks(),
                  _ts_to_us(batch.column(left_ts)),
                  pa.array(np.zeros(n, dtype=np.int8))]
        names = ["__k", "__ts", "__side"]
        for c in left_carry:
            arrays.append(batch.column(c).combine_chunks())
            names.append(c)
        arrays.append(pa.nulls(n, val_type))
        names.append("__val")
        return pa.Table.from_arrays(arrays, names=names)

    def norm_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays = [batch.column(right_key).combine_chunks(),
                  _ts_to_us(batch.column(right_ts)),
                  pa.array(np.ones(n, dtype=np.int8))]
        names = ["__k", "__ts", "__side"]
        for c in left_carry:
            arrays.append(pa.nulls(n, carry_types[c]))
            names.append(c)
        arrays.append(batch.column(right_val).combine_chunks())
        names.append("__val")
        return pa.Table.from_arrays(arrays, names=names)

    merged = (left_ds.map_batches(norm_left, batch_format="pyarrow")
              .union(right_ds.map_batches(norm_right,
                                          batch_format="pyarrow")))

    def merge_group(group: pa.Table) -> pa.Table:
        side = group.column("__side").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 0))
        right = group.filter(pa.array(side == 1))
        out_cols = [left.column(c) for c in left_carry]
        if len(right) == 0:
            return pa.Table.from_arrays(
                out_cols + [pa.nulls(len(left), val_type)],
                names=left_carry + [out_col])
        r_ts = right.column("__ts").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        r_val = right.column("__val").combine_chunks()
        # sort by (ts asc, val) so the binary-search hit resolves equal-ts
        # ties to the MAX val: forward takes the FIRST index with
        # ts >= t (val desc), backward the LAST with ts <= t (val asc)
        order = pc.sort_indices(pa.table({"t": r_ts, "v": r_val}), sort_keys=[
            ("t", "ascending"),
            ("v", "descending" if forward else "ascending")])
        order_np = order.to_numpy(zero_copy_only=False)
        r_ts = r_ts[order_np]
        r_val = r_val.take(order)
        l_ts = left.column("__ts").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if forward:
            idx = np.searchsorted(r_ts, l_ts, side="left")
            hit = idx < len(r_ts)
        else:
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            hit = idx >= 0
        idx_safe = np.where(hit, idx, 0)
        vals = r_val.take(pa.array(idx_safe, pa.int64()))
        vals = pc.if_else(pa.array(hit), vals, pa.nulls(len(left), val_type))
        return pa.Table.from_arrays(out_cols + [vals],
                                    names=left_carry + [out_col])

    return merged.groupby("__k").map_groups(merge_group,
                                            batch_format="pyarrow")


def range_join_count(left_ds, right_ds=None, *,
                     left_key: str, left_ts: str, left_id: str,
                     right_key: str, right_ts: str,
                     width_s: int, out_col: str = "n_matches",
                     bucket_width_s: int | None = None,
                     shuffle_partitions: int | None = None):
    """Distributed range (interval) join: for every left row, count right
    rows with the same key whose timestamp falls in
    ``[left_ts, left_ts + width_s)``. Inner semantics — left rows with no
    match are dropped. Returns (left_id, out_col). Pass ``right_ds=None``
    for a self-join: the single input is scanned once and each batch
    emits both its probe and its event rows.

    Scale design (no all-pairs, no broadcast): time is bucketed at
    ``bucket_width_s`` >= the interval width, so every left interval
    intersects at most TWO buckets. Right rows are assigned to their one
    bucket; left rows are replicated into the (<=2) buckets their interval
    touches; one groupby on (key, bucket) co-locates them, and inside each
    group a sorted binary-search (np.searchsorted on the bucket's right
    timestamps) yields the partial count per left row in O(log n). A
    second, tiny groupby on ``left_id`` sums the <=2 partials. Shuffle
    volume is O(|left| * 2 + |right|) narrow rows — never a pair
    explosion.

    ``bucket_width_s`` trades group COUNT against group SIZE: per-group
    dispatch costs ~0.5ms, so thousands of near-empty groups dominate
    wall time at small key cardinality, while one giant group bounds a
    worker's memory at the other end. The default (32x the interval)
    suits skewless data; shrink toward the interval width when one
    (key, bucket) range could outgrow a worker.

    Partitioning assumption: one (key, bucket) group fits in memory; skew
    is bounded by the hottest key within one bucket-width of time, which
    is strictly tighter than the per-key bound the session/as-of operators
    already accept.
    """
    from ray.data.aggregate import Sum

    width_us = width_s * 1_000_000
    if bucket_width_s is None:
        bucket_width_s = width_s * 32
    if bucket_width_s < width_s:
        raise ValueError("bucket_width_s must be >= width_s")
    bucket_us = bucket_width_s * 1_000_000
    id_type = left_ds.schema().base_schema.field(left_id).type

    def norm_left(batch: pa.Table) -> pa.Table:
        ts = _ts_to_us(batch.column(left_ts)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        key = batch.column(left_key).combine_chunks()
        ids = batch.column(left_id).combine_chunks()
        b0 = ts // bucket_us
        b1 = (ts + width_us - 1) // bucket_us  # last bucket touched
        # bucket b0 probe for every row; b1 probe only when distinct
        second = b1 != b0
        keys = pa.concat_arrays([key, key.filter(pa.array(second))])
        tss = np.concatenate([ts, ts[second]])
        buckets = np.concatenate([b0, b1[second]])
        idv = pa.concat_arrays([ids, ids.filter(pa.array(second))])
        n = len(tss)
        return pa.Table.from_arrays(
            [keys, pa.array(buckets, pa.int64()),
             pa.array(tss, pa.int64()),
             pa.array(np.zeros(n, dtype=np.int8)), idv],
            names=["__k", "__b", "__ts", "__side", "__id"])

    def norm_right(batch: pa.Table) -> pa.Table:
        ts = _ts_to_us(batch.column(right_ts)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = len(ts)
        return pa.Table.from_arrays(
            [batch.column(right_key).combine_chunks(),
             pa.array(ts // bucket_us, pa.int64()),
             pa.array(ts, pa.int64()),
             pa.array(np.ones(n, dtype=np.int8)),
             pa.nulls(n, id_type)],
            names=["__k", "__b", "__ts", "__side", "__id"])

    if right_ds is None:
        # self-join: one read and one normalization pass emits BOTH the
        # probe rows and the event rows for each input row, instead of
        # scanning the same table twice
        def norm_both(batch: pa.Table) -> pa.Table:
            return pa.concat_tables([norm_left(batch), norm_right(batch)])

        merged = left_ds.map_batches(norm_both, batch_format="pyarrow")
    else:
        merged = (left_ds.map_batches(norm_left, batch_format="pyarrow")
                  .union(right_ds.map_batches(norm_right,
                                              batch_format="pyarrow")))
    if shuffle_partitions:
        # the merged rows are 5 narrow columns; inheriting the wide
        # input's block layout pays per-block sort barriers for near-empty
        # blocks (same knob as minhash_dedup_pairs)
        merged = merged.repartition(shuffle_partitions)

    def count_group(group: pa.Table) -> pa.Table:
        side = group.column("__side").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 0))
        if len(left) == 0 or not (side == 1).any():
            return pa.Table.from_arrays(
                [pa.array([], id_type), pa.array([], pa.int64())],
                names=[left_id, "__partial"])
        r_ts = np.sort(group.column("__ts").combine_chunks()
                       .to_numpy(zero_copy_only=False)[side == 1])
        l_ts = left.column("__ts").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lo = np.searchsorted(r_ts, l_ts, side="left")
        # count right ts in [t, t + width); the group only holds this
        # bucket's right rows, so no extra clamp is needed
        hi = np.searchsorted(r_ts, l_ts + width_us, side="left")
        cnt = hi - lo
        nz = cnt > 0
        return pa.Table.from_arrays(
            [left.column("__id").filter(pa.array(nz)),
             pa.array(cnt[nz], pa.int64())],
            names=[left_id, "__partial"])

    partials = merged.groupby(["__k", "__b"]).map_groups(
        count_group, batch_format="pyarrow")
    agg = partials.groupby(left_id).aggregate(Sum("__partial"))

    def rename(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns([left_id, out_col])
        return batch.set_column(
            1, out_col, batch.column(out_col).cast(pa.int64()))

    return agg.map_batches(rename, batch_format="pyarrow")


def hopping_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                       width_s: int = 3600, hop_s: int = 1800):
    """Hopping (sliding) window count per key: windows of ``width_s``
    starting every ``hop_s`` (width must be a multiple of hop). Each row
    belongs to exactly width/hop overlapping windows, so assignment is a
    stateless vectorized replication (factor width/hop — bounded and known
    up front, never data-dependent) followed by the ordinary combiner
    groupby; no ordering or co-location assumptions at all. Returns
    (window_start, key, n_events)."""
    if width_s % hop_s != 0:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s
    hop_us = hop_s * 1_000_000
    from .shuffle import combine_aggregate

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // hop_us) * hop_us
        starts = np.concatenate([base - j * hop_us for j in range(k)])
        key = batch.column(key_col)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        keys = pa.concat_arrays([key] * k)
        return pa.Table.from_arrays(
            [pa.array(starts, pa.int64()).cast(pa.timestamp("us")), keys],
            names=["window_start", key_col])

    assigned = ds.select_columns([ts_col, key_col]).map_batches(
        assign, batch_format="pyarrow")
    agg = combine_aggregate(assigned, ["window_start", key_col],
                            [("", "count", "n_events")])

    def us_start(batch: pa.Table) -> pa.Table:
        # groupby round-trips timestamps at seconds resolution; restore [us]
        return batch.set_column(
            0, "window_start",
            batch.column("window_start").cast(pa.timestamp("us")))

    return agg.map_batches(us_start, batch_format="pyarrow")


# ------------------------------------------------------------ event funnel

def funnel_match_group(group: pa.Table, *, steps: tuple[str, ...],
                       ts_col: str = "ts", user_col: str = "user_id",
                       type_col: str = "event_type") -> pa.Table:
    """Coarse-group kernel: greedy earliest-match of the ordered step
    sequence per user. A user qualifies when step[0]'s first event is
    followed by a strictly-later step[1], which is followed by a
    strictly-later step[2], and so on; emitted timestamps are that greedy
    chain (the canonical funnel semantics — equivalent to the nested
    min-ts-after-previous-step SQL).

    One group holds MANY users (the caller groups on user_id % K, not
    user_id): the sort and segmentation are vectorized, and the Python
    loop advances per user per step, each step one np.searchsorted."""
    n = group.num_rows
    ts_names = [f"{s}_ts" for s in steps]
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64())]
            + [pa.array([], pa.timestamp("us")) for _ in steps],
            names=[user_col, *ts_names])
    users = group.column(user_col).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    us = group.column(ts_col).combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    step_idx = {s: i for i, s in enumerate(steps)}
    types = np.array([step_idx.get(t, -1)
                      for t in group.column(type_col).to_pylist()],
                     dtype=np.int64)
    order = np.lexsort((us, users))
    users, us, types = users[order], us[order], types[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], users[1:] != users[:-1])))
    ends = np.append(starts[1:], n)
    out_user: list[int] = []
    out_ts: list[list[int]] = [[] for _ in steps]
    for b, e in zip(starts, ends):
        t_prev = -1 << 62
        chain: list[int] = []
        for si in range(len(steps)):
            seg_ts = us[b:e]
            mask = (types[b:e] == si) & (seg_ts > t_prev)
            hits = np.flatnonzero(mask)
            if len(hits) == 0:
                chain = []
                break
            t_prev = int(seg_ts[hits[0]])
            chain.append(t_prev)
        if chain:
            out_user.append(int(users[b]))
            for si, t in enumerate(chain):
                out_ts[si].append(t)
    return pa.Table.from_arrays(
        [pa.array(out_user, pa.int64())]
        + [pa.array(col, pa.int64()).cast(pa.timestamp("us"))
           for col in out_ts],
        names=[user_col, *ts_names])


def funnel_users(ds, *, steps: tuple[str, ...] = ("view", "click",
                                                  "purchase"),
                 ts_col: str = "ts", user_col: str = "user_id",
                 type_col: str = "event_type", coarse: int = 64):
    """Ordered-sequence (funnel) detection: users whose event stream
    contains the steps in order with strictly increasing timestamps,
    with the greedy earliest chain's timestamps.

    Plan shape: filter to step events + project 3 narrow columns BEFORE
    the shuffle, then ONE groupby on user_id % ``coarse`` (not user_id:
    one Python dispatch per coarse group instead of per user) and a
    vectorized per-group scan. Raise ``coarse`` with cluster size; skew
    is bounded by the busiest coarse bucket."""
    step_set = list(steps)

    def prefilter(batch: pa.Table) -> pa.Table:
        batch = batch.select([user_col, ts_col, type_col])
        mask = pc.is_in(batch.column(type_col),
                        value_set=pa.array(step_set))
        batch = batch.filter(mask)
        ukey = pc.cast(batch.column(user_col), pa.int64())
        ukey = np.mod(ukey.combine_chunks().to_numpy(
            zero_copy_only=False) if isinstance(ukey, pa.ChunkedArray)
            else ukey.to_numpy(zero_copy_only=False), coarse)
        return batch.append_column("ukey", pa.array(ukey, pa.int64()))

    return (ds.map_batches(prefilter, batch_format="pyarrow")
            .groupby("ukey")
            .map_groups(funnel_match_group,
                        fn_kwargs=dict(steps=tuple(steps), ts_col=ts_col,
                                       user_col=user_col,
                                       type_col=type_col),
                        batch_format="pyarrow"))
