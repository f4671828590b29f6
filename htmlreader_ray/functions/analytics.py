"""Per-entity sequence analytics: lag gaps, retention cohorts,
co-occurrence.

All three share one plan shape: a single COARSE groupby
(``user_id % coarse_buckets``) feeding a vectorized per-bucket kernel
that handles every user in the bucket with numpy boundary arithmetic
(lexsort + diff/reduce on user-change flags), then a narrow global
groupby over a low-cardinality key. The coarse key matters at scale: a
per-user ``map_groups`` pays ~0.5 ms of dispatch per group, which at
millions of users dwarfs the work; 256 buckets amortize it to nothing
while staying perfectly parallel. No broadcast, no driver
materialization; the only all-to-all is the user-bucket partitioning.
Integer outputs (counts / microsecond sums) keep the results
hash-stable against the SQL-window-function oracles.

Reference scope note: the reference engine (nolanw/HTMLReader) has no
event analytics; these are the beyond-reference training-data/telemetry
operators the graft adds (lag/lead deltas, cohort retention, pairwise
co-occurrence are the standard warehouse shapes)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DAY_US = 86_400_000_000


def _np(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False)


def _bucketed(ds, user_col: str, coarse_buckets: int):
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(batch.column(user_col),
                                    coarse_buckets - 1), pa.int32())
        return batch.append_column("__bucket", b)
    return ds.map_batches(add_bucket, batch_format="pyarrow") \
             .groupby("__bucket")


def event_gap_stats(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                    type_col: str = "event_type",
                    order_col: str = "event_id",
                    coarse_buckets: int = 256):
    """Inter-arrival gap statistics per event type.

    The gap of an event is the time since the SAME USER's previous event
    (any type); the first event of a user has no gap. Ties on ts break
    by ``order_col`` — pinned identically in the SQL oracle's
    ``lag() OVER (ORDER BY ts, event_id)``. Gaps attribute to the later
    event's type. Returns (event_type, n_gaps, sum_gap_us, max_gap_us),
    all int64-exact (no float averaging in the distributed part).
    """
    def gaps_kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=[type_col, "n_gaps", "sum_gap_us", "max_gap_us"])
        if group.num_rows < 2:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, us, uid))
        uid_s, us_s = uid[order], us[order]
        same_user = uid_s[1:] == uid_s[:-1]
        if not same_user.any():
            return empty
        gaps = np.diff(us_s)[same_user]
        pos = np.flatnonzero(same_user) + 1
        types = group.column(type_col).combine_chunks() \
            .take(pa.array(order[pos]))
        part = (pa.Table.from_arrays(
            [types, pa.array(gaps)], names=[type_col, "gap"])
            .group_by(type_col)
            .aggregate([("gap", "count"), ("gap", "sum"), ("gap", "max")]))
        return pa.Table.from_arrays(
            [part.column(type_col),
             pc.cast(part.column("gap_count"), pa.int64()),
             part.column("gap_sum"), part.column("gap_max")],
            names=[type_col, "n_gaps", "sum_gap_us", "max_gap_us"])

    from ray.data.aggregate import Max, Sum
    partials = _bucketed(ds, user_col, coarse_buckets).map_groups(
        gaps_kernel, batch_format="pyarrow")
    agg = (partials.groupby(type_col)
           .aggregate(Sum("n_gaps"), Sum("sum_gap_us"), Max("max_gap_us")))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [type_col, "n_gaps", "sum_gap_us", "max_gap_us"])

    return agg.map_batches(rename, batch_format="pyarrow")


def retention_cohorts(ds, *, ts_col: str = "ts",
                      user_col: str = "user_id",
                      coarse_buckets: int = 256):
    """Classic cohort retention: users grouped by their first active day,
    counted on each later day-offset they return.

    The bucket kernel computes every user's cohort (min day) and
    distinct active days in one lexsort pass and emits the DISTINCT
    (cohort_day, day_offset) rows — bounded by users x span-days — so
    the global count is a plain row count per (cohort_day, day_offset).
    Returns (cohort_day timestamp[us], day_offset int64, n_users int64).
    """
    def cohort_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["cohort_us", "day_offset"])
        uid = _np(group.column(user_col))
        days = _np(group.column(ts_col).cast(pa.int64())) // _DAY_US
        order = np.lexsort((days, uid))
        uid_s, days_s = uid[order], days[order]
        new_user = np.r_[True, uid_s[1:] != uid_s[:-1]]
        # sorted by day within user, so the user's first row is its min
        cohort_per_user = days_s[new_user]
        user_idx = np.cumsum(new_user) - 1
        distinct = new_user | np.r_[False, days_s[1:] != days_s[:-1]]
        cohorts = cohort_per_user[user_idx[distinct]]
        offsets = days_s[distinct] - cohorts
        return pa.Table.from_arrays(
            [pa.array(cohorts * _DAY_US), pa.array(offsets)],
            names=["cohort_us", "day_offset"])

    from ray.data.aggregate import Count
    rows = _bucketed(ds, user_col, coarse_buckets).map_groups(
        cohort_kernel, batch_format="pyarrow")
    agg = rows.groupby(["cohort_us", "day_offset"]).aggregate(Count())

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("cohort_us").cast(pa.timestamp("us")),
             batch.column("day_offset"),
             pc.cast(batch.column("count()"), pa.int64())],
            names=["cohort_day", "day_offset", "n_users"])

    return agg.map_batches(project, batch_format="pyarrow")


def type_cooccurrence(ds, *, user_col: str = "user_id",
                      type_col: str = "event_type",
                      coarse_buckets: int = 256):
    """How many users exhibit each PAIR of event types.

    The bucket kernel reduces its rows to distinct (user, type) with one
    Arrow group_by, then walks user boundaries emitting sorted type
    pairs (a < b) — bounded by C(n_types, 2) per user, a constant for
    any real event taxonomy — so the self-join the SQL oracle runs never
    happens row-wise here; hot users cost O(types²), not O(events²).
    Returns (type_a, type_b, n_users int64)."""
    def pair_kernel(group: pa.Table) -> pa.Table:
        a_out: list = []
        b_out: list = []
        if group.num_rows:
            d = (group.select([user_col, type_col])
                 .group_by([user_col, type_col]).aggregate([]))
            uid = _np(d.column(user_col))
            types = d.column(type_col).to_pylist()
            order = np.lexsort((np.asarray(types, dtype=object), uid))
            uid_s = uid[order]
            bounds = np.flatnonzero(
                np.r_[True, uid_s[1:] != uid_s[:-1]]).tolist()
            bounds.append(len(uid_s))
            for s, e in zip(bounds[:-1], bounds[1:]):
                tl = [types[order[i]] for i in range(s, e)]
                for i in range(len(tl)):
                    for j in range(i + 1, len(tl)):
                        a_out.append(tl[i])
                        b_out.append(tl[j])
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.string()), pa.array(b_out, pa.string())],
            names=["type_a", "type_b"])

    from ray.data.aggregate import Count
    pairs = _bucketed(ds.select_columns([user_col, type_col]),
                      user_col, coarse_buckets).map_groups(
        pair_kernel, batch_format="pyarrow")
    agg = pairs.groupby(["type_a", "type_b"]).aggregate(Count())

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("type_a"), batch.column("type_b"),
             pc.cast(batch.column("count()"), pa.int64())],
            names=["type_a", "type_b", "n_users"])

    return agg.map_batches(project, batch_format="pyarrow")
