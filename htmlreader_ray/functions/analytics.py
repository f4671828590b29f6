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


def _segments(uid_sorted: np.ndarray):
    """Boundary arithmetic shared by the windowed kernels: for a
    user-sorted id array return (seg_id, starts) where ``starts[seg_id]``
    is each row's segment-start index."""
    new_user = np.r_[True, uid_sorted[1:] != uid_sorted[:-1]]
    seg_id = np.cumsum(new_user) - 1
    starts = np.flatnonzero(new_user)
    return seg_id, starts


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    """floor(value * 100) as int64 — elementwise IEEE double multiply +
    floor, bit-identical to the oracle's ``CAST(floor(value*100) AS
    BIGINT)`` regardless of which engine evaluates it."""
    v = col.combine_chunks().to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0).astype(np.int64)


def running_totals(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                   order_col: str = "event_id", value_col: str = "value",
                   coarse_buckets: int = 256):
    """Per-user cumulative window: running row_number and running
    int-cents sum over (ts, order_col) order — the distributed analogue
    of ``SUM(...) OVER (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``.

    Same coarse-bucket discipline as the other sequence kernels: ONE
    user-bucket shuffle, then a segmented numpy cumsum handles every
    user in the bucket with zero per-user dispatch. Output is one row
    per input event (user_id, event_id, run_n, run_cents), all int64.
    """
    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=[user_col, order_col, "run_n", "run_cents"])
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        cents = _cents(group.column(value_col))
        order = np.lexsort((eid, us, uid))
        uid_s, eid_s, cents_s = uid[order], eid[order], cents[order]
        seg_id, starts = _segments(uid_s)
        cs = np.cumsum(cents_s)
        base = np.r_[0, cs][starts]          # cumsum just before each seg
        run_cents = cs - base[seg_id]
        run_n = np.arange(len(uid_s), dtype=np.int64) - starts[seg_id] + 1
        return pa.Table.from_arrays(
            [pa.array(uid_s), pa.array(eid_s), pa.array(run_n),
             pa.array(run_cents)],
            names=[user_col, order_col, "run_n", "run_cents"])

    return _bucketed(ds.select_columns(
        [user_col, ts_col, order_col, value_col]),
        user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def moving_window_sums(ds, *, win: int = 4, ts_col: str = "ts",
                       user_col: str = "user_id",
                       order_col: str = "event_id",
                       value_col: str = "value",
                       coarse_buckets: int = 256):
    """Per-user sliding window (ROWS ``win``-1 PRECEDING .. CURRENT ROW):
    window row count and window int-cents sum, exact via prefix-sum
    differences clamped at segment starts. One user-bucket shuffle; the
    window never crosses a user so bucket-local evaluation is exact.
    Output (user_id, event_id, win_n, win_cents) int64, one row per
    event."""
    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=[user_col, order_col, "win_n", "win_cents"])
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        cents = _cents(group.column(value_col))
        order = np.lexsort((eid, us, uid))
        uid_s, eid_s, cents_s = uid[order], eid[order], cents[order]
        seg_id, starts = _segments(uid_s)
        csp = np.r_[0, np.cumsum(cents_s)]   # csp[i+1] = sum through i
        gidx = np.arange(len(uid_s), dtype=np.int64)
        lo = np.maximum(gidx - (win - 1), starts[seg_id])
        win_cents = csp[gidx + 1] - csp[lo]
        win_n = gidx + 1 - lo
        return pa.Table.from_arrays(
            [pa.array(uid_s), pa.array(eid_s), pa.array(win_n),
             pa.array(win_cents)],
            names=[user_col, order_col, "win_n", "win_cents"])

    return _bucketed(ds.select_columns(
        [user_col, ts_col, order_col, value_col]),
        user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def pivot_counts(ds, *, user_col: str = "user_id",
                 type_col: str = "event_type",
                 types: tuple[str, ...] = ("view", "click", "purchase",
                                           "signup", "error")):
    """Pivot (long -> wide): per-user event counts, one int64 column per
    known type. The type set is a pipeline constant (mirrored verbatim in
    the oracle's FILTER clauses), so the kernel is a pure combiner: each
    block appends one 0/1 indicator column per type and group_by(user)-
    sums them locally; the global shuffle then moves one row per
    (block, user) with len(types)+1 small ints — never the event rows."""
    from ray.data.aggregate import Sum
    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * (1 + len(types)),
                names=[user_col, *cols])
        tc = batch.column(type_col)
        arrs = [batch.column(user_col)]
        for t in types:
            arrs.append(pc.cast(pc.equal(tc, t), pa.int64()))
        wide = pa.Table.from_arrays(arrs, names=[user_col, *cols])
        return wide.group_by(user_col).aggregate(
            [(c, "sum") for c in cols]).rename_columns([user_col, *cols])

    partials = ds.select_columns([user_col, type_col]).map_batches(
        partial, batch_format="pyarrow")
    agg = partials.groupby(user_col).aggregate(*[Sum(c) for c in cols])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([user_col, *cols])

    return agg.map_batches(rename, batch_format="pyarrow")


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


def next_event_per_user(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                        type_col: str = "event_type",
                        order_col: str = "event_id",
                        coarse_buckets: int = 256):
    """LEAD(type) OVER (PARTITION BY user ORDER BY ts, order_col).

    Per-row window function without a global sort: rows shuffle once by
    a coarse user-hash bucket (every row of a user lands in one group),
    then the group kernel lexsorts (user, ts, order) and reads each
    row's successor with a vectorized shifted take — the last event of
    a user gets NULL. Output is one row per input row, so this is the
    LEAD twin of ``event_gap_stats``'s LAG (reference semantics:
    sequential enumeration order, HTMLReader Sources/HTMLDocument.m
    tree order analogue)."""
    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.string())],
                names=[order_col, "next_event_type"])
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, us, uid))
        uid_s = uid[order]
        n = len(order)
        same = np.zeros(n, dtype=bool)
        same[:-1] = uid_s[1:] == uid_s[:-1]
        nxt = np.zeros(n, dtype=np.int64)
        nxt[:-1] = order[1:]
        types = group.column(type_col).combine_chunks()
        vals = pc.if_else(pa.array(same),
                          types.take(pa.array(nxt)),
                          pa.scalar(None, pa.string()))
        return pa.Table.from_arrays(
            [pa.array(eid[order]), vals],
            names=[order_col, "next_event_type"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def time_weighted_parts(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                        val_col: str = "value", order_col: str = "event_id",
                        coarse_buckets: int = 256):
    """Time-weighted-average sufficient statistics per user, exactly:
    for each consecutive same-user event pair (i -> i+1) the EARLIER
    event's integer cents are weighted by the pair's gap in integer ms
    (gap_us // 1000). Returns (user_id, n_pairs, total_gap_ms, sum_w)
    with sum_w = Σ cents_i · gap_ms_i — all int64 (cents < 10^5,
    per-pair product < 10^15), so the time-weighted mean
    sum_w / total_gap_ms is driver arithmetic and the distributed part
    is order-independent. Users with < 2 events emit no row (SQL
    GROUP-BY-over-pairs mirror). A user's rows land in ONE bucket
    group, so the kernel emits final per-user rows — no second
    shuffle."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=[user_col, "n_pairs", "total_gap_ms", "sum_w"])
        if group.num_rows < 2:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        cents = np.floor(
            _np(group.column(val_col)) * 100.0).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid_s, us_s, c_s = uid[order], us[order], cents[order]
        same = uid_s[1:] == uid_s[:-1]
        if not same.any():
            return empty
        gap_ms = (np.diff(us_s) // 1000)[same]
        w = c_s[:-1][same] * gap_ms
        users = uid_s[:-1][same]
        t = pa.table({user_col: users, "gap": gap_ms, "w": w})
        g = t.group_by(user_col).aggregate(
            [([], "count_all"), ("gap", "sum"), ("w", "sum")])
        return pa.Table.from_arrays(
            [g.column(user_col),
             pc.cast(g.column("count_all"), pa.int64()),
             g.column("gap_sum"), g.column("w_sum")],
            names=[user_col, "n_pairs", "total_gap_ms", "sum_w"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def interval_coverage(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                      order_col: str = "event_id",
                      length_us: int = 300_000_000,
                      coarse_buckets: int = 256):
    """Merged-interval coverage per user for FIXED-length activity
    windows: each event opens [ts, ts + L); overlaps merge. With sorted
    starts and constant L the union length collapses to

        Σ min(next_start − start, L)  over same-user pairs  +  L

    (the interval-merge sweep without a segmented cummax), so the
    kernel is the same vectorized lexsort + masked diff as
    event_gap_stats, clipped at L — exact int64 microseconds end to
    end. One row per user; a user's events land in one bucket group so
    the kernel emits final rows."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=[user_col, "covered_us"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, us, uid))
        uid_s, us_s = uid[order], us[order]
        same = uid_s[1:] == uid_s[:-1]
        contrib = np.minimum(np.diff(us_s), length_us)
        # per-pair clipped gaps attribute to the earlier event's user;
        # every user additionally contributes one trailing L
        pair_users = uid_s[:-1][same]
        t = pa.table({user_col: np.concatenate([pair_users,
                                                np.unique(uid_s)]),
                      "c": np.concatenate([contrib[same],
                                           np.full(len(np.unique(uid_s)),
                                                   length_us,
                                                   dtype=np.int64)])})
        g = t.group_by(user_col).aggregate([("c", "sum")])
        return pa.Table.from_arrays(
            [g.column(user_col), g.column("c_sum")],
            names=[user_col, "covered_us"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def last_touch_attribution(ds, *, ts_col: str = "ts",
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           order_col: str = "event_id",
                           convert_type: str = "purchase",
                           touch_type: str = "click",
                           coarse_buckets: int = 256):
    """Last-touch attribution: each conversion event is credited to the
    SAME user's most recent touch event strictly before it in
    (ts, order_col) order; conversions with no prior touch get -1 (a
    null-free int contract). The kernel is one lexsort + a segmented
    running-max of touch positions (the per-segment offset trick keeps
    np.maximum.accumulate from leaking across users) — no Python loop
    over rows or users."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=[order_col, "touch_id"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        types = np.asarray(group.column(type_col).to_pylist(),
                           dtype=object)
        order = np.lexsort((eid, us, uid))
        uid_s, eid_s = uid[order], eid[order]
        t_s = types[order]
        n = len(order)
        seg_id, _ = _segments(uid_s)
        is_touch = t_s == touch_type
        pos = np.where(is_touch, np.arange(n, dtype=np.int64), -1)
        # strictly-before: shift by one so a conversion never credits a
        # touch at its own position (types differ anyway) or after it
        offs = seg_id * np.int64(n + 1)
        run = np.maximum.accumulate(pos + offs) - offs
        prev = np.full(n, -1, dtype=np.int64)
        prev[1:] = run[:-1]
        # the first row of each user segment must not inherit the
        # previous user's running max
        _, seg_starts = _segments(uid_s)
        prev[seg_starts] = -1
        is_conv = t_s == convert_type
        conv_idx = np.flatnonzero(is_conv)
        touch_pos = prev[conv_idx]
        touch_id = np.where(touch_pos >= 0, eid_s[np.maximum(touch_pos, 0)],
                            -1)
        return pa.Table.from_arrays(
            [pa.array(eid_s[conv_idx]), pa.array(touch_id)],
            names=[order_col, "touch_id"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def copurchase_topk(ds, *, order_col: str = "l_orderkey",
                    item_col: str = "l_partkey", top_k: int = 25,
                    coarse_buckets: int = 256):
    """Market-basket co-purchase affinity: the top-K item pairs by the
    number of DISTINCT orders containing both items (pair counted once
    per order regardless of line-item multiplicity).

    Scale shape: (order, item) rows are block-pre-distincted, then one
    order-bucket shuffle co-locates each order; pair expansion inside
    the kernel is grouped by segment LENGTH (one np.triu_indices per
    distinct basket size, broadcast across all baskets of that size —
    no per-order Python loop) and is bounded by basket_size² per
    order, not corpus size. Pair counts flow through a combiner
    groupby and a block-local + single-merge top-K — no global sort.
    """
    from .shuffle import combine_aggregate

    def predistinct(batch: pa.Table) -> pa.Table:
        return batch.select([order_col, item_col]) \
            .group_by([order_col, item_col]).aggregate([])

    def pair_kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=["part_a", "part_b", "n"])
        if group.num_rows < 2:
            return empty
        ok = _np(group.column(order_col))
        it = _np(group.column(item_col))
        order = np.lexsort((it, ok))
        ok, it = ok[order], it[order]
        # block-local predistinct can still leave cross-block dups of
        # the same (order, item); the bucket group sees them all
        keep = np.ones(len(ok), dtype=bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (it[1:] != it[:-1])
        ok, it = ok[keep], it[keep]
        _, seg_starts = _segments(ok)
        counts = np.diff(np.append(seg_starts, len(ok)))
        a_parts, b_parts = [], []
        for size in np.unique(counts):
            if size < 2:
                continue
            starts = seg_starts[counts == size]
            i, j = np.triu_indices(int(size), k=1)
            m = it[starts[:, None] + np.arange(int(size))]
            # items are sorted within each segment, so m[:, i] < m[:, j]
            a_parts.append(m[:, i].ravel())
            b_parts.append(m[:, j].ravel())
        if not a_parts:
            return empty
        t = pa.table({"part_a": np.concatenate(a_parts),
                      "part_b": np.concatenate(b_parts)})
        g = t.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return g.select(["part_a", "part_b", "count_all"]) \
            .rename_columns(["part_a", "part_b", "n"])

    pairs = _bucketed(ds.map_batches(predistinct, batch_format="pyarrow"),
                      order_col, coarse_buckets) \
        .map_groups(pair_kernel, batch_format="pyarrow")
    agg = combine_aggregate(pairs, ["part_a", "part_b"],
                            [("n", "sum", "n_orders")])

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[
            ("n_orders", "descending"), ("part_a", "ascending"),
            ("part_b", "ascending")])
        return batch.take(idx.slice(0, min(top_k, len(idx))))

    return agg.map_batches(local_topk, batch_format="pyarrow") \
        .repartition(1).map_batches(local_topk, batch_format="pyarrow")


def basket_size_hist(ds, *, order_col: str = "l_orderkey",
                     item_col: str = "l_partkey",
                     coarse_buckets: int = 256):
    """Histogram of basket breadth: for each order the number of
    DISTINCT items it contains, then the count of orders at each
    breadth.

    Scale shape: block-local (order, item) predistinct, ONE
    order-bucket shuffle (same co-location key as copurchase_topk so
    a shared pipeline reuses the exchange), a vectorized np segment
    count per bucket emitting per-bucket partial histograms
    (n_parts, n) — at most |distinct breadths| rows per bucket —
    then a tiny combiner groupby. The driver never sees per-order
    rows.
    """
    from .shuffle import combine_aggregate

    def predistinct(batch: pa.Table) -> pa.Table:
        return batch.select([order_col, item_col]) \
            .group_by([order_col, item_col]).aggregate([])

    def hist_kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["n_parts", "n"])
        if group.num_rows == 0:
            return empty
        ok = _np(group.column(order_col))
        it = _np(group.column(item_col))
        order = np.lexsort((it, ok))
        ok, it = ok[order], it[order]
        # drop cross-block (order, item) duplicates the block-local
        # predistinct could not see
        keep = np.ones(len(ok), dtype=bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (it[1:] != it[:-1])
        ok = ok[keep]
        _, seg_starts = _segments(ok)
        breadth = np.diff(np.append(seg_starts, len(ok)))
        sizes, counts = np.unique(breadth, return_counts=True)
        return pa.table({"n_parts": sizes.astype(np.int64),
                         "n": counts.astype(np.int64)})

    partials = _bucketed(
        ds.map_batches(predistinct, batch_format="pyarrow"),
        order_col, coarse_buckets).map_groups(
        hist_kernel, batch_format="pyarrow")
    return combine_aggregate(partials, ["n_parts"],
                             [("n", "sum", "n_orders")])


def event_gap_values(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                     type_col: str = "event_type",
                     order_col: str = "event_id",
                     coarse_buckets: int = 256):
    """Per-gap rows (type, gap_us) for downstream exact-order
    statistics (median / percentiles of inter-arrival gaps).

    Same semantics as event_gap_stats — the gap of an event is the
    time since the SAME USER's previous event, ties on ts break by
    ``order_col``, gaps attribute to the later event's type — but
    emits the raw gap VALUES so a grouped value-distribution shuffle
    (shuffle.grouped_percentile_disc) can take exact quantiles; the
    combiner inside that shuffle collapses repeats, so what crosses
    the second exchange is bounded by distinct (type, gap) pairs.
    """
    def gaps_kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=[type_col, "gap_us"])
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
        return pa.Table.from_arrays(
            [types, pa.array(gaps)], names=[type_col, "gap_us"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        gaps_kernel, batch_format="pyarrow")


def activity_streaks(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                     coarse_buckets: int = 256):
    """Islands-and-gaps per user: total distinct active days and the
    longest run of CONSECUTIVE active days.

    Plan: block-local distinct of (user, day) inside map_batches (an
    Arrow group_by, so a hot user's repeat events collapse before the
    exchange), then ONE coarse user-bucket shuffle; the per-bucket
    kernel re-distincts and segments runs with numpy boundary
    arithmetic (day-diff == 1 within a user). Nothing but
    block-distinct (user, day) rows ever cross the wire, and the
    output is one row per user — no window function, no global sort.
    Mirrors the SQL islands idiom (day - ROW_NUMBER() grouping)
    bit-for-bit on integer epoch days.
    """
    def to_days(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int32())],
                names=[user_col, "day"])
        day = pc.cast(batch.column(ts_col), pa.date32())
        t = pa.Table.from_arrays(
            [batch.column(user_col), day], names=[user_col, "day"])
        return t.group_by([user_col, "day"]).aggregate([])

    def streak_kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[user_col, "n_days", "max_streak"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        dy = _np(group.column("day").cast(pa.int32())).astype(np.int64)
        order = np.lexsort((dy, uid))
        uid_s, dy_s = uid[order], dy[order]
        # cross-block duplicates of (user, day) survive the block-local
        # distinct; drop them here
        keep = np.ones(len(uid_s), dtype=bool)
        keep[1:] = (uid_s[1:] != uid_s[:-1]) | (dy_s[1:] != dy_s[:-1])
        uid_s, dy_s = uid_s[keep], dy_s[keep]
        new_run = np.ones(len(uid_s), dtype=bool)
        new_run[1:] = (uid_s[1:] != uid_s[:-1]) | \
            (dy_s[1:] - dy_s[:-1] != 1)
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, len(uid_s)))
        run_user = uid_s[run_starts]
        user_starts = np.flatnonzero(np.concatenate(
            ([True], run_user[1:] != run_user[:-1])))
        n_days = np.add.reduceat(run_len, user_starts)
        max_streak = np.maximum.reduceat(run_len, user_starts)
        return pa.Table.from_arrays(
            [pa.array(run_user[user_starts]),
             pa.array(n_days.astype(np.int64)),
             pa.array(max_streak.astype(np.int64))],
            names=[user_col, "n_days", "max_streak"])

    days = ds.map_batches(to_days, batch_format="pyarrow")
    return _bucketed(days, user_col, coarse_buckets).map_groups(
        streak_kernel, batch_format="pyarrow")


def debounce_events(ds, *, gap_us: int = 300_000_000,
                    ts_col: str = "ts", user_col: str = "user_id",
                    type_col: str = "event_type",
                    order_col: str = "event_id",
                    coarse_buckets: int = 256):
    """Windowed de-duplication filter: keep an event iff the SAME
    (user, type)'s previous event is absent or more than ``gap_us``
    older (the telemetry debounce / at-most-once-per-window rule).
    Ties on ts break by ``order_col`` exactly like the SQL oracle's
    LAG(... ORDER BY ts, event_id), so a same-instant repeat is
    dropped. One coarse user-bucket shuffle; the kernel handles every
    (user, type) run in the bucket with one lexsort + shifted compare.
    """
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.string())],
            names=[order_col, user_col, type_col])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        tarr = group.column(type_col).combine_chunks()
        _, codes = np.unique(np.asarray(tarr), return_inverse=True)
        order = np.lexsort((eid, us, codes, uid))
        uid_s, us_s, code_s = uid[order], us[order], codes[order]
        keep = np.ones(len(uid_s), dtype=bool)
        same = (uid_s[1:] == uid_s[:-1]) & (code_s[1:] == code_s[:-1])
        keep[1:] = ~same | (us_s[1:] - us_s[:-1] > gap_us)
        idx = pa.array(order[keep])
        return pa.Table.from_arrays(
            [group.column(order_col).combine_chunks().take(idx),
             group.column(user_col).combine_chunks().take(idx),
             tarr.take(idx)],
            names=[order_col, user_col, type_col])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def first_k_signature(ds, *, k: int = 3, ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      order_col: str = "event_id",
                      coarse_buckets: int = 256):
    """Per-user prefix signature: the first ``k`` event types (ordered
    by ts, tiebreak order_col) joined with '>' — the Markov-prefix /
    onboarding-funnel shape. One coarse user-bucket shuffle; the
    kernel picks each user's first k rows with numpy segment
    arithmetic and composes signatures with Arrow
    binary_join_element_wise per prefix length (no per-user Python
    loop). Returns Dataset[(user_id, sig)]."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.string())],
            names=[user_col, "sig"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, us, uid))
        uid_s = uid[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], uid_s[1:] != uid_s[:-1])))
        counts = np.diff(np.append(starts, len(uid_s)))
        take_n = np.minimum(counts, k)
        types = group.column(type_col).combine_chunks()
        users = uid_s[starts]
        cols = []  # cols[j] = j-th event type per user (None if absent)
        for j in range(k):
            idx = starts + j
            has = take_n > j
            safe = np.where(has, idx, starts)
            arr = types.take(pa.array(order[safe]))
            cols.append((has, arr))
        sig = np.empty(len(users), dtype=object)
        for m in range(1, k + 1):
            sel = take_n == m
            if not sel.any():
                continue
            pieces = [cols[j][1].filter(pa.array(sel))
                      for j in range(m)]
            joined = pc.binary_join_element_wise(*pieces, ">") \
                if m > 1 else pieces[0]
            sig[sel] = np.asarray(joined, dtype=object)
        return pa.Table.from_arrays(
            [pa.array(users), pa.array(sig, pa.string())],
            names=[user_col, "sig"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def value_run_stats(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                    value_col: str = "value", order_col: str = "event_id",
                    coarse_buckets: int = 256):
    """Strictly-increasing value runs per user (islands on the value
    sequence ordered by ts, tiebreak order_col): run count and longest
    run, in exact integer cents. Same single-shuffle numpy
    segmentation discipline as activity_streaks."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[user_col, "n_runs", "max_run"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        cents = np.floor(
            100.0 * _np(group.column(value_col)).astype(np.float64)
            + 0.5).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid_s, cents_s = uid[order], cents[order]
        new_run = np.ones(len(uid_s), dtype=bool)
        new_run[1:] = (uid_s[1:] != uid_s[:-1]) | \
            (cents_s[1:] <= cents_s[:-1])
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, len(uid_s)))
        run_user = uid_s[run_starts]
        user_starts = np.flatnonzero(np.concatenate(
            ([True], run_user[1:] != run_user[:-1])))
        n_runs = np.diff(np.append(user_starts, len(run_user)))
        max_run = np.maximum.reduceat(run_len, user_starts)
        return pa.Table.from_arrays(
            [pa.array(run_user[user_starts]),
             pa.array(n_runs.astype(np.int64)),
             pa.array(max_run.astype(np.int64))],
            names=[user_col, "n_runs", "max_run"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def unattributed_conversions(ds, *, window_us: int = 3_600_000_000,
                             ts_col: str = "ts",
                             user_col: str = "user_id",
                             type_col: str = "event_type",
                             order_col: str = "event_id",
                             convert_type: str = "purchase",
                             touch_type: str = "click",
                             coarse_buckets: int = 256):
    """Windowed NOT EXISTS: conversions with NO touch event by the same
    user within ``window_us`` strictly before them ((ts, order_col)
    order, the last_touch_attribution tie rule). Same segmented
    running-max kernel as last-touch, but keeping the touch TIMESTAMP
    so the window check is one vectorized subtract — the sequential
    anti-join shape (unattributed purchases / orphan conversions)."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=[order_col, user_col])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        types = np.asarray(group.column(type_col).to_pylist(),
                           dtype=object)
        order = np.lexsort((eid, us, uid))
        uid_s, us_s, eid_s = uid[order], us[order], eid[order]
        t_s = types[order]
        n = len(order)
        seg_id, seg_starts = _segments(uid_s)
        is_touch = t_s == touch_type
        pos = np.where(is_touch, np.arange(n, dtype=np.int64), -1)
        offs = seg_id * np.int64(n + 1)
        run = np.maximum.accumulate(pos + offs) - offs
        prev = np.full(n, -1, dtype=np.int64)
        prev[1:] = run[:-1]
        prev[seg_starts] = -1
        conv_idx = np.flatnonzero(t_s == convert_type)
        tpos = prev[conv_idx]
        touch_us = us_s[np.maximum(tpos, 0)]
        orphan = (tpos < 0) | (us_s[conv_idx] - touch_us > window_us)
        keep = conv_idx[orphan]
        return pa.Table.from_arrays(
            [pa.array(eid_s[keep]), pa.array(uid_s[keep])],
            names=[order_col, user_col])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def range_window_sums(ds, *, window_us: int = 3_600_000_000,
                      ts_col: str = "ts", user_col: str = "user_id",
                      value_col: str = "value",
                      order_col: str = "event_id",
                      coarse_buckets: int = 256):
    """RANGE-frame window (RANGE BETWEEN INTERVAL .. PRECEDING AND
    CURRENT ROW): per event, the count and integer-cent sum of the
    SAME user's events with ts in [ts − window, ts] — peers (equal ts)
    included on both ends exactly like the SQL RANGE frame. One coarse
    user-bucket shuffle; the kernel is a lexsort + two vectorized
    searchsorted bounds + prefix-sum differences per user segment —
    no per-row loop, no per-user loop."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[order_col, "n_win", "cents_win"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        cents = np.floor(
            100.0 * _np(group.column(value_col)).astype(np.float64)
            + 0.5).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid_s, us_s, c_s = uid[order], us[order], cents[order]
        n = len(order)
        seg_id, seg_starts = _segments(uid_s)
        seg_ends = np.append(seg_starts[1:], n)
        # offset each user's timestamps into a disjoint range so ONE
        # global searchsorted respects segment boundaries
        span = (us_s.max() - us_s.min()) + window_us + 1 if n else 1
        key = us_s.astype(np.int64) - us_s.min() \
            + seg_id * np.int64(span)
        lo = np.searchsorted(key, key - window_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        pref = np.concatenate(([0], np.cumsum(c_s)))
        return pa.Table.from_arrays(
            [pa.array(eid[order]),
             pa.array((hi - lo).astype(np.int64)),
             pa.array(pref[hi] - pref[lo])],
            names=[order_col, "n_win", "cents_win"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def user_transition_entropy(ds, *, ts_col: str = "ts",
                            user_col: str = "user_id",
                            type_col: str = "event_type",
                            order_col: str = "event_id",
                            coarse_buckets: int = 256):
    """Per-user behavioral-sequence entropy: Shannon entropy (e6 fixed
    point) of each user's (type -> next type) transition distribution,
    ordered by ts (tiebreak ``order_col``). Users with fewer than two
    events have no transitions and are omitted — the SQL LEAD/GROUP BY
    contract. Same single coarse-bucket shuffle + numpy segmentation
    discipline as first_k_signature; the per-(user, pair) cell counts
    come from one np.unique over packed keys, and the quantized-ln
    term L = floor(1e6·ln(n/tot)+0.5) is evaluated with np.log —
    bit-identical to math.log and DuckDB LN on this platform (libm;
    the bigram_pmi/indexing.py contract) — so the per-user aggregate
    -Σ n·L // tot is exact integer."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[user_col, "n_trans", "ent_e6"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, us, uid))
        uid_s = uid[order]
        types = group.column(type_col).combine_chunks()
        tcodes, tidx = np.unique(np.asarray(types), return_inverse=True)
        tc_s = tidx[order]
        same = uid_s[1:] == uid_s[:-1]
        if not same.any():
            return empty
        u_pair = uid_s[:-1][same]
        c1 = tc_s[:-1][same].astype(np.int64)
        c2 = tc_s[1:][same].astype(np.int64)
        k = len(tcodes)
        key = (u_pair * k + c1) * k + c2
        ukey, cnt = np.unique(key, return_counts=True)
        cell_uid = ukey // (k * k)
        # per-user transition totals over the cell table
        uu, uinv = np.unique(cell_uid, return_inverse=True)
        tot = np.bincount(uinv, weights=cnt).astype(np.int64)
        L = np.floor(1_000_000.0 * np.log(
            cnt.astype(np.float64) / tot[uinv]) + 0.5).astype(np.int64)
        acc = np.bincount(uinv, weights=cnt * L).astype(np.int64)
        ent = -acc // tot
        return pa.Table.from_arrays(
            [pa.array(uu), pa.array(tot), pa.array(ent)],
            names=[user_col, "n_trans", "ent_e6"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")


def late_event_arrivals(ds, *, ts_col: str = "ts",
                        user_col: str = "user_id",
                        order_col: str = "event_id",
                        lateness_us: int = 3_600_000_000,
                        coarse_buckets: int = 256):
    """Watermark / out-of-order-arrival audit per user.

    Treating ``order_col`` as ARRIVAL order, an event is LATE when its
    event time ``ts`` sits more than ``lateness_us`` behind the user's
    running max event time over strictly earlier arrivals — the
    watermark test a streaming ingester applies before dropping or
    side-outputting a record. A user's first arrival is never late.
    ONE coarse user-bucket exchange; inside the group a per-user
    ``np.maximum.accumulate`` running max (segment loop bounded by the
    users in the bucket) — no global sort. Returns
    (user_id, n_events, n_late)."""
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[user_col, "n_events", "n_late"])
        if group.num_rows == 0:
            return empty
        uid = _np(group.column(user_col))
        us = _np(group.column(ts_col).cast(pa.int64()))
        eid = _np(group.column(order_col))
        order = np.lexsort((eid, uid))
        uid_s, us_s = uid[order], us[order]
        n = len(order)
        late = np.zeros(n, dtype=bool)
        starts = np.flatnonzero(
            np.r_[True, uid_s[1:] != uid_s[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            if e - s > 1:
                cm = np.maximum.accumulate(us_s[s:e])
                late[s + 1:e] = us_s[s + 1:e] < cm[:-1] - lateness_us
        users = uid_s[starts]
        n_events = (ends - starts).astype(np.int64)
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        return pa.Table.from_arrays(
            [pa.array(users.astype(np.int64)), pa.array(n_events),
             pa.array(n_late.astype(np.int64))],
            names=[user_col, "n_events", "n_late"])

    return _bucketed(ds, user_col, coarse_buckets).map_groups(
        kernel, batch_format="pyarrow")
