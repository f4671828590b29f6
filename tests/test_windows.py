"""Windowed / ordered operator tests."""

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pytest

from htmlreader_ray.functions.windows import (asof_join_broadcast,
                                              assign_tumbling_window,
                                              session_windows,
                                              sessionize_group,
                                              tumbling_window_agg)


def ts(*args):
    return datetime(*args)


def events_table(rows):
    return pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.timestamp("us")),
         pa.array([float(r[2]) for r in rows], pa.float64()),
         pa.array([r[3] for r in rows], pa.string())],
        names=["user_id", "ts", "value", "event_type"])


def test_assign_tumbling_window():
    t = events_table([
        (1, ts(2024, 1, 1, 10, 5), 1.0, "a"),
        (1, ts(2024, 1, 1, 10, 59), 2.0, "a"),
        (1, ts(2024, 1, 1, 11, 0), 3.0, "a"),
    ])
    out = assign_tumbling_window(t, width_s=3600)
    starts = out.column("window_start").to_pylist()
    assert starts[0] == starts[1] == ts(2024, 1, 1, 10)
    assert starts[2] == ts(2024, 1, 1, 11)


def test_sessionize_group_gaps():
    t = events_table([
        (7, ts(2024, 1, 1, 10, 0), 1, "a"),
        (7, ts(2024, 1, 1, 10, 20), 1, "a"),   # same session (<=30m)
        (7, ts(2024, 1, 1, 12, 0), 1, "a"),    # new session
        (7, ts(2024, 1, 1, 12, 29), 1, "a"),   # same
    ])
    out = sessionize_group(t, gap_s=1800)
    rows = out.to_pylist()
    assert [(r["session_id"], r["n_events"]) for r in rows] == [(1, 2), (2, 2)]
    assert rows[0]["session_start"] == ts(2024, 1, 1, 10, 0)
    assert rows[0]["session_end"] == ts(2024, 1, 1, 10, 20)


def test_session_windows_ray(ray_session):
    import ray.data
    t = events_table([
        (1, ts(2024, 1, 1, 10, 0), 1, "a"),
        (2, ts(2024, 1, 1, 10, 0), 1, "a"),
        (1, ts(2024, 1, 1, 13, 0), 1, "a"),
    ])
    out = session_windows(ray.data.from_arrow(t)).take_all()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["session_id"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_asof_join_directions(ray_session):
    import ray.data
    left = pa.Table.from_arrays(
        [pa.array([1, 1, 2], pa.int64()),
         pa.array([ts(2024, 1, 5), ts(2024, 1, 1), ts(2024, 1, 5)],
                  pa.timestamp("us"))],
        names=["k", "t"])
    right = [
        {"k": 1, "t": ts(2024, 1, 2), "v": 10},
        {"k": 1, "t": ts(2024, 1, 4), "v": 20},
        {"k": 2, "t": ts(2024, 1, 9), "v": 30},
    ]
    back = asof_join_broadcast(
        ray.data.from_arrow(left), right, left_key="k", left_ts="t",
        right_key="k", right_ts="t", right_val="v", out_col="v",
        direction="backward").take_all()
    got = {(r["k"], r["t"]): r["v"] for r in back}
    assert got[(1, ts(2024, 1, 5))] == 20
    assert got[(1, ts(2024, 1, 1))] is None
    assert got[(2, ts(2024, 1, 5))] is None
    fwd = asof_join_broadcast(
        ray.data.from_arrow(left), right, left_key="k", left_ts="t",
        right_key="k", right_ts="t", right_val="v", out_col="v",
        direction="forward").take_all()
    got = {(r["k"], r["t"]): r["v"] for r in fwd}
    assert got[(1, ts(2024, 1, 1))] == 10
    assert got[(1, ts(2024, 1, 5))] is None
    assert got[(2, ts(2024, 1, 5))] == 30


def test_tumbling_window_agg_ray(ray_session):
    import ray.data
    t = events_table([
        (1, ts(2024, 1, 1, 10, 5), 1.0, "a"),
        (1, ts(2024, 1, 1, 10, 30), 5.0, "a"),
        (1, ts(2024, 1, 1, 11, 5), 2.0, "a"),
        (1, ts(2024, 1, 1, 10, 10), 9.0, "b"),
    ])
    out = tumbling_window_agg(ray.data.from_arrow(t)).take_all()
    rows = {(r["window_start"], r["event_type"]): r for r in out}
    a10 = rows[(ts(2024, 1, 1, 10), "a")]
    assert a10["n_events"] == 2 and a10["min_value"] == 1.0 \
        and a10["max_value"] == 5.0
    assert rows[(ts(2024, 1, 1, 11), "a")]["n_events"] == 1
    assert rows[(ts(2024, 1, 1, 10), "b")]["n_events"] == 1


def test_asof_join_partitioned_matches_broadcast(ray_session):
    """The partitioned merge must agree with the broadcast binary-search
    implementation on a randomized case, both directions."""
    import ray.data
    from htmlreader_ray.functions.windows import asof_join_partitioned
    rng = np.random.RandomState(3)
    base = ts(2024, 1, 1)
    right_rows = [
        {"user_id": int(rng.randint(0, 5)),
         "ts": base + timedelta(minutes=int(rng.randint(0, 5000))),
         "event_id": int(i)}
        for i in range(200)
    ]
    left_t = pa.Table.from_arrays(
        [pa.array(list(range(80)), pa.int64()),
         pa.array([int(rng.randint(0, 6)) for _ in range(80)], pa.int64()),
         pa.array([base + timedelta(minutes=int(rng.randint(0, 5500)))
                   for _ in range(80)], pa.timestamp("us"))],
        names=["order_id", "cust", "when"])
    right_t = pa.Table.from_arrays(
        [pa.array([r["user_id"] for r in right_rows], pa.int64()),
         pa.array([r["ts"] for r in right_rows], pa.timestamp("us")),
         pa.array([r["event_id"] for r in right_rows], pa.int64())],
        names=["user_id", "ts", "event_id"])
    for direction in ("backward", "forward"):
        # broadcast reference: dedup ties to max event_id first (the
        # partitioned merge resolves ties internally)
        best = {}
        for r in right_rows:
            k = (r["user_id"], r["ts"])
            if k not in best or r["event_id"] > best[k]["event_id"]:
                best[k] = r
        ref = asof_join_broadcast(
            ray.data.from_arrow(left_t), list(best.values()),
            left_key="cust", left_ts="when", right_key="user_id",
            right_ts="ts", right_val="event_id", out_col="hit",
            direction=direction).take_all()
        got = asof_join_partitioned(
            ray.data.from_arrow(left_t), ray.data.from_arrow(right_t),
            left_key="cust", left_ts="when", right_key="user_id",
            right_ts="ts", right_val="event_id", out_col="hit",
            left_carry=["order_id"], direction=direction).take_all()
        ref_m = {r["order_id"]: r["hit"] for r in ref}
        got_m = {r["order_id"]: r["hit"] for r in got}
        assert got_m == ref_m, direction


def test_asof_join_partitioned_tie_break(ray_session):
    """Equal right timestamps resolve to the max right_val."""
    import ray.data
    from htmlreader_ray.functions.windows import asof_join_partitioned
    t0 = ts(2024, 6, 1, 12)
    left = pa.Table.from_arrays(
        [pa.array([1], pa.int64()), pa.array([10], pa.int64()),
         pa.array([t0], pa.timestamp("us"))],
        names=["order_id", "cust", "when"])
    right = pa.Table.from_arrays(
        [pa.array([10, 10, 10], pa.int64()),
         pa.array([t0, t0, t0 + timedelta(hours=1)], pa.timestamp("us")),
         pa.array([7, 9, 1], pa.int64())],
        names=["user_id", "ts", "event_id"])
    for direction, want in (("backward", 9), ("forward", 9)):
        got = asof_join_partitioned(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="cust", left_ts="when", right_key="user_id",
            right_ts="ts", right_val="event_id", out_col="hit",
            left_carry=["order_id"], direction=direction).take_all()
        assert got[0]["hit"] == want, direction


def test_range_join_count_ray(ray_session):
    import ray.data
    from htmlreader_ray.functions.windows import range_join_count
    # orders: (o_id, custkey, start) — window [start, start + 1h)
    orders = pa.Table.from_arrays(
        [pa.array([10, 11, 12, 13], pa.int64()),
         pa.array([1, 1, 2, 3], pa.int64()),
         pa.array([ts(2024, 1, 1, 10, 30), ts(2024, 1, 1, 12, 0),
                   ts(2024, 1, 1, 10, 0), ts(2024, 1, 1, 10, 0)],
                  pa.timestamp("us"))],
        names=["o_id", "custkey", "start"])
    events = events_table([
        (1, ts(2024, 1, 1, 10, 45), 1, "a"),   # in order 10 (bucket spans)
        (1, ts(2024, 1, 1, 11, 15), 1, "a"),   # in order 10 (second bucket)
        (1, ts(2024, 1, 1, 11, 30), 1, "a"),   # outside [10:30,11:30)
        (1, ts(2024, 1, 1, 12, 0), 1, "a"),    # in order 11 (left edge)
        (2, ts(2024, 1, 1, 10, 59), 1, "a"),   # in order 12
        (9, ts(2024, 1, 1, 10, 0), 1, "a"),    # no matching order key
    ])
    out = range_join_count(
        ray.data.from_arrow(orders), ray.data.from_arrow(events),
        left_key="custkey", left_ts="start", left_id="o_id",
        right_key="user_id", right_ts="ts", width_s=3600,
        out_col="n_events")
    got = {r["o_id"]: r["n_events"] for r in out.take_all()}
    # order 13 (cust 3) has no events -> dropped (inner semantics)
    assert got == {10: 2, 11: 1, 12: 1}


def test_range_join_count_interval_split_across_buckets(ray_session):
    """A window straddling a bucket boundary must sum partials from both
    buckets exactly once."""
    import ray.data
    from htmlreader_ray.functions.windows import range_join_count
    orders = pa.Table.from_arrays(
        [pa.array([1], pa.int64()), pa.array([5], pa.int64()),
         pa.array([ts(2024, 1, 1, 0, 50)], pa.timestamp("us"))],
        names=["o_id", "custkey", "start"])
    # one event per minute from 00:40 to 02:00 — window [00:50, 01:50)
    events = events_table([
        (5, ts(2024, 1, 1, 0, 40) + timedelta(minutes=m), 1, "a")
        for m in range(81)])
    out = range_join_count(
        ray.data.from_arrow(orders), ray.data.from_arrow(events),
        left_key="custkey", left_ts="start", left_id="o_id",
        right_key="user_id", right_ts="ts", width_s=3600,
        out_col="n_events", bucket_width_s=3600)
    assert out.take_all() == [{"o_id": 1, "n_events": 60}]


def test_hopping_window_agg_ray(ray_session):
    import ray.data
    from htmlreader_ray.functions.windows import hopping_window_agg
    t = events_table([
        (1, ts(2024, 1, 1, 10, 15), 1, "a"),
        (1, ts(2024, 1, 1, 10, 45), 1, "a"),
        (1, ts(2024, 1, 1, 10, 45), 1, "b"),
    ])
    out = hopping_window_agg(ray.data.from_arrow(t),
                             width_s=3600, hop_s=1800)
    got = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in out.take_all()}
    # event@10:15 -> windows 09:30 and 10:00; events@10:45 -> 10:00, 10:30
    assert got == {
        (ts(2024, 1, 1, 9, 30), "a"): 1,
        (ts(2024, 1, 1, 10, 0), "a"): 2,
        (ts(2024, 1, 1, 10, 30), "a"): 1,
        (ts(2024, 1, 1, 10, 0), "b"): 1,
        (ts(2024, 1, 1, 10, 30), "b"): 1,
    }


def test_range_join_count_hot_key_skew(ray_session):
    """One user emitting thousands of events inside a single bucket must
    complete and count exactly (the skew bound is per key x bucket-width;
    this pins the group-size worst case)."""
    import ray.data
    from htmlreader_ray.functions.windows import range_join_count
    n = 5000
    events = pa.Table.from_arrays(
        [pa.array(list(range(n)), pa.int64()),
         pa.array([7] * n, pa.int64()),
         pa.array([ts(2024, 1, 1, 0, 0) + timedelta(seconds=i % 3000)
                   for i in range(n)], pa.timestamp("us"))],
        names=["event_id", "user_id", "ts"])
    out = range_join_count(
        ray.data.from_arrow(events),
        left_key="user_id", left_ts="ts", left_id="event_id",
        right_key="user_id", right_ts="ts",
        width_s=3600, out_col="n_next")
    got = {r["event_id"]: r["n_next"] for r in out.take_all()}
    assert len(got) == n
    # window [t, t+1h) covers every event at or after t (span is 50min),
    # so the count equals the brute-force tail count
    secs = np.array([i % 3000 for i in range(n)])
    for i in range(0, n, 97):
        assert got[i] == int((secs >= secs[i]).sum()), i
    assert got[int(np.argmin(secs))] == n


def test_funnel_users_greedy_chain(ray_session):
    import ray.data
    import pyarrow as pa
    from htmlreader_ray.functions.windows import funnel_users
    us = pa.timestamp("us")

    def ts(v):
        return v * 1_000_000
    # user 1: full funnel; greedy chain must pick the EARLIEST valid chain
    # user 2: click before view only -> no match
    # user 3: view+click but purchase before click -> no match
    # user 4: steps at identical timestamps -> strict ordering rejects
    rows = [
        (1, ts(10), "view"), (1, ts(5), "click"), (1, ts(20), "click"),
        (1, ts(15), "purchase"), (1, ts(30), "purchase"),
        (2, ts(1), "click"), (2, ts(2), "purchase"),
        (3, ts(1), "view"), (3, ts(5), "click"), (3, ts(3), "purchase"),
        (4, ts(7), "view"), (4, ts(7), "click"), (4, ts(7), "purchase"),
        (5, ts(1), "view"), (5, ts(2), "click"), (5, ts(3), "purchase"),
        # user 69 collides with user 5 mod 64 — multi-user coarse group
        (69, ts(4), "view"), (69, ts(6), "click"), (69, ts(9), "purchase"),
    ]
    t = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int64()).cast(us),
         pa.array([r[2] for r in rows], pa.string())],
        names=["user_id", "ts", "event_type"])
    out = funnel_users(ray.data.from_arrow(t).repartition(3)).take_all()
    got = {r["user_id"]: (r["view_ts"], r["click_ts"], r["purchase_ts"])
           for r in out}
    assert set(got) == {1, 5, 69}
    v, c, p = got[1]
    assert (v.timestamp(), c.timestamp(), p.timestamp()) == (10, 20, 30)
    v, c, p = got[69]
    assert (v.timestamp(), c.timestamp(), p.timestamp()) == (4, 6, 9)


def test_funnel_users_no_matches(ray_session):
    import ray.data
    import pyarrow as pa
    from htmlreader_ray.functions.windows import funnel_users
    t = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
         pa.array(["error", "signup"], pa.string())],
        names=["user_id", "ts", "event_type"])
    out = funnel_users(ray.data.from_arrow(t)).take_all()
    assert out == []
