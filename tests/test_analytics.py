"""Unit tests for functions/analytics.py (lag gaps, retention,
co-occurrence) against brute-force expectations."""
import itertools

import pyarrow as pa
import pytest

from htmlreader_ray.functions import analytics

US = 1_000_000
DAY = 86_400_000_000


def events_table():
    # user 1: three events, one ts tie broken by event_id
    # user 2: single event (no gaps)
    # user 3: two events across a day boundary
    rows = [
        # (event_id, ts_us, user_id, event_type)
        (10, 1_000 * US, 1, "view"),
        (11, 1_000 * US, 1, "click"),     # tie with event 10 -> gap 0
        (12, 5_000 * US, 1, "purchase"),
        (20, 2_000 * US, 2, "view"),
        (30, 100 * US, 3, "view"),
        (31, DAY + 100 * US, 3, "click"),
    ]
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })


def test_event_gap_stats(ray_session):
    import ray.data
    ds = ray.data.from_arrow(events_table())
    out = {r["event_type"]: r
           for r in analytics.event_gap_stats(ds).take_all()}
    # user 1: click at same ts (gap 0), purchase gap 4000s
    # user 3: click gap DAY
    assert "view" not in out  # no view is ever a later-event of a gap
    assert out["click"]["n_gaps"] == 2
    assert out["click"]["sum_gap_us"] == 0 + DAY
    assert out["click"]["max_gap_us"] == DAY
    assert out["purchase"]["n_gaps"] == 1
    assert out["purchase"]["sum_gap_us"] == 4_000 * US


def test_retention_cohorts(ray_session):
    import ray.data
    ds = ray.data.from_arrow(events_table())
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in analytics.retention_cohorts(ds).take_all()}
    import datetime
    epoch = datetime.datetime(1970, 1, 1)
    # users 1, 2, 3 all first active on day 0; user 3 returns day 1
    assert out[(epoch, 0)] == 3
    assert out[(epoch, 1)] == 1
    assert len(out) == 2


def test_type_cooccurrence(ray_session):
    import ray.data
    ds = ray.data.from_arrow(events_table())
    out = {(r["type_a"], r["type_b"]): r["n_users"]
           for r in analytics.type_cooccurrence(ds).take_all()}
    # brute force over the fixture
    per_user = {}
    for r in events_table().to_pylist():
        per_user.setdefault(r["user_id"], set()).add(r["event_type"])
    expected = {}
    for types in per_user.values():
        for a, b in itertools.combinations(sorted(types), 2):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    assert out == expected
    assert out[("click", "view")] == 2


def test_gap_stats_many_users_bucketed(ray_session):
    """Exercise >1 coarse bucket and tie-breaking at scale."""
    import ray.data
    n = 1000
    ids = list(range(n))
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([(i % 7) * US for i in ids], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([i % 13 for i in ids], pa.int64()),
        "event_type": pa.array(["a" if i % 2 else "b" for i in ids]),
    })
    ds = ray.data.from_arrow(t)
    out = analytics.event_gap_stats(ds, coarse_buckets=8).take_all()
    # brute force
    rows = sorted(t.to_pylist(),
                  key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    agg = {}
    for prev, cur in zip(rows, rows[1:]):
        if prev["user_id"] != cur["user_id"]:
            continue
        gap = int((cur["ts"] - prev["ts"]).total_seconds() * US)
        a = agg.setdefault(cur["event_type"], [0, 0, 0])
        a[0] += 1
        a[1] += gap
        a[2] = max(a[2], gap)
    got = {r["event_type"]: [r["n_gaps"], r["sum_gap_us"], r["max_gap_us"]]
           for r in out}
    assert got == agg


def _valued_events(n=200, users=9):
    ids = list(range(n))
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([(i * 37 % 11) * US for i in ids],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([i % users for i in ids], pa.int64()),
        "event_type": pa.array(
            [("view", "click", "purchase")[i % 3] for i in ids]),
        "value": pa.array([(i * 13 % 97) / 7.0 for i in ids],
                          pa.float64()),
    })


def _sorted_rows(t):
    import math
    rows = t.to_pylist()
    for r in rows:
        r["ts_us"] = int(r["ts"].timestamp() * US)
        r["cents"] = int(math.floor(r["value"] * 100.0))
    rows.sort(key=lambda r: (r["user_id"], r["ts_us"], r["event_id"]))
    return rows


def test_running_totals(ray_session):
    import ray.data
    t = _valued_events()
    out = analytics.running_totals(
        ray.data.from_arrow(t), coarse_buckets=8).take_all()
    rows = _sorted_rows(t)
    want = {}
    run_n = run_c = 0
    prev_user = None
    for r in rows:
        if r["user_id"] != prev_user:
            run_n = run_c = 0
            prev_user = r["user_id"]
        run_n += 1
        run_c += r["cents"]
        want[r["event_id"]] = (run_n, run_c)
    got = {r["event_id"]: (r["run_n"], r["run_cents"]) for r in out}
    assert got == want


def test_moving_window_sums(ray_session):
    import ray.data
    t = _valued_events()
    out = analytics.moving_window_sums(
        ray.data.from_arrow(t), win=4, coarse_buckets=8).take_all()
    rows = _sorted_rows(t)
    # brute force per user
    want = {}
    seg = []
    prev_user = None
    for r in rows:
        if r["user_id"] != prev_user:
            seg = []
            prev_user = r["user_id"]
        seg.append(r["cents"])
        w = seg[-4:]
        want[r["event_id"]] = (len(w), sum(w))
    got = {r["event_id"]: (r["win_n"], r["win_cents"]) for r in out}
    assert got == want


def test_moving_window_single_row_user(ray_session):
    import ray.data
    t = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([0], pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([42], pa.int64()),
        "value": pa.array([1.25], pa.float64()),
    })
    out = analytics.moving_window_sums(
        ray.data.from_arrow(t), win=4).take_all()
    assert out == [{"user_id": 42, "event_id": 1,
                    "win_n": 1, "win_cents": 125}]


def test_pivot_counts(ray_session):
    import ray.data
    t = _valued_events()
    out = analytics.pivot_counts(
        ray.data.from_arrow(t),
        types=("view", "click", "purchase")).take_all()
    want = {}
    for r in t.to_pylist():
        c = want.setdefault(r["user_id"],
                            {"n_view": 0, "n_click": 0, "n_purchase": 0})
        c["n_" + r["event_type"]] += 1
    assert len(out) == len(want)
    for r in out:
        w = want[r["user_id"]]
        assert (r["n_view"], r["n_click"], r["n_purchase"]) == (
            w["n_view"], w["n_click"], w["n_purchase"])


def test_next_event_per_user(ray_session):
    import ray.data
    ds = ray.data.from_arrow(events_table())
    out = {r["event_id"]: r["next_event_type"]
           for r in analytics.next_event_per_user(ds).take_all()}
    # user 1 order: 10 (ts tie, id asc) -> 11 -> 12 -> None
    assert out[10] == "click"
    assert out[11] == "purchase"
    assert out[12] is None
    # user 2: single event
    assert out[20] is None
    # user 3: 30 -> 31 -> None
    assert out[30] == "click"
    assert out[31] is None
    assert len(out) == 6


def test_next_event_many_users_bucketed(ray_session):
    # users collide in the 256-bucket space; the kernel must still
    # segment strictly by user id inside each bucket group
    import ray.data
    n_users, per_user = 600, 3
    eid, ts, uid, et = [], [], [], []
    k = 0
    for u in range(n_users):
        for i in range(per_user):
            eid.append(k)
            ts.append((u + i * 7) * US)
            uid.append(u)
            et.append(f"t{i}")
            k += 1
    t = pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
    })
    out = {r["event_id"]: r["next_event_type"]
           for r in analytics.next_event_per_user(
               ray.data.from_arrow(t)).take_all()}
    assert len(out) == n_users * per_user
    for u in range(n_users):
        base = u * per_user
        assert out[base] == "t1"
        assert out[base + 1] == "t2"
        assert out[base + 2] is None


def test_time_weighted_parts(ray_session):
    import ray.data

    t = events_table()
    t = t.append_column("value", pa.array(
        [1.25, 2.0, 3.5, 7.0, 10.0, 20.0], pa.float64()))
    out = {r["user_id"]: r for r in analytics.time_weighted_parts(
        ray.data.from_arrow(t)).take_all()}
    # user 1: pairs (10->11 gap 0ms, cents 125), (11->12 gap 4_000_000ms,
    # cents 200); user 3: (30->31 gap DAY ms, cents 1000); user 2: none
    assert 2 not in out
    u1 = out[1]
    assert u1["n_pairs"] == 2
    assert u1["total_gap_ms"] == 0 + 4_000_000
    assert u1["sum_w"] == 125 * 0 + 200 * 4_000_000
    u3 = out[3]
    assert u3["n_pairs"] == 1
    assert u3["total_gap_ms"] == DAY // 1000
    assert u3["sum_w"] == 1000 * (DAY // 1000)


def test_interval_coverage(ray_session):
    import ray.data

    out = {r["user_id"]: r["covered_us"] for r in
           analytics.interval_coverage(
               ray.data.from_arrow(events_table()),
               length_us=300_000_000).take_all()}
    L = 300_000_000
    # user 1: gaps 0 (tie) and 4000s -> min(0,L)+min(4e9,L)+L
    assert out[1] == 0 + L + L
    # user 2: single event -> L
    assert out[2] == L
    # user 3: gap 1 day -> L + L
    assert out[3] == L + L


def test_interval_coverage_overlapping(ray_session):
    import ray.data

    # events 100s apart with 300s windows: union = 2*100 + 300
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([0, 100 * US, 200 * US],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "a"], pa.string()),
    })
    out = analytics.interval_coverage(
        ray.data.from_arrow(t), length_us=300 * US).take_all()
    assert out[0]["covered_us"] == 100 * US + 100 * US + 300 * US


def test_last_touch_attribution(ray_session):
    import ray.data

    # user 1: purchase(12) at 5000s; prior click(11) at 1000s -> 11
    out = {r["event_id"]: r["touch_id"] for r in
           analytics.last_touch_attribution(
               ray.data.from_arrow(events_table())).take_all()}
    assert out == {12: 11}


def test_last_touch_no_prior_and_ties(ray_session):
    import ray.data

    # user 5: purchase before any click -> -1; later purchase credits
    # the most recent of two clicks; a same-ts click with a SMALLER
    # event_id than the purchase counts as prior (the oracle tie rule)
    rows = [
        (50, 100 * US, 5, "purchase"),   # no prior click -> -1
        (51, 200 * US, 5, "click"),
        (52, 300 * US, 5, "click"),
        (53, 400 * US, 5, "purchase"),   # -> 52
        (54, 500 * US, 5, "click"),      # same ts as 55, smaller id
        (55, 500 * US, 5, "purchase"),   # -> 54 (tie rule)
        (60, 100 * US, 6, "click"),
        (61, 50 * US, 7, "purchase"),    # other user's click ignored
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    out = {r["event_id"]: r["touch_id"] for r in
           analytics.last_touch_attribution(
               ray.data.from_arrow(t)).take_all()}
    assert out == {50: -1, 53: 52, 55: 54, 61: -1}


def _brute_copurchase(rows, top_k):
    """Brute-force distinct-order pair counts, DESC n / ASC pair order."""
    baskets = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    counts = {}
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(a, b, n) for (a, b), n in ranked[:top_k]]


def test_copurchase_topk(ray_session):
    import ray.data

    # order 1 has a duplicated line item (part 7 twice) -> counted once
    rows = [(1, 7), (1, 7), (1, 3), (1, 5),
            (2, 3), (2, 7),
            (3, 3), (3, 7),
            (4, 9),            # singleton basket contributes nothing
            (5, 5), (5, 3)]
    t = pa.table({"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                  "l_partkey": pa.array([r[1] for r in rows], pa.int64())})
    out = [(r["part_a"], r["part_b"], r["n_orders"]) for r in
           analytics.copurchase_topk(
               ray.data.from_arrow(t), top_k=3).take_all()]
    assert out == _brute_copurchase(rows, 3)
    assert out[0] == (3, 7, 3)


def test_copurchase_many_orders_bucketed(ray_session):
    import ray.data
    import random

    rng = random.Random(17)
    rows = []
    for ok in range(1, 121):
        size = rng.choice([1, 2, 2, 3, 4, 6])
        for pk in rng.sample(range(1, 30), size):
            rows.append((ok, pk))
            if rng.random() < 0.2:
                rows.append((ok, pk))  # duplicate line items
    t = pa.table({"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                  "l_partkey": pa.array([r[1] for r in rows], pa.int64())})
    # small coarse_buckets forces multi-order groups through the kernel;
    # 2-block input exercises cross-block (order, item) dup removal
    ds = ray.data.from_arrow(t).repartition(2)
    out = [(r["part_a"], r["part_b"], r["n_orders"]) for r in
           analytics.copurchase_topk(
               ds, top_k=10, coarse_buckets=4).take_all()]
    assert out == _brute_copurchase(rows, 10)


def test_basket_size_hist(ray_session):
    import ray.data

    rows = [(1, 7), (1, 7), (1, 3), (1, 5),   # breadth 3 (dup line)
            (2, 3), (2, 7),                   # breadth 2
            (3, 3), (3, 7),                   # breadth 2
            (4, 9)]                           # breadth 1
    t = pa.table({"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                  "l_partkey": pa.array([r[1] for r in rows], pa.int64())})
    # 2 blocks so order 1's duplicate (order, item) pairs straddle blocks
    ds = ray.data.from_arrow(t).repartition(2)
    out = {r["n_parts"]: r["n_orders"] for r in
           analytics.basket_size_hist(ds, coarse_buckets=4).take_all()}
    assert out == {1: 1, 2: 2, 3: 1}


def test_event_gap_values_median(ray_session):
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_percentile_disc

    gaps = analytics.event_gap_values(ray.data.from_arrow(events_table()))
    rows = sorted((r["event_type"], r["gap_us"])
                  for r in gaps.take_all())
    # click gaps: 0 (ts tie, user 1) and DAY (user 3); purchase: 4000s
    assert rows == [("click", 0), ("click", DAY),
                    ("purchase", 4_000 * US)]
    med = {r["event_type"]: r["med_gap_us"] for r in
           grouped_percentile_disc(gaps, ["event_type"], "gap_us",
                                   [("med_gap_us", 1, 2)]).take_all()}
    # PERCENTILE_DISC rank ceil(n/2): n=2 -> rank 1 -> the smaller gap
    assert med == {"click": 0, "purchase": 4_000 * US}


def test_activity_streaks(ray_session):
    import ray.data
    # user 1: days 0,1,2 and 5,6  -> n_days 5, max streak 3
    # user 2: day 7 only          -> n_days 1, max streak 1
    # user 3: days 0 and 2        -> n_days 2, max streak 1
    days = {1: [0, 1, 1, 2, 5, 6], 2: [7], 3: [0, 2, 2]}
    rows = [(u, d) for u, ds_ in days.items() for d in ds_]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * DAY + 3 * US for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    out = {r["user_id"]: r for r in
           analytics.activity_streaks(ds).take_all()}
    assert out[1]["n_days"] == 5 and out[1]["max_streak"] == 3
    assert out[2]["n_days"] == 1 and out[2]["max_streak"] == 1
    assert out[3]["n_days"] == 2 and out[3]["max_streak"] == 1


def test_debounce_events(ray_session):
    import ray.data
    # user 1 "view": t=0, t=100s (dropped), t=400s (kept: 400s > 300s
    # after t=0? previous is t=100 -> 300s gap exactly -> dropped)
    # exact-gap and tie cases pinned
    rows = [
        (1, 0, 1, "view"),
        (2, 100 * US, 1, "view"),        # 100s after prev -> dropped
        (3, 400 * US, 1, "view"),        # 300s after prev -> dropped (not >)
        (4, 701 * US, 1, "view"),        # 301s after prev -> kept
        (5, 0, 1, "click"),              # different type -> kept
        (6, 0, 2, "view"),               # different user -> kept
        (7, 0, 2, "view"),               # same-instant tie -> dropped
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    kept = sorted(r["event_id"] for r in analytics.debounce_events(
        ray.data.from_arrow(t), gap_us=300 * US).take_all())
    assert kept == [1, 4, 5, 6]


def test_first_k_signature(ray_session):
    import ray.data
    rows = [
        # user 1: 4 events -> first 3 types a>b>c (tie at t=0 by id)
        (1, 0, 1, "a"), (2, 0, 1, "b"), (3, 5 * US, 1, "c"),
        (4, 9 * US, 1, "d"),
        # user 2: single event
        (10, 0, 2, "x"),
        # user 3: two events
        (20, 3 * US, 3, "q"), (21, 1 * US, 3, "p"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    out = {r["user_id"]: r["sig"] for r in analytics.first_k_signature(
        ray.data.from_arrow(t), k=3).take_all()}
    assert out == {1: "a>b>c", 2: "x", 3: "p>q"}


def test_value_run_stats(ray_session):
    import ray.data
    # user 1 values: 1, 2, 3, 2, 5 -> runs [1,2,3], [2,5]: n=2, max=3
    # user 2 values: 4, 4 -> equal breaks: runs [4], [4]: n=2, max=1
    rows = [
        (1, 0, 1, 1.0), (2, 1 * US, 1, 2.0), (3, 2 * US, 1, 3.0),
        (4, 3 * US, 1, 2.0), (5, 4 * US, 1, 5.0),
        (6, 0, 2, 4.0), (7, 1 * US, 2, 4.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    out = {r["user_id"]: r for r in analytics.value_run_stats(
        ray.data.from_arrow(t)).take_all()}
    assert out[1]["n_runs"] == 2 and out[1]["max_run"] == 3
    assert out[2]["n_runs"] == 2 and out[2]["max_run"] == 1


def test_unattributed_conversions(ray_session):
    import ray.data
    H = 3600 * US
    rows = [
        # user 1: click at t=0, purchase at t=30min (attributed),
        # purchase at t=2h (click 2h old -> orphan)
        (1, 0, 1, "click"), (2, 1800 * US, 1, "purchase"),
        (3, 7200 * US, 1, "purchase"),
        # user 2: purchase with no click ever -> orphan
        (4, 100 * US, 2, "purchase"),
        # user 3: click exactly 1h before purchase -> attributed (<=)
        (5, 0, 3, "click"), (6, H, 3, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    out = sorted(r["event_id"] for r in
                 analytics.unattributed_conversions(
                     ray.data.from_arrow(t)).take_all())
    assert out == [3, 4]


def test_range_window_sums(ray_session):
    import ray.data
    H = 3600 * US
    rows = [
        # user 1: events at t=0, 30min, 90min; window=1h
        (1, 0, 1, 1.0),
        (2, 1800 * US, 1, 2.0),         # window covers t=0 too
        (3, 5400 * US, 1, 4.0),         # covers only t=30min (=1h ago)
        # user 2: ts tie -> peers included both ways (RANGE frame)
        (4, 0, 2, 1.0),
        (5, 0, 2, 2.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    out = {r["event_id"]: r for r in analytics.range_window_sums(
        ray.data.from_arrow(t), window_us=H).take_all()}
    assert out[1]["n_win"] == 1 and out[1]["cents_win"] == 100
    assert out[2]["n_win"] == 2 and out[2]["cents_win"] == 300
    # t=5400s: 1h-ago bound is 1800s inclusive -> events 2 and 3
    assert out[3]["n_win"] == 2 and out[3]["cents_win"] == 600
    # peers at equal ts count for each other
    assert out[4]["n_win"] == 2 and out[4]["cents_win"] == 300
    assert out[5]["n_win"] == 2 and out[5]["cents_win"] == 300


def test_user_transition_entropy(ray_session):
    import math

    import ray.data as rd

    from htmlreader_ray.functions.analytics import user_transition_entropy

    US = 3_600_000_000
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        # user 1: view -> click -> view; user 2: single (omitted);
        # user 3: two rows at the SAME ts -> event_id tiebreak decides
        "ts": pa.array([0, US, 2 * US, 0, 5 * US, 5 * US],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 15, 14], pa.int64()),
        "event_type": ["view", "click", "view", "view",
                       "purchase", "signup"],
    }))
    out = {r["user_id"]: r for r in
           user_transition_entropy(ev).take_all()}
    ln2_e6 = -math.floor(1e6 * math.log(0.5) + 0.5)
    # user 1: cells {view>click: 1, click>view: 1}, tot 2 -> H = ln 2
    assert out[1] == {"user_id": 1, "n_trans": 2, "ent_e6": ln2_e6}
    # user 3: one transition signup>purchase (event_id 14 before 15)
    assert out[3] == {"user_id": 3, "n_trans": 1, "ent_e6": 0}
    assert 2 not in out
