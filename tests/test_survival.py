"""Unit tests for the seventy-ninth/eightieth-sweep statistical
operators (km_survival, daily_runs_test, mann_kendall_trend) on a
hand-built micro corpus — in particular the KM right-censoring branch
for users with NO purchase at all, which the synthetic sf corpora
never exercise (every synthetic user purchases). Each case also runs
the registered DuckDB oracle on the same tmp parquet as a
differential check, mirroring the driver compare."""

import math
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

US_DAY = 86_400_000_000
T0 = 1_700_000_000_000_000  # an arbitrary epoch-us anchor


def _write_events(tmp_path, rows):
    """rows: (user_id, day_offset_float, event_type)."""
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([T0 + int(d * US_DAY) for _u, d, _e in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([u for u, _d, _e in rows], pa.int64()),
        "event_type": pa.array([e for _u, _d, e in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, name):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.sql(entrymod.oracle_sql()[name]).arrow()


def _sorted_rows(tbl, key):
    return sorted(tbl.to_pylist(), key=lambda r: r[key])


def test_km_censors_users_without_any_purchase(ray_session, tmp_path):
    # A: purchase on its first-activity day (duration 0)
    # B: first purchase 5 days after first activity (>= H=3 -> censored)
    # C: never purchases (p0 NULL -> censored) — the branch the sf
    #    corpora never hit
    # D: purchase 1.5 days in (floor -> day 1)
    sf = _write_events(tmp_path, [
        (1, 0.0, "purchase"),
        (2, 0.0, "view"), (2, 5.0, "purchase"),
        (3, 0.25, "view"), (3, 2.0, "view"),
        (4, 1.0, "view"), (4, 2.5, "purchase"),
    ])
    out = entrymod.queries()["km_survival"](sf).to_pylist()
    def L(num, den):
        return math.floor(1e6 * math.log(num / den) + 0.5)
    assert out == [
        {"day": 0, "at_risk": 4, "events": 1, "log_s_e6": L(3, 4)},
        {"day": 1, "at_risk": 3, "events": 1,
         "log_s_e6": L(3, 4) + L(2, 3)},
    ]
    assert _sorted_rows(_oracle(sf, "km_survival"), "day") == out


def test_daily_runs_and_mann_kendall_micro(ray_session, tmp_path):
    # daily counts over 6 days: 1, 3, 1, 3, 3, 2 -> lower median = 2
    # (sorted 1,1,2,3,3,3 -> rank (6-1)//2+1 = 3rd = 2); day 5 (count
    # 2) is dropped; labels by day: 0,1,0,1,1 -> 4 runs, n1=3, n2=2
    counts = [1, 3, 1, 3, 3, 2]
    rows = []
    for day, c in enumerate(counts):
        for k in range(c):
            rows.append((100 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)

    rt = entrymod.queries()["daily_runs_test"](sf).to_pylist()[0]
    n1, n2 = 3, 2
    assert rt == {
        "n_above": n1, "n_below": n2, "runs": 4,
        "mu_e6": 1_000_000 + 2_000_000 * n1 * n2 // (n1 + n2),
        "var_e12": (10 ** 12 * 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
                   // ((n1 + n2) ** 2 * (n1 + n2 - 1)),
    }
    assert _oracle(sf, "daily_runs_test").to_pylist() == [rt]

    mk = entrymod.queries()["mann_kendall_trend"](sf).to_pylist()[0]
    # pairs i<j over [1,3,1,3,3,2]: S = sum sign(x_j - x_i)
    s = sum((counts[j] > counts[i]) - (counts[j] < counts[i])
            for i in range(6) for j in range(i + 1, 6))
    ties = {1: 2, 3: 3}   # count value -> multiplicity (>1 only)
    var_num = 6 * 5 * 17 - sum(t * (t - 1) * (2 * t + 5)
                               for t in ties.values())
    assert mk == {"n_days": 6, "s_stat": s, "var_num": var_num}
    assert _oracle(sf, "mann_kendall_trend").to_pylist() == [mk]


def test_char_bigram_entropy_micro(ray_session, tmp_path):
    # "ab" + "ba" -> bigrams: ab, ba (one each); H = ln 2
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["ab", "ba"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["char_bigram_entropy"](
        str(tmp_path)).to_pylist()[0]
    half_ln = math.floor(1e6 * math.log(0.5) + 0.5)
    assert out == {"n_bigrams": 2, "n_cells": 2,
                   "h2_e6": -(2 * half_ln) // 2}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["char_bigram_entropy"]) \
        .arrow().to_pylist() == [out]


def test_changepoint_scores_micro(ray_session, tmp_path):
    # counts [1, 1, 5, 5] on days 0..3 -> the max num/den must land on
    # split i=2 (the true level shift): 256/16 vs 64/12 at i=1,3
    rows = []
    for day, c in enumerate([1, 1, 5, 5]):
        for k in range(c):
            rows.append((200 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["changepoint_scores"](sf).to_pylist()
    d0 = T0 // US_DAY    # absolute epoch day of the fixture anchor
    assert out == [
        {"split_idx": 1, "day": d0, "sum_left": 1, "num": 64,
         "den": 12},
        {"split_idx": 2, "day": d0 + 1, "sum_left": 2, "num": 256,
         "den": 16},
        {"split_idx": 3, "day": d0 + 2, "sum_left": 7, "num": 64,
         "den": 12},
    ]
    best = max(out, key=lambda r: (r["num"] / r["den"]))
    assert best["split_idx"] == 2
    assert _sorted_rows(_oracle(sf, "changepoint_scores"),
                        "split_idx") == out


def test_type_leadlag_micro(ray_session, tmp_path):
    # views: day0 x2, day1 x3; purchases: day1 x1, day2 x4
    rows = ([(1, 0.0, "view")] * 2 + [(1, 1.0, "view")] * 3
            + [(2, 1.0, "purchase")] + [(2, 2.0, "purchase")] * 4)
    rows = [(u, d + i * 1e-4, e) for i, (u, d, e) in enumerate(rows)]
    sf = _write_events(tmp_path, rows)
    out = {r["lag"]: r for r in
           entrymod.queries()["type_leadlag"](sf).to_pylist()}
    assert out[1] == {"lag": 1, "n_days": 2, "sxy": 14, "sx": 5,
                      "sy": 5, "sxx": 13, "syy": 17}
    assert out[0] == {"lag": 0, "n_days": 1, "sxy": 3, "sx": 3,
                      "sy": 1, "sxx": 9, "syy": 1}
    assert out[-3]["n_days"] == 0 and out[-3]["sxy"] == 0
    got = {r["lag"]: r for r in
           _oracle(sf, "type_leadlag").to_pylist()}
    assert got == out


def test_haar_energy_micro(ray_session, tmp_path):
    # counts [1,2,3,4,10] -> truncated to the 2^2 prefix [1,2,3,4]
    # level 1: (1-2)^2 + (3-4)^2 = 2 over 2 blocks
    # level 2: ((1+2)-(3+4))^2 = 16 over 1 block
    rows = []
    for day, c in enumerate([1, 2, 3, 4, 10]):
        for k in range(c):
            rows.append((300 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["haar_energy"](sf).to_pylist()
    assert out == [
        {"level": 1, "n_blocks": 2, "energy": 2},
        {"level": 2, "n_blocks": 1, "energy": 16},
    ]
    assert _sorted_rows(_oracle(sf, "haar_energy"), "level") == out


def test_daily_type_kl_micro(ray_session, tmp_path):
    # day0: 3 view + 1 purchase; day1: 1 view + 3 purchase
    # global mix is 50/50, so both days diverge identically:
    # KL = (3*L(1.5) + 1*L(0.5)) // 4 in e6
    rows = ([(1, 0.0, "view")] * 3 + [(1, 0.0, "purchase")]
            + [(2, 1.0, "view")] + [(2, 1.0, "purchase")] * 3)
    rows = [(u, d + i * 1e-4, e) for i, (u, d, e) in enumerate(rows)]
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["daily_type_kl"](sf).to_pylist()
    l15 = math.floor(1e6 * math.log(1.5) + 0.5)
    l05 = math.floor(1e6 * math.log(0.5) + 0.5)
    kl = (3 * l15 + l05) // 4
    d0 = T0 // US_DAY
    assert out == [
        {"day": d0, "n_events": 4, "kl_e6": kl},
        {"day": d0 + 1, "n_events": 4, "kl_e6": kl},
    ]
    assert _sorted_rows(_oracle(sf, "daily_type_kl"), "day") == out


def test_cusum_path_micro(ray_session, tmp_path):
    # counts [5,1,1,5], lower median k=1:
    # sp: 4, 4, 4, 8 ; sn stays 0
    rows = []
    for day, c in enumerate([5, 1, 1, 5]):
        for k in range(c):
            rows.append((400 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["cusum_path"](sf).to_pylist()
    d0 = T0 // US_DAY
    assert [(r["day"] - d0, r["n"], r["s_pos"], r["s_neg"])
            for r in out] == [
        (0, 5, 4, 0), (1, 1, 4, 0), (2, 1, 4, 0), (3, 5, 8, 0)]
    assert _sorted_rows(_oracle(sf, "cusum_path"), "day") == out


def test_orders_skyline_micro(ray_session, tmp_path):
    # cents/day pairs: skyline keeps the max-date rows per price level
    # unless a strictly higher price already reached that date.
    # (1) 1000/day0 in-group dominated; (2),(4) 1000/day2 duplicates
    # survive; (5) 800/day2 dominated by (2); (3),(6) 500/day5 survive.
    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_totalprice": pa.array([10.0, 10.0, 5.0, 10.0, 8.0, 5.0],
                                 pa.float64()),
        "o_orderdate": pa.array(
            [T0, T0 + 2 * US_DAY, T0 + 5 * US_DAY, T0 + 2 * US_DAY,
             T0 + 2 * US_DAY, T0 + 5 * US_DAY],
            pa.int64()).cast(pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = entrymod.queries()["orders_skyline"](
        str(tmp_path)).to_pylist()
    assert [r["o_orderkey"] for r in out] == [2, 3, 4, 6]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    got = sorted(con.sql(entrymod.oracle_sql()["orders_skyline"])
                 .arrow().to_pylist(), key=lambda r: r["o_orderkey"])
    assert got == out


def test_theil_sen_micro(ray_session, tmp_path):
    # days 0,1,3 (gap!) with counts [2,5,3] -> slopes:
    # (0,1): 3/1; (0,3): 1/3; (1,3): -2/2 = -1. Sorted: -1, 1/3, 3;
    # m=3 so lo == hi == the middle slope (dy=1, dx=3).
    rows = []
    for day, c in [(0, 2), (1, 5), (3, 3)]:
        for k in range(c):
            rows.append((300 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["theil_sen_slope_daily"](sf).to_pylist()
    assert out == [{"n_days": 3, "n_pairs": 3,
                    "lo_dy": 1, "lo_dx": 3, "hi_dy": 1, "hi_dx": 3}]
    assert _oracle(sf, "theil_sen_slope_daily").to_pylist() == out


def test_readability_counts_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["Hi there! Go now. Ok?", "xyz"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = sorted(entrymod.queries()["readability_counts"](
        str(tmp_path)).take_all(), key=lambda r: r["doc_id"])
    assert out == [
        {"doc_id": 0, "n_sent": 3, "n_words": 5, "n_syll": 6},
        {"doc_id": 1, "n_sent": 0, "n_words": 1, "n_syll": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["readability_counts"]).arrow(),
        "doc_id") == out


def test_value_ewma_daily_micro(ray_session, tmp_path):
    # counts [8, 16, 8] -> M: 8 (p=1); 1*16+7*8=72 (p=8) -> 9.0;
    # 8*8+7*72=568 (p=64) -> 8.875
    rows = []
    for day, c in [(0, 8), (1, 16), (2, 8)]:
        for k in range(c):
            rows.append((400 + k, day + k * 1e-3, "view"))
    sf = _write_events(tmp_path, rows)
    out = entrymod.queries()["value_ewma_daily"](sf).to_pylist()
    d0 = T0 // US_DAY
    assert out == [
        {"t": 0, "day": d0, "x": 8, "ewma_num": "8",
         "ewma_e6": 8_000_000},
        {"t": 1, "day": d0 + 1, "x": 16, "ewma_num": "72",
         "ewma_e6": 9_000_000},
        {"t": 2, "day": d0 + 2, "x": 8, "ewma_num": "568",
         "ewma_e6": 8_875_000}]
    assert _sorted_rows(_oracle(sf, "value_ewma_daily"), "t") == out


def test_keyword_tag_counts_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["merge merge stream", "xyz"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = sorted(entrymod.queries()["keyword_tag_counts"](
        str(tmp_path)).take_all(), key=lambda r: r["keyword"])
    assert out == [{"doc_id": 0, "keyword": "merge", "n": 2},
                   {"doc_id": 0, "keyword": "stream", "n": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["keyword_tag_counts"]).arrow()
        .to_pylist(), key=lambda r: r["keyword"]) == out


def test_host_adamic_adar_micro(ray_session, tmp_path):
    # ref-links generator: doc d cites hosts h((7d+j)%10), j=0..d%3.
    # d=0 -> {h0} (no pairs); d=1 -> {h7,h8}; d=2 -> {h4,h5,h6}.
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = sorted(entrymod.queries()["host_adamic_adar"](
        str(tmp_path)).take_all(),
        key=lambda r: (r["host_a"], r["host_b"]))
    w2 = math.floor(1e9 / math.log(2) + 0.5)
    w3 = math.floor(1e9 / math.log(3) + 0.5)
    h = "{}.example.com".format
    assert out == [
        {"host_a": h("h4"), "host_b": h("h5"), "n_docs": 1,
         "aa_e9": w3},
        {"host_a": h("h4"), "host_b": h("h6"), "n_docs": 1,
         "aa_e9": w3},
        {"host_a": h("h5"), "host_b": h("h6"), "n_docs": 1,
         "aa_e9": w3},
        {"host_a": h("h7"), "host_b": h("h8"), "n_docs": 1,
         "aa_e9": w2}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["host_adamic_adar"]).arrow().to_pylist(),
        key=lambda r: (r["host_a"], r["host_b"])) == out


def test_top_supplier_revenue_ties_micro(ray_session, tmp_path):
    # suppliers 1 and 2 tie at 1000 cents; supplier 1 also has an
    # out-of-slice row that must be filtered out.
    import datetime as dt
    inside = dt.datetime(1996, 2, 1)
    outside = dt.datetime(1997, 2, 1)
    li = pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 5.0, 5.0, 1.0, 99.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_shipdate": pa.array(
            [inside, inside, inside, inside, outside],
            pa.timestamp("us")),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    sup = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
    })
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))
    out = entrymod.queries()["top_supplier_revenue"](
        str(tmp_path)).to_pylist()
    assert out == [
        {"s_suppkey": 1, "s_name": "S1", "total_cents": 1000},
        {"s_suppkey": 2, "s_name": "S2", "total_cents": 1000}]
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["top_supplier_revenue"]).arrow(),
        "s_suppkey") == out


def test_late_event_audit_micro(ray_session, tmp_path):
    # user 1 arrivals (by event_id): ts 12:00, then 10:00 (2 h behind
    # the running max -> late), then 11:31 (29 min behind -> on time).
    sf = _write_events(tmp_path, [
        (1, 0.5, "view"),
        (1, 0.5 - 2 / 24, "view"),
        (1, 0.48, "view"),
        (2, 0.1, "view")])
    out = _sorted_rows(
        pa.Table.from_pylist(entrymod.queries()["late_event_audit"](
            sf).take_all()), "user_id")
    assert out == [
        {"user_id": 1, "n_events": 3, "n_late": 1},
        {"user_id": 2, "n_events": 1, "n_late": 0}]
    assert _sorted_rows(_oracle(sf, "late_event_audit"),
                        "user_id") == out


def test_anchor_depth_profile_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 2], pa.int64()),
        "text": pa.array(["alpha", "beta"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = sorted(entrymod.queries()["anchor_depth_profile"](
        str(tmp_path)).take_all(),
        key=lambda r: (r["doc_id"], r["depth"]))
    assert out == [
        {"doc_id": 0, "depth": 3, "n_anchors": 1},
        {"doc_id": 0, "depth": 4, "n_anchors": 1},
        {"doc_id": 0, "depth": 5, "n_anchors": 5},
        {"doc_id": 2, "depth": 3, "n_anchors": 3},
        {"doc_id": 2, "depth": 4, "n_anchors": 1},
        {"doc_id": 2, "depth": 5, "n_anchors": 5}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["anchor_depth_profile"]).arrow()
        .to_pylist(), key=lambda r: (r["doc_id"], r["depth"])) == out


def test_dirichlet_topk_docs_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["merge merge stream", "other words here",
                          "window", ""], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["dirichlet_topk_docs"](
        str(tmp_path)).to_pylist()
    tw, mu = 7, 2000.0
    cf = {"merge": 2, "stream": 1, "window": 1}
    tf = {0: {"merge": 2, "stream": 1, "window": 0},
          1: {"merge": 0, "stream": 0, "window": 0},
          2: {"merge": 0, "stream": 0, "window": 1}}
    dl = {0: 3, 1: 3, 2: 1}

    def score(d):
        return sum(math.floor(1e6 * math.log(
            (tf[d][t] + mu * cf[t] / tw) / (dl[d] + mu)) + 0.5)
            for t in cf)
    want = sorted(((score(d), d) for d in (0, 1, 2)),
                  key=lambda p: (-p[0], p[1]))
    assert out == [{"doc_id": d, "score_e6": s} for s, d in want]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["dirichlet_topk_docs"]) \
        .arrow().to_pylist() == out


def test_embedding_norm_bands_micro(ray_session, tmp_path):
    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.5, -0.25], [0.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1], pa.int32()),
    })
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["embedding_norm_bands"](
            str(tmp_path)).take_all()), "band")
    # |524288| + |-262144| = 786432 -> band 3; zeros -> band 0
    assert out == [{"band": 0, "n_vecs": 1}, {"band": 3, "n_vecs": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["embedding_norm_bands"]).arrow(),
        "band") == out


def test_monthly_top_orders_micro(ray_session, tmp_path):
    import datetime as dt
    d1, d2 = dt.datetime(1996, 1, 10), dt.datetime(1996, 2, 10)
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_totalprice": pa.array([50.0, 70.0, 70.0, 60.0, 10.0],
                                 pa.float64()),
        "o_orderdate": pa.array([d1, d1, d1, d1, d2],
                                pa.timestamp("us")),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = sorted(entrymod.queries()["monthly_top_orders"](
        str(tmp_path)).take_all(),
        key=lambda r: (r["month"], -r["cents"], r["o_orderkey"]))
    # Jan: 7000(#2), 7000(#3 — tie, higher key), 6000(#4); #1 drops.
    assert out == [
        {"month": 199601, "o_orderkey": 2, "cents": 7000},
        {"month": 199601, "o_orderkey": 3, "cents": 7000},
        {"month": 199601, "o_orderkey": 4, "cents": 6000},
        {"month": 199602, "o_orderkey": 5, "cents": 1000}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["monthly_top_orders"]).arrow()
        .to_pylist(),
        key=lambda r: (r["month"], -r["cents"], r["o_orderkey"])) == out


def test_bloom_semi_prefilter_micro(ray_session, tmp_path):
    import datetime as dt
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([499000.0, 100.0], pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    out = entrymod.queries()["bloom_semi_prefilter"](
        str(tmp_path)).to_pylist()[0]
    assert out["n_build_keys"] == 1
    assert out["n_probe_rows"] == 4
    assert out["n_true"] == 2
    assert out["n_bloom_pass"] >= 2          # no false negatives
    assert out["n_false_pos"] == out["n_bloom_pass"] - 2
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert con.sql(entrymod.oracle_sql()["bloom_semi_prefilter"]) \
        .arrow().to_pylist() == [out]


def test_lang_word_jsd_micro(ray_session, tmp_path):
    # en: "x x y" (a_x=2, a_y=1, A=3); fr: "x z" (b_x=1, b_z=1, B=2)
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "lang": pa.array(["en", "fr"], pa.string()),
        "text": pa.array(["x x y", "x z"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["lang_word_jsd"](
        str(tmp_path)).to_pylist()[0]

    def L(num, den):
        return math.floor(1e6 * math.log(num / den) + 0.5)
    # x: den = 2*2 + 1*3 = 7 -> L1=ln(8/7), L2=ln(6/7)
    # y: den = 1*2 = 2 -> L1=ln(4/2); z: den = 1*3 -> L2=ln(6/3)
    s1 = 2 * L(2.0 * 2 * 2, 7) + 1 * L(2.0 * 1 * 2, 2)
    s2 = 1 * L(2.0 * 1 * 3, 7) + 1 * L(2.0 * 1 * 3, 3)
    assert out == {"n_words": 3, "a_total": 3, "b_total": 2,
                   "s1": s1, "s2": s2}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["lang_word_jsd"]).arrow() \
        .to_pylist() == [out]


def test_simpson_diversity_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "lang": pa.array(["en", "de"], pa.string()),
        "text": pa.array(["x x x y", "a b"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["simpson_diversity_by_lang"](
            str(tmp_path)).to_pylist()), "lang")
    assert out == [
        {"lang": "de", "n_types": 2, "n_tokens": 2, "sum_cc1": 0},
        {"lang": "en", "n_types": 2, "n_tokens": 4, "sum_cc1": 6}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["simpson_diversity_by_lang"]).arrow(),
        "lang") == out


def test_user_hour_bitmap_hist_micro(ray_session, tmp_path):
    # user 1 hits hours {0, 5} (0 twice) -> pop 2; user 2 hour {3}.
    sf = _write_events(tmp_path, [
        (1, 0.0, "view"), (1, 0.001, "view"), (1, 5 / 24, "view"),
        (2, 3 / 24, "view")])
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["user_hour_bitmap_hist"](sf).take_all()),
        "n_active_hours")
    assert out == [{"n_active_hours": 1, "n_users": 1},
                   {"n_active_hours": 2, "n_users": 1}]
    assert _sorted_rows(_oracle(sf, "user_hour_bitmap_hist"),
                        "n_active_hours") == out


def test_sorted_neighbor_pairs_micro(ray_session, tmp_path):
    # "aa"/"ab" are globally adjacent but land in DIFFERENT 2-char
    # prefix buckets — the pair must surface via the boundary stitch.
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 10, 11], pa.int64()),
        "p_name": pa.array(["blue bolt", "blue bole", "cyan ring",
                            "cyan rings", "aa", "ab"], pa.string()),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))
    out = sorted(entrymod.queries()["sorted_neighbor_pairs"](
        str(tmp_path)).take_all(), key=lambda r: (r["name1"]))
    assert out == [
        {"key1": 10, "name1": "aa", "key2": 11, "name2": "ab",
         "dist": 1},
        {"key1": 2, "name1": "blue bole", "key2": 1,
         "name2": "blue bolt", "dist": 1},
        {"key1": 3, "name1": "cyan ring", "key2": 4,
         "name2": "cyan rings", "dist": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{tmp_path}/part.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["sorted_neighbor_pairs"]).arrow()
        .to_pylist(), key=lambda r: (r["name1"])) == out


def test_range_partition_sort_micro(ray_session, tmp_path):
    orders = pa.table({
        "o_orderkey": pa.array(list(range(1, 201)), pa.int64()),
        "o_totalprice": pa.array(
            [float(((k * 37) % 100) + 1) for k in range(1, 201)],
            pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = sorted(entrymod.queries()["range_partition_sort"](
        str(tmp_path)).take_all(), key=lambda r: r["pid"])
    # manifest invariants: all rows covered, partitions globally ordered
    assert sum(r["n_rows"] for r in out) == 200
    for a, b in zip(out, out[1:]):
        assert a["pid"] < b["pid"]
        assert a["max_cents"] <= b["min_cents"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["range_partition_sort"]).arrow(),
        "pid") == out


def test_cms_topk_audit_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a a b b c", "a b d"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["cms_topk_audit"](
        str(tmp_path)).to_pylist()
    assert [r["word"] for r in out] == ["a", "b", "c", "d"]
    assert [r["exact"] for r in out] == [4, 3, 1, 1]
    for r in out:
        # the Count-Min guarantee: never an underestimate
        assert r["cms_est"] >= r["exact"]
        assert r["overest"] == r["cms_est"] - r["exact"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["cms_topk_audit"]).arrow() \
        .to_pylist() == out


def test_checkpoint_run_manifest_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(8)],
                         pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["checkpoint_run_manifest"](
        str(tmp_path)).to_pylist()
    # shard0 = groups {0,1} -> docs {0,1,4,5}; shard1 -> {2,3,6,7}
    assert out == [
        {"shard_idx": 0, "n_docs": 4, "n_spans": 8},
        {"shard_idx": 1, "n_docs": 4, "n_spans": 8}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["checkpoint_run_manifest"]).arrow(),
        "shard_idx") == out


def test_doc_len_log2_hist_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["", "a", "a b c", "w " * 8], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["doc_len_log2_hist"](
            str(tmp_path)).take_all()), "bits")
    assert out == [{"bits": 0, "n_docs": 1}, {"bits": 1, "n_docs": 1},
                   {"bits": 2, "n_docs": 1}, {"bits": 4, "n_docs": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["doc_len_log2_hist"]).arrow(),
        "bits") == out


def test_lang_length_pct_rank_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "en", "fr"], pa.string()),
        "n_chars": pa.array([10, 10, 20, 7], pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["lang_length_pct_rank"](
            str(tmp_path)).take_all()), "doc_id")
    # en: two 10s share rank 1 (num 0), the 20 has num 2; den = 2.
    # fr singleton: num 0, den 0 (the N=1 PERCENT_RANK edge).
    assert out == [
        {"doc_id": 0, "lang": "en", "n_chars": 10, "rk_num": 0,
         "rk_den": 2},
        {"doc_id": 1, "lang": "en", "n_chars": 10, "rk_num": 0,
         "rk_den": 2},
        {"doc_id": 2, "lang": "en", "n_chars": 20, "rk_num": 2,
         "rk_den": 2},
        {"doc_id": 3, "lang": "fr", "n_chars": 7, "rk_num": 0,
         "rk_den": 0}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["lang_length_pct_rank"]).arrow(),
        "doc_id") == out


def test_nation_top3_names_concat_micro(ray_session, tmp_path):
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_name": pa.array(["A", "B", "C", "D", "E", "F"],
                           pa.string()),
        "c_nationkey": pa.array([0, 0, 0, 0, 1, 1], pa.int32()),
        "c_acctbal": pa.array([5.0, 9.0, 9.0, 1.0, 3.0, 2.0],
                              pa.float64()),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    out = _sorted_rows(entrymod.queries()["nation_top3_names_concat"](
        str(tmp_path)), "nation")
    # nation 0: 900(B), 900(C tie by key), 500(A); D drops.
    assert out == [
        {"nation": 0, "n_top": 3, "top_names": "B,C,A"},
        {"nation": 1, "n_top": 2, "top_names": "E,F"}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{tmp_path}/customer.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["nation_top3_names_concat"]).arrow(),
        "nation") == out


def test_daily_value_ohlc_micro(ray_session, tmp_path):
    # day 0 (by arrival ts order): 3.0, 1.0, 9.0, 2.0
    # -> open 300, high 900, low 100, close 200; day 1: single 5.0
    rows = [(1, 0.10, "view"), (1, 0.20, "view"), (1, 0.30, "view"),
            (1, 0.40, "view"), (2, 1.5, "view")]
    t = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([T0 + int(d * US_DAY) for _u, d, _e in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([u for u, _d, _e in rows], pa.int64()),
        "event_type": pa.array(["view"] * 5, pa.string()),
        "value": pa.array([3.0, 1.0, 9.0, 2.0, 5.0], pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = entrymod.queries()["daily_value_ohlc"](
        str(tmp_path)).to_pylist()
    da = (T0 + int(0.10 * US_DAY)) // US_DAY
    db = (T0 + int(1.5 * US_DAY)) // US_DAY
    assert out == [
        {"day": da, "open_cents": 300, "high_cents": 900,
         "low_cents": 100, "close_cents": 200, "n": 4},
        {"day": db, "open_cents": 500, "high_cents": 500,
         "low_cents": 500, "close_cents": 500, "n": 1}]
    assert _sorted_rows(_oracle(str(tmp_path), "daily_value_ohlc"),
                        "day") == out


def test_zorder_locality_audit_micro(ray_session, tmp_path):
    import datetime as dt
    # x = cents//200000 clip 255; y = epoch-day % 256; zbucket=code>>8
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([0.0, 999999.0], pa.float64()),
        "o_orderdate": pa.array([dt.datetime(1970, 1, 1)] * 2,
                                pa.timestamp("us")),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["zorder_locality_audit"](
            str(tmp_path)).take_all()), "zbucket")

    def code(x, y):
        c = 0
        for i in range(8):
            c |= ((x >> i) & 1) << (2 * i)
            c |= ((y >> i) & 1) << (2 * i + 1)
        return c
    assert out == [
        {"zbucket": code(0, 0) >> 8, "n_rows": 1},
        {"zbucket": code(255, 0) >> 8, "n_rows": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["zorder_locality_audit"]).arrow(),
        "zbucket") == out


def test_hll_group_audit_micro(ray_session, tmp_path):
    import hashlib as hl
    sf = _write_events(tmp_path, [
        (7, 0.1, "view"), (7, 0.2, "view"), (9, 0.3, "view"),
        (7, 0.4, "purchase")])
    out = _sorted_rows(
        entrymod.queries()["hll_group_audit"](sf), "event_type")

    def reg_rho(key):
        hv = int.from_bytes(hl.md5(key.encode()).digest()[:8], "big")
        rest = hv & ((1 << 56) - 1)
        rho = 56 - rest.bit_length() + 1 if rest else 57
        return hv >> 56, rho

    def expect(keys):
        regs = {}
        for k in keys:
            r, p = reg_rho(k)
            regs[r] = max(regs.get(r, 0), p)
        num = sum(1 << (60 - p) for p in regs.values()) \
            + (256 - len(regs)) * (1 << 60)
        return 256 - len(regs), str(num)

    zv, hv_ = expect(["7", "9"])
    zp, hp = expect(["7"])
    assert out == [
        {"event_type": "purchase", "n_exact": 1, "n_zero_regs": zp,
         "harmonic_num": hp},
        {"event_type": "view", "n_exact": 2, "n_zero_regs": zv,
         "harmonic_num": hv_}]
    assert _sorted_rows(_oracle(sf, "hll_group_audit"),
                        "event_type") == out


def test_fk_integrity_audit_micro(ray_session, tmp_path):
    # orders 5 and 6 appear in lineitem; 6 is MISSING from orders ->
    # one orphan key on the lineitem->orders edge.
    pq.write_table(pa.table({
        "l_orderkey": pa.array([5, 5, 6], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([5], pa.int64()),
        "o_custkey": pa.array([1], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_nationkey": pa.array([3], pa.int32())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32())}),
        str(tmp_path / "nation.parquet"))
    out = _sorted_rows(entrymod.queries()["fk_integrity_audit"](
        str(tmp_path)), "relation")
    assert out == [
        {"relation": "customer->nation", "n_child_rows": 1,
         "n_child_keys": 1, "n_orphan_keys": 0},
        {"relation": "lineitem->orders", "n_child_rows": 3,
         "n_child_keys": 2, "n_orphan_keys": 1},
        {"relation": "orders->customer", "n_child_rows": 1,
         "n_child_keys": 1, "n_orphan_keys": 0},
        {"relation": "supplier->nation", "n_child_rows": 1,
         "n_child_keys": 1, "n_orphan_keys": 1}]
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["fk_integrity_audit"]).arrow(),
        "relation") == out


def test_merge_upsert_audit_micro(ray_session, tmp_path):
    import datetime as dt
    # keys 1,2,97*2=194: 2 is URGENT (update +1000); 194 % 97 == 0
    # also spawns NEW key 10000194 (insert, 555); key 1 unchanged.
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 194], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "o_orderpriority": pa.array(
            ["5-LOW", "1-URGENT", "3-MEDIUM"], pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = entrymod.queries()["merge_upsert_audit"](
        str(tmp_path)).to_pylist()
    # after: key1 1000 (unchanged), key2 2000+1000 (updated),
    # key194 3000 (unchanged), key10000194 555 (inserted)
    assert out == [{
        "n_base": 3, "n_updates": 2, "n_inserted": 1,
        "n_updated": 1, "n_unchanged": 2,
        "total_cents_after": 1000 + 3000 + 3000 + 555}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert con.sql(entrymod.oracle_sql()["merge_upsert_audit"]) \
        .arrow().to_pylist() == out


def test_per_lang_sample_k_micro(ray_session, tmp_path):
    import hashlib as hl
    docs = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "lang": pa.array(["en"] * 8 + ["fr"] * 4, pa.string()),
        "text": pa.array(["x"] * 12, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["per_lang_sample_k"](
        str(tmp_path)).to_pylist()

    def h(i):
        return int(hl.md5(str(i).encode()).hexdigest()[:15], 16)
    want = []
    for lang, ids in (("en", range(8)), ("fr", range(8, 12))):
        picks = sorted((h(i), i) for i in ids)[:5]
        want += [{"lang": lang, "rank": r, "doc_id": d}
                 for r, (_hv, d) in enumerate(picks, 1)]
    assert out == want
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["per_lang_sample_k"]).arrow()
        .to_pylist(), key=lambda r: (r["lang"], r["rank"])) == out


def test_e2e_curation_pipeline_micro(ray_session, tmp_path):
    long_uniq = " ".join(f"tok{i}" for i in range(30))      # kept
    dup = " ".join(f"dup{i}" for i in range(30))            # kept x2
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([long_uniq, dup, dup, "too short"],
                         pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([1] * 4, pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["e2e_curation_pipeline"](
        str(tmp_path)).to_pylist()
    assert out == [{
        "n_extracted": 4, "n_quality_kept": 3, "n_unique_kept": 2,
        "n_dupes_removed": 1,
        "total_chars_kept": len(long_uniq) + len(dup)}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["e2e_curation_pipeline"]) \
        .arrow().to_pylist() == out


def test_source_dup_crosstab_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "same", "same", "other", "uniq"],
                         pa.string()),
        "source": pa.array(["s1", "s2", "s1", "s1", "s2"],
                           pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["source_dup_crosstab"](
        str(tmp_path)).to_pylist()
    # "same" cluster: s1 x2, s2 x1 -> (s1,s1):1, (s1,s2):2
    assert out == [
        {"source_a": "s1", "source_b": "s1", "n_dup_pairs": 1},
        {"source_a": "s1", "source_b": "s2", "n_dup_pairs": 2}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["source_dup_crosstab"]).arrow()
        .to_pylist(),
        key=lambda r: (r["source_a"], r["source_b"])) == out


def test_user_daily_gapfill_micro(ray_session, tmp_path):
    # user 1 active on days d, d+3 (counts 2, 5) -> gap days d+1, d+2
    # interpolate: num = 2*(d2-x) + 5*(x-d1), den = 3
    sf = _write_events(tmp_path, [
        (1, 0.0, "view"), (1, 0.001, "view"),
        (1, 3.0, "view"), (1, 3.001, "view"), (1, 3.002, "view"),
        (1, 3.003, "view"), (1, 3.004, "view")])
    out = sorted(entrymod.queries()["user_daily_gapfill"](
        sf).take_all(), key=lambda r: r["day"])
    d = T0 // US_DAY
    assert out == [
        {"user_id": 1, "day": d, "present": 1, "num": 2, "den": 1},
        {"user_id": 1, "day": d + 1, "present": 0,
         "num": 2 * 2 + 5 * 1, "den": 3},
        {"user_id": 1, "day": d + 2, "present": 0,
         "num": 2 * 1 + 5 * 2, "den": 3},
        {"user_id": 1, "day": d + 3, "present": 1, "num": 5,
         "den": 1}]
    assert _sorted_rows(_oracle(sf, "user_daily_gapfill"),
                        "day") == out


def test_rounding_policy_audit_micro(ray_session, tmp_path):
    # 0.125 -> 12.5 cents: half-up 13, banker's 12 -> divergent +1;
    # 0.135 is 13.5 in decimal but NOT exactly .5 in binary -> both
    # agree; 1.0 -> 100 exact, agree.
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([0.125, 1.0, 0.145], pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = entrymod.queries()["rounding_policy_audit"](
        str(tmp_path)).to_pylist()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert con.sql(entrymod.oracle_sql()["rounding_policy_audit"]) \
        .arrow().to_pylist() == out
    assert out[0]["n_rows"] == 3 and out[0]["n_divergent"] >= 1


def test_html_table_cells_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["x"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = sorted(entrymod.queries()["html_table_cells"](
        str(tmp_path)).take_all(), key=lambda r: (r["r"], r["c"]))
    # d=2 -> 6 data cells over 3 rows after the header
    assert out == [
        {"doc_id": 2, "r": 0, "c": 0, "cell": "h0"},
        {"doc_id": 2, "r": 0, "c": 1, "cell": "h1"},
        {"doc_id": 2, "r": 1, "c": 0, "cell": "c2-0"},
        {"doc_id": 2, "r": 1, "c": 1, "cell": "c2-1"},
        {"doc_id": 2, "r": 2, "c": 0, "cell": "c2-2"},
        {"doc_id": 2, "r": 2, "c": 1, "cell": "c2-3"},
        {"doc_id": 2, "r": 3, "c": 0, "cell": "c2-4"},
        {"doc_id": 2, "r": 3, "c": 1, "cell": "c2-5"}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["html_table_cells"]).arrow()
        .to_pylist(), key=lambda r: (r["r"], r["c"])) == out


def test_form_disabled_census_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 5], pa.int64()),
        "text": pa.array(["x"] * 3, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["form_disabled_census"](
            str(tmp_path)).take_all()), "doc_id")
    # d=0: 5 controls, button disabled; d=1: fieldset cascade (3);
    # d=5: cascade (4) + button (1)
    assert out == [
        {"doc_id": 0, "n_controls": 5, "n_disabled": 1},
        {"doc_id": 1, "n_controls": 7, "n_disabled": 3},
        {"doc_id": 5, "n_controls": 8, "n_disabled": 5}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["form_disabled_census"]).arrow(),
        "doc_id") == out


def test_foreign_and_scripting_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 5], pa.int64()),
        "text": pa.array(["x"] * 3, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    fc = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["foreign_content_census"](
            str(tmp_path)).take_all()), "doc_id")
    assert fc == [
        {"doc_id": 0, "n_svg": 3, "n_math": 4, "n_html_ip": 1},
        {"doc_id": 1, "n_svg": 4, "n_math": 5, "n_html_ip": 1},
        {"doc_id": 5, "n_svg": 4, "n_math": 6, "n_html_ip": 1}]
    sd = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["scripting_flag_diff"](
            str(tmp_path)).take_all()), "doc_id")
    assert sd == [
        {"doc_id": 0, "n_elems_on": 4, "n_elems_off": 6},
        {"doc_id": 1, "n_elems_on": 4, "n_elems_off": 7},
        {"doc_id": 5, "n_elems_on": 4, "n_elems_off": 8}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["foreign_content_census"]).arrow(),
        "doc_id") == fc
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["scripting_flag_diff"]).arrow(),
        "doc_id") == sd


def test_template_and_entities_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["x"] * 6, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    tc = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["template_content_census"](
            str(tmp_path)).take_all()), "doc_id")
    assert tc == [{"doc_id": d, "n_tpl_items": d % 3 + 1,
                   "n_list_items": d % 2 + 1} for d in range(6)]
    ee = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["entity_edge_cases"](
            str(tmp_path)).take_all()), "doc_id")
    assert [r["decoded"] for r in ee] == [
        "X¬it;Y", "X�Y", "X�Y", "X&lt;Y",
        "XÜY", "X©=ZY"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["template_content_census"]).arrow(),
        "doc_id") == tc
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["entity_edge_cases"]).arrow(),
        "doc_id") == ee


def test_adoption_and_rawtext_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 6], pa.int64()),
        "text": pa.array(["x"] * 4, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    aa = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["adoption_agency_census"](
            str(tmp_path)).take_all()), "doc_id")
    assert aa == [
        {"doc_id": 0, "n_b": 1, "n_i": 2, "n_a": 0, "n_p": 1},
        {"doc_id": 1, "n_b": 2, "n_i": 0, "n_a": 0, "n_p": 1},
        {"doc_id": 2, "n_b": 0, "n_i": 0, "n_a": 3, "n_p": 1},
        {"doc_id": 6, "n_b": 1, "n_i": 2, "n_a": 0, "n_p": 1}]
    rt = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["rawtext_payload_len"](
            str(tmp_path)).take_all()), "doc_id")
    assert rt == [{"doc_id": d, "script_len": 17 + d % 7,
                   "style_len": 8 + d % 5} for d in (0, 1, 2, 6)]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["adoption_agency_census"]).arrow(),
        "doc_id") == aa
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["rawtext_payload_len"]).arrow(),
        "doc_id") == rt


def test_attr_edges_and_wilson_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["x"] * 4, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    ae = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["attr_edge_census"](
            str(tmp_path)).take_all()), "doc_id")
    assert [r["attrs_csv"] for r in ae] == [
        "a=1,b=,c=3", "x=a/b,y=c&d,z=", "checked=", "a=UP,ab=2"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["attr_edge_census"]).arrow(),
        "doc_id") == ae

    # Wilson: k=3 of n=4 -> hand-check one bound end to end
    sf = _write_events(tmp_path, [
        (1, 0.1, "view"), (1, 0.2, "view"), (1, 0.3, "view"),
        (2, 0.4, "purchase")])
    out = _sorted_rows(entrymod.queries()["type_share_wilson"](sf),
                       "event_type")
    ph, n = 3 / 4, 4
    den = 1 + 1.96 * 1.96 / n
    center = (ph + 1.96 * 1.96 / (2 * n)) / den
    half = 1.96 * math.sqrt(
        ph * (1 - ph) / n + 1.96 * 1.96 / (4 * n * n)) / den
    assert out[1] == {
        "event_type": "view", "k": 3, "n": 4,
        "wilson_lo_e6": math.floor(1e6 * (center - half) + 0.5),
        "wilson_hi_e6": math.floor(1e6 * (center + half) + 0.5)}
    assert _sorted_rows(_oracle(sf, "type_share_wilson"),
                        "event_type") == out


def test_fd_and_division_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lang": pa.array(["en", "en", "fr"], pa.string()),
        "source": pa.array(["s1", "s2", "s1"], pa.string()),
        "n_chars": pa.array([8, 8, 9], pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    fd = _sorted_rows(entrymod.queries()["fd_violation_audit"](
        str(tmp_path)), "fd")
    # lang->source: en -> {s1,s2} = 1 violation; source->lang:
    # s1 -> {en,fr} = 1; lang->chars&7: en->{0}, fr->{1} = 0
    assert fd == [
        {"fd": "lang->chars_and7", "n_violating_groups": 0,
         "n_violations": 0},
        {"fd": "lang->source", "n_violating_groups": 1,
         "n_violations": 1},
        {"fd": "source->lang", "n_violating_groups": 1,
         "n_violations": 1}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["fd_violation_audit"]).arrow(),
        "fd") == fd

    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "5-LOW", "1-URGENT"],
            pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = entrymod.queries()["customers_all_urgent"](
        str(tmp_path)).to_pylist()
    assert out == [{"c_custkey": 1, "n_orders": 2},
                   {"c_custkey": 3, "n_orders": 1}]
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["customers_all_urgent"]).arrow(),
        "c_custkey") == out


def test_host_bfs_micro(ray_session, tmp_path):
    # doc 10 cites {h0, h1} (10%3=1: j=0,1 -> (70+j)%10 = 0,1);
    # doc 23 cites {h1, h2, h3} (23%3=2: (161+j)%10 = 1,2,3).
    # BFS from h0: h0=0, h1=1, h2=h3=2.
    docs = pa.table({
        "doc_id": pa.array([10, 23], pa.int64()),
        "text": pa.array(["x", "y"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(entrymod.queries()["host_bfs_depths"](
        str(tmp_path)), "host")
    h = "{}.example.com".format
    assert out == [
        {"host": h("h0"), "dist": 0}, {"host": h("h1"), "dist": 1},
        {"host": h("h2"), "dist": 2}, {"host": h("h3"), "dist": 2}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["host_bfs_depths"]).arrow(),
        "host") == out


def test_parquet_stats_audit_micro(ray_session, tmp_path):
    orders = pa.table({
        "o_orderkey": pa.array([5, 1, 9], pa.int64()),
        "o_totalprice": pa.array([10.5, 99.25, 3.75], pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = entrymod.queries()["parquet_stats_audit"](
        str(tmp_path)).to_pylist()
    assert out == [
        {"column": "o_orderkey", "true_min": 1.0, "true_max": 9.0,
         "stats_match": True},
        {"column": "o_totalprice", "true_min": 3.75,
         "true_max": 99.25, "stats_match": True}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    assert con.sql(entrymod.oracle_sql()["parquet_stats_audit"]) \
        .arrow().to_pylist() == out


def test_covered_time_union_micro(ray_session, tmp_path):
    # user 1: events at 0h and 0.4h -> one session [0, 0.4h]
    # user 2: events at 0.2h and 0.7h -> [0.2h, 0.7h] (overlaps)
    # user 3: events at 2.0h and 2.1h -> [2.0h, 2.1h] (disjoint)
    H = 1 / 24
    sf = _write_events(tmp_path, [
        (1, 0.0, "view"), (1, 0.4 * H, "view"),
        (2, 0.2 * H, "view"), (2, 0.7 * H, "view"),
        (3, 2.0 * H, "view"), (3, 2.1 * H, "view")])
    out = entrymod.queries()["covered_time_union"](
        str(tmp_path)).to_pylist()
    # union = [0, 0.7h] + [2.0h, 2.1h]
    t = pq.read_table(f"{sf}/events.parquet").column("ts") \
        .cast(pa.int64()).to_pylist()
    want = (max(t[1], t[3]) - t[0]) + (t[5] - t[4])
    assert out == [{"n_sessions": 3, "covered_us": want}]
    assert _oracle(sf, "covered_time_union").to_pylist() == out


def test_compaction_audit_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "n_chars": pa.array([7] * 40, pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = entrymod.queries()["compaction_audit"](
        str(tmp_path)).to_pylist()
    assert out == [
        {"stage": "small", "n_files": 16, "n_rows": 40},
        {"stage": "compact", "n_files": 4, "n_rows": 40}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["compaction_audit"]) \
        .arrow().to_pylist() == out


def test_base_href_and_srcset_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["x"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    br = sorted(entrymod.queries()["base_href_resolution"](
        str(tmp_path)).take_all(), key=lambda r: r["rel"])
    host = "https://b2.example.com"
    assert br == sorted([
        {"doc_id": 2, "rel": "a/b.html",
         "resolved": host + "/dir/sub/a/b.html"},
        {"doc_id": 2, "rel": "../x", "resolved": host + "/dir/x"},
        {"doc_id": 2, "rel": "/abs", "resolved": host + "/abs"},
        {"doc_id": 2, "rel": "?q=1",
         "resolved": host + "/dir/sub/?q=1"},
        {"doc_id": 2, "rel": "#frag",
         "resolved": host + "/dir/sub/#frag"}],
        key=lambda r: r["rel"])
    sc = sorted(entrymod.queries()["srcset_candidates"](
        str(tmp_path)).take_all(), key=lambda r: r["url"])
    assert sc == [
        {"doc_id": 2, "url": "img2-a.jpg", "descriptor": "1x"},
        {"doc_id": 2, "url": "img2-b.jpg", "descriptor": "4x"},
        {"doc_id": 2, "url": "img2-c.jpg", "descriptor": "640w"}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert sorted(con.sql(
        entrymod.oracle_sql()["base_href_resolution"]).arrow()
        .to_pylist(), key=lambda r: r["rel"]) == br
    assert sorted(con.sql(
        entrymod.oracle_sql()["srcset_candidates"]).arrow()
        .to_pylist(), key=lambda r: r["url"]) == sc


def test_meta_robots_and_og_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x"] * 5, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    mr = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["meta_robots_flags"](
            str(tmp_path)).take_all()), "doc_id")
    assert [(r["noindex"], r["nofollow"]) for r in mr] == [
        (0, 0), (1, 0), (0, 1), (1, 1), (1, 1)]
    og = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["opengraph_extract"](
            str(tmp_path)).take_all()), "doc_id")
    assert og[3] == {"doc_id": 3, "og_title": "Doc 3 & more",
                     "og_image": "https://img.example.com/3.png"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["meta_robots_flags"]).arrow(),
        "doc_id") == mr
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["opengraph_extract"]).arrow(),
        "doc_id") == og


def test_stream_join_and_delta_bits_micro(ray_session, tmp_path):
    M = 1 / (24 * 60)    # one minute in days
    sf = _write_events(tmp_path, [
        (1, 0.0, "view"),
        (1, 3 * M, "purchase"),      # within 5 min -> pair
        (1, 10 * M, "purchase"),     # outside
        (1, 9 * M, "view"),          # pairs with the 10-min purchase
        (2, 0.0, "purchase")])       # no views
    out = entrymod.queries()["view_purchase_within5m"](
        sf).to_pylist()
    assert out == [{"user_id": 1, "n_pairs": 2}]
    assert _oracle(sf, "view_purchase_within5m").to_pylist() == out

    db = entrymod.queries()["delta_bits_estimate"](sf).to_pylist()
    # user1 deltas (sorted ts): 3m, 6m, 1m in us; user2 none
    d = [3 * 60_000_000, 6 * 60_000_000, 1 * 60_000_000]
    want = sum((2 * x).bit_length() for x in d)
    assert db == [{"n_deltas": 3, "total_bits": want}]
    assert _oracle(sf, "delta_bits_estimate").to_pylist() == db


def test_list_nesting_census_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["x"] * 5, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["list_nesting_census"](
            str(tmp_path)).take_all()), "doc_id")
    # doc 4: levels=2, k=2 -> 4 li, list depth 2, leaf chain
    # html>body>ul>li>ul>li -> 5 Element ancestors
    assert out[4] == {"doc_id": 4, "n_li": 4, "max_list_depth": 2,
                      "leaf_depth": 5, "leaf_text": "leaf4"}
    # doc 0: a single flat 2-item list
    assert out[0] == {"doc_id": 0, "n_li": 2, "max_list_depth": 1,
                      "leaf_depth": 3, "leaf_text": "leaf0"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["list_nesting_census"]).arrow(),
        "doc_id") == out


def test_max_drawdown_daily_micro(ray_session, tmp_path):
    # daily cents: 500 300 400 100 450 -> peak 500, worst drop 400
    # realized on day T0+3d; running peak never beaten after day 0
    vals = [5.0, 3.0, 4.0, 1.0, 4.5]
    rows = [(1, float(i), "view") for i in range(5)]
    t = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([T0 + i * US_DAY for i in range(5)],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([u for u, _d, _e in rows], pa.int64()),
        "event_type": pa.array([e for _u, _d, e in rows],
                               pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    out = entrymod.queries()["max_drawdown_daily"](sf).to_pylist()
    assert out == [{"n_days": 5, "peak_cents": 500,
                    "max_drawdown_cents": 400,
                    "worst_day": (T0 + 3 * US_DAY) // US_DAY}]
    assert _oracle(sf, "max_drawdown_daily").to_pylist() == out


def test_p_close_census_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 3], pa.int64()),
        "text": pa.array(["x", "x"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["p_close_census"](
            str(tmp_path)).take_all()), "doc_id")
    # doc 0: m=2 chained p + h2 + p-closed-by-div -> 3 p, 5 children
    assert out[0] == {"doc_id": 0, "n_p": 3, "n_body_children": 5,
                      "last_p_text": "open0", "div_text": "inside0"}
    assert out[1] == {"doc_id": 3, "n_p": 6, "n_body_children": 8,
                      "last_p_text": "open3", "div_text": "inside3"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["p_close_census"]).arrow(),
        "doc_id") == out


def test_late_supplier_q21_micro(ray_session, tmp_path):
    day = lambda n: T0 + n * US_DAY  # noqa: E731
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["S1", "S2"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30, 40], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "O", "F"], pa.string()),
        "o_orderdate": pa.array([day(0)] * 4,
                                pa.int64()).cast(pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    li = [  # (ok, sk, ship_day)
        (10, 1, 100), (10, 2, 10),   # sole late supp 1 -> credit
        (20, 1, 100), (20, 2, 95),   # both late -> no credit
        (30, 2, 100),                # status O -> excluded
        (40, 1, 100),                # single supplier -> no credit
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_shipdate": pa.array([day(r[2]) for r in li],
                               pa.int64()).cast(pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = entrymod.queries()["late_supplier_q21"](
        str(tmp_path)).take_all()
    out = [{"s_name": r["s_name"], "numwait": r["numwait"]}
           for r in out]
    assert out == [{"s_name": "S1", "numwait": 1}]
    con = duckdb.connect()
    for t in ("supplier", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert con.sql(entrymod.oracle_sql()["late_supplier_q21"]) \
        .arrow().to_pylist() == out


def test_afe_and_pre_newline_census_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["x"] * 3, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    afe = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["afe_reconstruct_census"](
            str(tmp_path)).take_all()), "doc_id")
    # doc 2: 3 paragraphs -> 3 b clones, 3 i clones + the tail's
    # i-only reconstruction after the stray </b>
    assert afe[2] == {"doc_id": 2, "n_b": 3, "n_i": 4,
                      "last_i_text": "tail2"}
    pre = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["pre_newline_census"](
            str(tmp_path)).take_all()), "doc_id")
    # doc 0 HAS the leading newline (dropped); doc 1 does not
    assert pre[0] == {"doc_id": 0, "pre_text": "A0\nB",
                      "ta_text": "T0", "pre_len": 4}
    assert pre[1] == {"doc_id": 1, "pre_text": "A1\nB",
                      "ta_text": "T1", "pre_len": 4}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["afe_reconstruct_census"]).arrow(),
        "doc_id") == afe
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["pre_newline_census"]).arrow(),
        "doc_id") == pre


def test_svg_case_adjust_and_q4_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 4], pa.int64()),
        "text": pa.array(["x"] * 2, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    svg = _sorted_rows(pa.Table.from_pylist(
        entrymod.queries()["svg_case_adjust_census"](
            str(tmp_path)).take_all()), "doc_id")
    assert svg[0] == {"doc_id": 0, "child_tag": "textPath",
                      "attr_name": "preserveAspectRatio",
                      "attr_value": "v0"}
    assert svg[1] == {"doc_id": 4, "child_tag": "feBlend",
                      "attr_name": "viewBox", "attr_value": "v4"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert _sorted_rows(con.sql(
        entrymod.oracle_sql()["svg_case_adjust_census"]).arrow(),
        "doc_id") == svg

    # Q4 micro: order 10 in-window with a >60d-late line; order 20
    # in-window on time; order 30 outside the window though late
    def ts(y, m, d):
        import datetime
        return int(datetime.datetime(y, m, d).timestamp() * 1e6)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        "o_orderdate": pa.array(
            [ts(1997, 2, 1), ts(1997, 3, 1), ts(1996, 2, 1)],
            pa.int64()).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "2-HIGH"], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 20, 30], pa.int64()),
        "l_shipdate": pa.array(
            [ts(1997, 5, 1), ts(1997, 3, 15), ts(1996, 8, 1)],
            pa.int64()).cast(pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = entrymod.queries()["order_priority_q4"](
        str(tmp_path)).to_pylist()
    assert out == [{"o_orderpriority": "1-URGENT", "order_count": 1}]
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert con.sql(entrymod.oracle_sql()["order_priority_q4"]) \
        .arrow().to_pylist() == out


def test_cdata_and_trade_balance_micro(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["x"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    cd = entrymod.queries()["cdata_foreign_census"](
        str(tmp_path)).take_all()
    assert cd == [{"doc_id": 7, "svg_text": "c7 <x> &amp;",
                   "bogus_comment": "[CDATA[h7]]", "n_comments": 2}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    assert con.sql(entrymod.oracle_sql()["cdata_foreign_census"]) \
        .arrow().to_pylist() == cd

    # trade balance: nation 0 imports 100, nation 1 exports 100;
    # nation 2 inactive (kept with zeros)
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["A-NAT", "B-NAT", "C-NAT"], pa.string()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5], pa.int64()),
        "s_nationkey": pa.array([1], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10], pa.int64()),
        "l_suppkey": pa.array([5], pa.int64()),
        "l_extendedprice": pa.array([1.25], pa.float64()),
        "l_discount": pa.array([0.2], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = entrymod.queries()["nation_trade_balance"](
        str(tmp_path)).to_pylist()
    assert out == [
        {"n_name": "A-NAT", "import_cents": 100, "export_cents": 0,
         "balance_cents": -100},
        {"n_name": "B-NAT", "import_cents": 0, "export_cents": 100,
         "balance_cents": 100},
        {"n_name": "C-NAT", "import_cents": 0, "export_cents": 0,
         "balance_cents": 0}]
    for t in ("nation", "customer", "supplier", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    assert con.sql(entrymod.oracle_sql()["nation_trade_balance"]) \
        .arrow().to_pylist() == out
