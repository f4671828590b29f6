"""Combiner (partial aggregation) tests."""

import pyarrow as pa

from htmlreader_ray.functions.shuffle import combine_aggregate


def test_combine_aggregate_matches_naive(ray_session):
    import ray.data
    t = pa.Table.from_arrays(
        [pa.array(["a", "b", "a", "a", "b"], pa.string()),
         pa.array([1.0, 2.0, 5.0, -1.0, 7.0], pa.float64())],
        names=["k", "v"])
    # multiple blocks so partials actually merge
    ds = ray.data.from_arrow(t).repartition(3)
    out = combine_aggregate(
        ds, ["k"], [("v", "count", "n"), ("v", "sum", "s"),
                    ("v", "min", "lo"), ("v", "max", "hi")]).take_all()
    rows = {r["k"]: r for r in out}
    assert rows["a"]["n"] == 3 and rows["a"]["s"] == 5.0
    assert rows["a"]["lo"] == -1.0 and rows["a"]["hi"] == 5.0
    assert rows["b"]["n"] == 2 and rows["b"]["s"] == 9.0


def test_combine_aggregate_multikey(ray_session):
    import ray.data
    t = pa.Table.from_arrays(
        [pa.array(["x", "x", "y"], pa.string()),
         pa.array([1, 2, 1], pa.int64()),
         pa.array([10.0, 20.0, 30.0], pa.float64())],
        names=["a", "b", "v"])
    ds = ray.data.from_arrow(t).repartition(2)
    out = combine_aggregate(ds, ["a", "b"],
                            [("v", "sum", "total")]).take_all()
    got = {(r["a"], r["b"]): r["total"] for r in out}
    assert got == {("x", 1): 10.0, ("x", 2): 20.0, ("y", 1): 30.0}


def test_ordered_prefix_sum(ray_session):
    import ray.data
    import pyarrow as pa
    from htmlreader_ray.functions.scan import ordered_prefix_sum, token_pack
    import random
    rng = random.Random(3)
    ids = list(range(250))
    rng.shuffle(ids)  # arrival order must not matter
    vals = [(i * 7) % 13 + 1 for i in ids]
    t = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(vals, pa.int64())],
        names=["doc_id", "n_tokens"])
    ds = ray.data.from_arrow(t)
    out = ordered_prefix_sum(ds, order_col="doc_id", value_col="n_tokens",
                             bucket_size=64).take_all()
    got = {r["doc_id"]: r["prefix_sum"] for r in out}
    acc, want = 0, {}
    for i in range(250):
        want[i] = acc
        acc += (i * 7) % 13 + 1
    assert got == want
    packed = token_pack(ds, seq_len=16, bucket_size=64).take_all()
    by_id = {r["doc_id"]: r for r in packed}
    assert by_id[0]["chunk_id"] == 0
    for i in range(250):
        assert by_id[i]["chunk_id"] == want[i] // 16


def test_grouped_topk_ties_and_blocks(ray_session):
    import random
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_topk
    rng = random.Random(7)
    groups, ids, vals = [], [], []
    for i in range(400):
        groups.append(rng.randrange(6))
        ids.append(i)
        vals.append(float(rng.randrange(10)))  # heavy ties
    t = pa.Table.from_arrays(
        [pa.array(groups, pa.int64()), pa.array(ids, pa.int64()),
         pa.array(vals, pa.float64())],
        names=["g", "id", "v"])
    ds = ray.data.from_arrow(t).repartition(7)
    out = grouped_topk(ds, group_col="g", order_col="v", id_col="id",
                       k=3).take_all()
    # naive reference: per group sort by (-v, id), head 3
    want = {}
    for g, i, v in zip(groups, ids, vals):
        want.setdefault(g, []).append((-v, i))
    for g in want:
        want[g] = sorted(want[g])[:3]
    got = {}
    for r in out:
        got.setdefault(r["g"], []).append((-r["v"], r["id"]))
    for g in got:
        got[g] = sorted(got[g])
    assert got == want


def test_grouped_topk_small_groups(ray_session):
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_topk
    t = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()), pa.array([10, 20], pa.int64()),
         pa.array([1.5, 2.5], pa.float64())],
        names=["g", "id", "v"])
    out = grouped_topk(ray.data.from_arrow(t), group_col="g",
                       order_col="v", id_col="id", k=3).take_all()
    assert len(out) == 2  # groups smaller than k pass through whole


def test_grouped_exact_median_matches_naive(ray_session):
    import random
    import statistics
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_exact_median
    rng = random.Random(11)
    keys, vals = [], []
    for _ in range(501):
        keys.append("k%d" % rng.randrange(4))
        vals.append(rng.randrange(-50, 50))
    t = pa.Table.from_arrays(
        [pa.array(keys, pa.string()), pa.array(vals, pa.int64())],
        names=["k", "v"])
    ds = ray.data.from_arrow(t).repartition(5)
    out = grouped_exact_median(ds, ["k"], "v", out_col="med").take_all()
    got = {r["k"]: r["med"] for r in out}
    want = {}
    for k in set(keys):
        s = sorted(v for kk, v in zip(keys, vals) if kk == k)
        want[k] = s[(len(s) - 1) // 2]  # lower median
    assert got == want
    # cross-check with statistics.median_low
    for k in want:
        s = [v for kk, v in zip(keys, vals) if kk == k]
        assert got[k] == statistics.median_low(s)


def test_grouped_budget_filter_matches_window(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.scan import grouped_budget_filter

    rng = np.random.default_rng(11)
    n = 400
    part = rng.integers(0, 3, n)
    order = rng.permutation(n).astype(np.int64)
    val = rng.integers(1, 50, n).astype(np.int64)
    t = pa.table({"g": pa.array([f"p{i}" for i in part]),
                  "k": pa.array(order), "v": pa.array(val),
                  "id": pa.array(np.arange(n, dtype=np.int64))})
    budget = 800
    ds = ray.data.from_arrow(t).repartition(7)
    got = {r["id"]: r["cum"] for r in grouped_budget_filter(
        ds, part_cols=["g"], order_col="k", tiebreak_col="id",
        value_col="v", budget=budget, bucket_size=32).take_all()}
    # brute force: inclusive running sum per partition in (k, id) order
    want = {}
    for g in set(f"p{i}" for i in part):
        rows = sorted((int(order[i]), i) for i in range(n)
                      if f"p{part[i]}" == g)
        acc = 0
        for _, i in rows:
            acc += int(val[i])
            if acc <= budget:
                want[i] = acc
    assert got == want


def test_grouped_ntile_matches_rank_formula(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.scan import grouped_ntile

    rng = np.random.default_rng(5)
    n = 300
    part = rng.integers(0, 4, n)
    score = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"g": pa.array([f"L{i}" for i in part]),
                  "s": pa.array(score),
                  "id": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(5)
    got = {r["id"]: r["tile"] for r in grouped_ntile(
        ds, part_cols=["g"], order_col="s", tiebreak_col="id",
        tiles=3, bucket_size=64).take_all()}
    for g in set(f"L{i}" for i in part):
        rows = sorted((int(score[i]), i) for i in range(n)
                      if f"L{part[i]}" == g)
        tot = len(rows)
        for rank, (_, i) in enumerate(rows, start=1):
            assert got[i] == (rank - 1) * 3 // tot + 1
    assert len(got) == n


def test_temperature_sample_exact_and_invariant(ray_session):
    """alpha=1/2 mixing: keep decisions match the arbitrary-precision
    threshold replay, the smallest group keeps everything, and the
    result is partition-invariant."""
    import hashlib
    import math

    import pyarrow as pa
    import ray.data

    from htmlreader_ray.functions.scan import temperature_sample

    n = 400
    grp = ["big" if i % 4 else f"s{i % 3}" for i in range(n)]
    keys = [int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
            for i in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "grp": pa.array(grp), "__hkey": pa.array(keys,
                                                           pa.int64())})
    # brute-force thresholds in python ints
    from collections import Counter
    sizes = Counter(grp)
    w = {s: math.floor(math.sqrt(float(c)) * 1000 + 0.5)
         for s, c in sizes.items()}
    m = None
    for s in sorted(sizes):
        if m is None or w[s] * sizes[m] > w[m] * sizes[s]:
            m = s
    thr = {s: (w[s] * sizes[m] * (1 << 52)) // (sizes[s] * w[m])
           for s in sizes}
    want = {i for i in range(n) if keys[i] < thr[grp[i]]}
    for parts in (1, 6):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = {r["doc_id"] for r in temperature_sample(
            ds, source_col="grp").take_all()}
        assert got == want, parts
    # the smallest groups (rate 1, threshold 2^52 > any 52-bit key) all kept
    small = {i for i in range(n) if grp[i] != "big"}
    assert small <= want
    # and the big group is genuinely downsampled
    assert len(want & {i for i in range(n) if grp[i] == "big"}) \
        < sum(1 for g in grp if g == "big")


def test_grouped_percentile_disc(ray_session):
    import numpy as np
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_percentile_disc

    rng = np.random.RandomState(7)
    g = rng.randint(0, 3, 500)
    v = rng.randint(-1000, 1000, 500)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    out = {r["g"]: r for r in grouped_percentile_disc(
        ray.data.from_arrow(t), ["g"], "v",
        [("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)]).take_all()}
    for grp in range(3):
        vals = np.sort(v[g == grp])
        n = len(vals)
        for name, num, den in [("p10", 1, 10), ("p50", 1, 2),
                               ("p90", 9, 10)]:
            k = max(1, min((num * n + den - 1) // den, n))
            assert out[grp][name] == vals[k - 1], (grp, name)


def test_grouped_percentile_disc_dup_values(ray_session):
    # heavy ties: the distribution table is much smaller than the rows
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_percentile_disc

    t = pa.table({"g": pa.array(["a"] * 100, pa.string()),
                  "v": pa.array([5] * 90 + [100] * 10, pa.int64())})
    out = grouped_percentile_disc(
        ray.data.from_arrow(t), ["g"], "v",
        [("p10", 1, 10), ("p90", 9, 10), ("p95", 19, 20)]).take_all()
    assert out[0]["p10"] == 5 and out[0]["p90"] == 5
    assert out[0]["p95"] == 100


def test_grouped_percentile_cont(ray_session):
    import numpy as np
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_percentile_cont

    rng = np.random.RandomState(11)
    g = rng.randint(0, 3, 400)
    v = rng.randint(-500, 500, 400)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    out = {r["g"]: r["p95"] for r in grouped_percentile_cont(
        ray.data.from_arrow(t), ["g"], "v", 19, 20,
        out_col="p95").take_all()}
    for grp in range(3):
        vals = np.sort(v[g == grp])
        n = len(vals)
        idx = (n - 1) * 19
        k0, m = idx // 20, idx % 20
        lo = float(vals[k0])
        hi = float(vals[min(k0 + 1, n - 1)])
        want = lo + (hi - lo) * (float(m) / 20.0)
        assert out[grp] == want, grp


def test_grouped_percentile_cont_single_value(ray_session):
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_percentile_cont

    t = pa.table({"g": pa.array(["a"], pa.string()),
                  "v": pa.array([42], pa.int64())})
    out = grouped_percentile_cont(
        ray.data.from_arrow(t), ["g"], "v", 19, 20).take_all()
    assert out[0]["p"] == 42.0


def test_grouped_gini_e6(ray_session):
    import math

    import numpy as np
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_gini_e6

    rng = np.random.default_rng(7)
    g = rng.integers(0, 3, 400)
    v = rng.integers(1, 50, 400).astype(np.int64)  # heavy ties
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    out = {r["g"]: r for r in grouped_gini_e6(
        ray.data.from_arrow(t), ["g"], "v").take_all()}
    for grp in range(3):
        vals = np.sort(v[g == grp])
        n = len(vals)
        num = sum((2 * (i + 1) - n - 1) * int(x)
                  for i, x in enumerate(vals))
        want = math.floor(1e6 * float(num) / float(n * int(vals.sum())))
        assert out[grp]["n"] == n
        assert out[grp]["gini_e6"] == want, grp


def test_grouped_gini_e6_equal_values(ray_session):
    import ray.data
    from htmlreader_ray.functions.shuffle import grouped_gini_e6

    t = pa.table({"g": pa.array(["a"] * 5, pa.string()),
                  "v": pa.array([10] * 5, pa.int64())})
    out = grouped_gini_e6(ray.data.from_arrow(t), ["g"], "v").take_all()
    assert out[0]["gini_e6"] == 0 and out[0]["n"] == 5
