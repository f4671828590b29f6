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
