"""KLL quantile sketch: exactness below capacity, bounded rank error
above it, merge = concat-then-compact, and full determinism (the
driver's value-hash oracle requires bit-stable results)."""

import numpy as np
import pyarrow as pa
import pytest

from htmlreader_ray.functions.quantiles import KLLSketch

FRACS = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]


def _exact(vals, fracs):
    s = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(s)
    return [float(s[(n - 1) * a // b]) for a, b in fracs]


def _rank_of(vals, x):
    return int(np.searchsorted(np.sort(vals), x, side="right"))


def test_exact_below_capacity():
    rng = np.random.RandomState(7)
    vals = rng.normal(size=5000) * 100
    sk = KLLSketch(k=8192)
    sk.extend(vals)
    assert sk.total_weight() == 5000
    assert sk.quantiles(FRACS) == _exact(vals, FRACS)


def test_rank_error_bounded_when_compacting():
    rng = np.random.RandomState(11)
    vals = rng.exponential(size=200_000)
    sk = KLLSketch(k=1024)
    for i in range(0, len(vals), 10_000):      # streaming batches
        sk.extend(vals[i:i + 10_000])
    assert sk.total_weight() == len(vals)
    for (a, b), est in zip(FRACS, sk.quantiles(FRACS)):
        want_rank = (len(vals) - 1) * a // b + 1
        got_rank = _rank_of(vals, est)
        # 2% of N rank error at k=1024 (theory: O(N/k) with small const)
        assert abs(got_rank - want_rank) <= 0.02 * len(vals), (a, b)


def test_merge_matches_weight_and_bounds():
    rng = np.random.RandomState(3)
    a, b = rng.uniform(size=60_000), rng.uniform(low=2, high=3, size=40_000)
    ska, skb = KLLSketch(k=512), KLLSketch(k=512)
    ska.extend(a)
    skb.extend(b)
    merged = KLLSketch.from_table(
        pa.concat_tables([ska.to_table(), skb.to_table()]), k=512)
    assert merged.total_weight() == 100_000
    allv = np.concatenate([a, b])
    for (fa, fb), est in zip(FRACS, merged.quantiles(FRACS)):
        want_rank = (len(allv) - 1) * fa // fb + 1
        assert abs(_rank_of(allv, est) - want_rank) <= 0.04 * len(allv)


def test_deterministic_across_runs():
    rng = np.random.RandomState(5)
    vals = rng.normal(size=50_000)

    def build():
        sk = KLLSketch(k=256)
        for i in range(0, len(vals), 7_000):
            sk.extend(vals[i:i + 7_000])
        return sk.quantiles(FRACS)

    assert build() == build()


def test_serialization_roundtrip_identity():
    rng = np.random.RandomState(9)
    sk = KLLSketch(k=128)
    sk.extend(rng.uniform(size=10_000))
    back = KLLSketch.from_table(sk.to_table(), k=128)
    # same weight; quantiles agree (roundtrip may recompact level layout)
    assert back.total_weight() == sk.total_weight()
    q1, q2 = sk.quantiles(FRACS), back.quantiles(FRACS)
    vals = None
    for a, b in zip(q1, q2):
        assert a == b


def test_nan_and_empty():
    sk = KLLSketch(k=64)
    sk.extend(np.array([]))
    assert sk.total_weight() == 0
    assert all(np.isnan(v) for v in sk.quantiles(FRACS))
    sk.extend(np.array([1.0, np.nan, 2.0]))
    assert sk.total_weight() == 2
    assert sk.quantiles([(1, 2)]) == [1.0]


def test_ray_pipeline_exact_small(ray_session):
    import ray.data
    from htmlreader_ray.functions.quantiles import quantile_sketch
    rng = np.random.RandomState(13)
    vals = rng.normal(size=20_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    out = quantile_sketch(ds, "v", FRACS, k=1 << 16).take_all()
    got = {round(r["q"], 6): r["value"] for r in out}
    want = _exact(vals, FRACS)
    for (a, b), w in zip(FRACS, want):
        assert got[round(a / b, 6)] == w
