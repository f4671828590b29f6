"""connected_components (union-find fast path + distributed star rounds)
and the vectorized PII scrub."""

import pyarrow as pa
import pytest


def _cc(ray, edges, **kw):
    import ray.data as rd
    from htmlreader_ray.functions.dedup import connected_components
    ds = rd.from_arrow(pa.table({
        "id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}))
    return sorted((r["node"], r["component"])
                  for r in connected_components(ds, **kw).take_all())


GRAPH = [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20),
         (4, 3), (7, 7)]  # chain + pair + triangle + dup edge + self loop
EXPECTED = sorted([(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)])


def test_union_find_path(ray_session):
    assert _cc(ray_session, GRAPH) == EXPECTED


def test_star_rounds_path(ray_session):
    # force the distributed large-star/small-star path
    assert _cc(ray_session, GRAPH, small_graph_limit=0,
               shuffle_partitions=2) == EXPECTED


def test_star_rounds_long_chain(ray_session):
    # a long chain is the worst case for label propagation (diameter = n);
    # the star rounds must converge in O(log n) rounds, not n
    chain = [(i, i + 1) for i in range(40)]
    exp = sorted((i, 0) for i in range(41))
    assert _cc(ray_session, chain, small_graph_limit=0,
               shuffle_partitions=2, max_rounds=16) == exp


def test_pii_scrub_batch():
    from htmlreader_ray.functions.text import pii_scrub_batch
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["write to bob.smith+x@sub.example.co.uk today",
                 "call +1-555-123-4567 or +44-20-7946-0958 now",
                 "no pii here"]})
    out = pii_scrub_batch(batch)
    assert out.column("clean_text").to_pylist() == [
        "write to <EMAIL> today",
        "call <PHONE> or <PHONE> now",
        "no pii here"]
    assert out.column("n_pii").to_pylist() == [1, 2, 0]
    assert out.column("n_pii").type == pa.int64()


def test_word_repetition_batch():
    from htmlreader_ray.functions.text import word_repetition_batch
    b = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": ["a b a c a", "x y z", "   ", "solo"]})
    out = word_repetition_batch(b)
    assert out.column("doc_id").to_pylist() == [1, 2, 4]
    assert out.column("n_words").to_pylist() == [5, 3, 1]
    assert out.column("dup_word_frac").to_pylist() == [
        1.0 - 3 / 5, 0.0, 0.0]
    assert out.column("top_word_frac").to_pylist() == [3 / 5, 1 / 3, 1.0]


def test_ngram_repetition_batch():
    from htmlreader_ray.functions.text import ngram_repetition_batch
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b a b c", "solo", "x y"]})
    out = ngram_repetition_batch(b)
    # doc1 grams: "a b","b a","a b","b c" -> top "a b" = 2/4
    assert out.column("doc_id").to_pylist() == [1, 3]
    assert out.column("n_grams").to_pylist() == [4, 1]
    assert out.column("top_2gram_frac").to_pylist() == [0.5, 1.0]
    # trigram variant shares the kernel
    out3 = ngram_repetition_batch(b, n=3)
    assert out3.column("doc_id").to_pylist() == [1]
    assert out3.column("n_grams").to_pylist() == [3]


def test_star_path_matches_union_find_on_random_graph(ray_session):
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    uf = _cc(ray_session, edges)
    star = _cc(ray_session, edges, small_graph_limit=0, shuffle_partitions=2)
    assert star == uf


def test_star_path_hub_skew(ray_session):
    # hot-node shape: one hub with many spokes must not blow a round
    edges = [(0, i) for i in range(1, 200)]
    got = _cc(ray_session, edges, small_graph_limit=0, shuffle_partitions=2)
    assert got == sorted((i, 0) for i in range(200))


def test_hll_estimate_accuracy_and_merge(ray_session):
    import ray.data as rd
    from htmlreader_ray.functions.sketch import (hll_estimate,
                                                 hll_registers)
    n = 4000
    t = pa.table({"text": [f"value-{i}" for i in range(n)] + ["dup"] * 200})
    ds = rd.from_arrow(t).repartition(8)  # force multi-block merge
    regs = {r["register"]: r["rho"]
            for r in hll_registers(ds).take_all()}
    est = hll_estimate(regs)
    true = n + 1
    assert abs(est - true) / true < 0.15  # 3 sigma at m=256 is ~20%


def test_hll_partial_batch_shapes():
    from htmlreader_ray.functions.sketch import hll_partial_batch
    t = pa.table({"text": ["a", "b", "a", None]})
    out = hll_partial_batch(t)
    assert out.column("register").type == pa.int64()
    assert out.column("rho").type == pa.int64()
    assert 1 <= out.num_rows <= 3  # at most one row per distinct register
    assert all(1 <= r <= 57 for r in out.column("rho").to_pylist())


def test_count_min_point_queries(ray_session):
    import ray.data as rd
    from htmlreader_ray.functions.sketch import cm_query, cm_sketch
    words = ["alpha"] * 500 + ["beta"] * 120 + [f"rare-{i}" for i in range(300)]
    ds = rd.from_arrow(pa.table({"text": words})).repartition(6)
    cells = {(r["row"], r["col"]): r["n"]
             for r in cm_sketch(ds).take_all()}
    # CM estimates are exact-or-over, never under
    assert cm_query(cells, "alpha") >= 500
    assert cm_query(cells, "beta") >= 120
    assert cm_query(cells, "alpha") <= 500 + 300  # collisions bounded
    assert cm_query(cells, "never-seen") <= 300


def test_bloom_filter_membership(ray_session):
    import ray.data as rd
    from htmlreader_ray.functions.sketch import bloom_bits, bloom_contains
    vals = [f"member-{i}" for i in range(400)]
    ds = rd.from_arrow(pa.table({"text": vals})).repartition(4)
    bits = {r["bit"] for r in bloom_bits(ds).take_all()}
    # no false negatives, ever
    assert all(bloom_contains(bits, v) for v in vals)
    # false-positive rate stays near theory ((1-e^{-kn/m})^k ~ 11% here)
    fp = sum(bloom_contains(bits, f"absent-{i}") for i in range(500)) / 500
    assert fp < 0.3


def test_exact_heavy_hitters(ray_session):
    import collections

    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.sketch import exact_heavy_hitters

    # 3 skewed hot words + a long tail, split across many small docs
    docs = []
    for i in range(60):
        docs.append("hot " * 5 + f"tail{i} cold{i % 7}")
    t = pa.table({"text": pa.array(docs)})
    out = {r["word"]: r["n"] for r in exact_heavy_hitters(
        ray.data.from_arrow(t), k=10).take_all()}
    counts = collections.Counter(
        w for d in docs for w in d.split() if w)
    total = sum(counts.values())
    want = {w: n for w, n in counts.items() if n * 10 > total}
    assert out == want and "hot" in out


def test_exact_heavy_hitters_no_hitters(ray_session):
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.sketch import exact_heavy_hitters

    docs = [f"u{i}" for i in range(500)]  # all unique, none above n/k
    t = pa.table({"text": pa.array(docs)})
    out = exact_heavy_hitters(ray.data.from_arrow(t), k=50).take_all()
    assert out == []
