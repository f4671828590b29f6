"""PageRank (functions/graph.py): exact-integer contract, local vs
distributed bit-parity, and the host-graph query plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from htmlreader_ray.functions.graph import (SCALE, pagerank,
                                            pagerank_distributed,
                                            pagerank_local)


def _ref_pagerank(pairs, iters=3, scale=SCALE):
    """Independent pure-python model of the documented contract."""
    edges = sorted(set(pairs))
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    out = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    base = scale // n
    r = {u: base for u in nodes}
    for _ in range(iters):
        inflow = {u: 0 for u in nodes}
        for s, d in edges:
            inflow[d] += r[s] // out[s]
        dang = sum(r[u] for u in nodes if out[u] == 0)
        r = {u: (15 * base) // 100 + (85 * (inflow[u] + dang // n)) // 100
             for u in nodes}
    return r


PAIRS = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("c", "b"), ("c", "d"), ("a", "b")]   # one duplicate edge


def test_local_matches_reference_model():
    t = pagerank_local(pa.table({"src": [s for s, _ in PAIRS],
                                 "dst": [d for _, d in PAIRS]}), iters=3)
    got = dict(zip(t.column("node").to_pylist(),
                   t.column("rank").to_pylist()))
    assert got == _ref_pagerank(PAIRS)


def test_local_mass_is_conserved_and_int64():
    rng = np.random.default_rng(7)
    src = [f"n{i}" for i in rng.integers(0, 50, 400)]
    dst = [f"n{i}" for i in rng.integers(0, 50, 400)]
    t = pagerank_local(pa.table({"src": src, "dst": dst}), iters=4)
    assert t.column("rank").type == pa.int64()
    total = sum(t.column("rank").to_pylist())
    # floor divisions only ever LOSE mass; never create it
    assert 0.95 * SCALE < total <= SCALE


def test_local_empty_graph():
    t = pagerank_local(pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string())}))
    assert t.num_rows == 0


def test_distributed_bit_parity_with_local(ray_session):
    import ray.data
    edges = ray.data.from_arrow(
        pa.table({"src": [s for s, _ in PAIRS],
                  "dst": [d for _, d in PAIRS]})).repartition(3)
    dist = pagerank_distributed(edges, iters=3).take_all()
    got = {r["node"]: r["rank"] for r in dist}
    assert got == _ref_pagerank(PAIRS)


def test_distributed_bit_parity_random_graph(ray_session):
    import ray.data
    rng = np.random.default_rng(11)
    pairs = [(f"h{i}", f"h{j}")
             for i, j in zip(rng.integers(0, 40, 300),
                             rng.integers(0, 40, 300))]
    edges = ray.data.from_arrow(
        pa.table({"src": [s for s, _ in pairs],
                  "dst": [d for _, d in pairs]})).repartition(5)
    dist = pagerank_distributed(edges, iters=2).take_all()
    got = {r["node"]: r["rank"] for r in dist}
    assert got == _ref_pagerank(pairs, iters=2)


def test_auto_mode_picks_local_for_small(ray_session):
    import ray.data
    edges = ray.data.from_arrow(
        pa.table({"src": [s for s, _ in PAIRS],
                  "dst": [d for _, d in PAIRS]}))
    t = pagerank(edges, iters=3, mode="auto")
    got = {r["node"]: r["rank"] for r in t.take_all()}
    assert got == _ref_pagerank(PAIRS)


def test_host_edges_kernel():
    from htmlreader_ray.pipelines import queries as q
    b = pa.table({"doc_id": pa.array([5], pa.int64()),
                  "source": pa.array(["src5"], pa.string()),
                  "text": pa.array(["hello world"], pa.string())})
    out = q.HostEdges()(b)
    # doc 5: j in 0..(5%3)=0..2 -> hosts h{(35+j)%10} = h5,h6,h7;
    # boilerplate links are relative (host='') and must be filtered
    assert out.column("src").to_pylist() == ["src5"] * 3
    assert sorted(out.column("dst").to_pylist()) == [
        "h5.example.com", "h6.example.com", "h7.example.com"]


def test_distributed_empty_graph(ray_session):
    import ray.data
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()),
                  "dst": pa.array([], pa.string())}))
    assert pagerank_distributed(edges).count() == 0


def _tri_dict(ds):
    return {r["node"]: r["n_triangles"] for r in ds.take_all()}


def test_triangle_counts_k4(ray_session):
    """K4: every vertex sits in C(3,2)=3 triangles; duplicate and
    reversed edges collapse."""
    import itertools

    import ray.data
    from htmlreader_ray.functions.graph import triangle_counts
    nodes = ["a", "b", "c", "d"]
    pairs = list(itertools.combinations(nodes, 2))
    # duplicates + reversed orientation + a self loop
    src = [u for u, _ in pairs] + [v for _, v in pairs] + ["a"]
    dst = [v for _, v in pairs] + [u for u, _ in pairs] + ["a"]
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    assert _tri_dict(triangle_counts(edges)) == {
        "a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_bipartite_empty(ray_session):
    """A bipartite graph has no triangles -> empty result."""
    import ray.data
    from htmlreader_ray.functions.graph import triangle_counts
    edges = ray.data.from_arrow(pa.table(
        {"src": ["l1", "l1", "l2", "l2"],
         "dst": ["r1", "r2", "r1", "r2"]}))
    assert triangle_counts(edges).count() == 0


def test_triangle_counts_star_plus_rim(ray_session):
    """Hub with a rim edge: exactly one triangle; hub degree skew does
    not inflate wedge fan-out (degree orientation points rim->hub)."""
    import ray.data
    from htmlreader_ray.functions.graph import triangle_counts
    rim = [f"r{i}" for i in range(20)]
    src = ["hub"] * 20 + ["r0"]
    dst = rim + ["r1"]
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    assert _tri_dict(triangle_counts(edges)) == {
        "hub": 1, "r0": 1, "r1": 1}


def test_label_propagation_two_components(ray_session):
    import pyarrow as pa
    import ray.data

    from htmlreader_ray.functions.graph import label_propagation

    # component 1: a-b-c chain; component 2: x-y; isolated nodes absent
    edges = pa.table({
        "src": pa.array(["b", "c", "y"], pa.string()),
        "dst": pa.array(["a", "b", "x"], pa.string()),
    })
    out = {r["host"]: r["label"] for r in label_propagation(
        ray.data.from_arrow(edges), rounds=2).take_all()}
    # two rounds reach distance-2 minima
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_label_propagation_one_round_partial(ray_session):
    import pyarrow as pa
    import ray.data

    from htmlreader_ray.functions.graph import label_propagation

    # path a-b-c-d: after ONE synchronous round d only sees c
    edges = pa.table({
        "src": pa.array(["a", "b", "c"], pa.string()),
        "dst": pa.array(["b", "c", "d"], pa.string()),
    })
    out = {r["host"]: r["label"] for r in label_propagation(
        ray.data.from_arrow(edges), rounds=1).take_all()}
    assert out == {"a": "a", "b": "a", "c": "b", "d": "c"}


def test_edge_reciprocity_mixed(ray_session):
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.graph import edge_reciprocity

    # a<->b reciprocated; a->c, c->d one-way; duplicates and self-loops
    # must not count
    src = ["a", "b", "a", "c", "a", "x"]
    dst = ["b", "a", "c", "d", "b", "x"]
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    out = edge_reciprocity(ray.data.from_arrow(t)).take_all()
    assert len(out) == 1
    r = out[0]
    # distinct directed edges: a->b, b->a, a->c, c->d  (4)
    assert r["n_edges"] == 4
    assert r["n_recip"] == 2
    assert r["recip_e6"] == 500000


def test_edge_reciprocity_empty(ray_session):
    import pyarrow as pa
    import ray.data
    from htmlreader_ray.functions.graph import edge_reciprocity

    t = pa.table({"src": pa.array(["x"]), "dst": pa.array(["x"])})
    out = edge_reciprocity(ray.data.from_arrow(t)).take_all()
    assert out[0]["n_edges"] == 0 and out[0]["recip_e6"] == 0


def test_hits_local_two_rounds_exact():
    import pyarrow as pa

    from htmlreader_ray.functions.graph import hits_local

    # a->x, a->y, b->x (duplicate edge collapses)
    edges = pa.table({"src": ["a", "a", "b", "b"],
                      "dst": ["x", "y", "x", "x"]})
    out = {r["node"]: r for r in hits_local(edges, iters=2).to_pylist()}
    # round 1: a(x)=2, a(y)=1; h(a)=3, h(b)=2
    # round 2: a(x)=h(a)+h(b)=5, a(y)=h(a)=3; h(a)=8, h(b)=5
    assert out["a"] == {"node": "a", "hub": 8, "auth": 0}
    assert out["b"] == {"node": "b", "hub": 5, "auth": 0}
    assert out["x"] == {"node": "x", "hub": 0, "auth": 5}
    assert out["y"] == {"node": "y", "hub": 0, "auth": 3}


def test_hits_local_empty_and_guard():
    import pyarrow as pa
    import pytest as _pytest

    from htmlreader_ray.functions.graph import hits_local

    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
    assert hits_local(empty).num_rows == 0
    big = pa.table({"src": ["a", "b"], "dst": ["b", "a"]})
    with _pytest.raises(ValueError):
        hits_local(big, local_max_edges=1)


def test_hits_distributed_bit_parity_with_local(ray_session):
    import ray.data

    from htmlreader_ray.functions.graph import (hits_distributed,
                                                hits_local)

    rng = np.random.default_rng(7)
    pairs = [(f"h{i}", f"h{j}")
             for i, j in zip(rng.integers(0, 30, 200),
                             rng.integers(0, 30, 200))]
    t = pa.table({"src": [s for s, _ in pairs],
                  "dst": [d for _, d in pairs]})
    edges = ray.data.from_arrow(t).repartition(5)
    dist = {r["node"]: (r["hub"], r["auth"])
            for r in hits_distributed(edges, iters=2).take_all()}
    loc = {r["node"]: (r["hub"], r["auth"])
           for r in hits_local(t, iters=2).to_pylist()}
    assert dist == loc


def test_hits_distributed_self_loop_and_sink(ray_session):
    import ray.data

    from htmlreader_ray.functions.graph import (hits_distributed,
                                                hits_local)

    # self-loop on a, sink y, source-only b
    t = pa.table({"src": ["a", "a", "b"], "dst": ["a", "y", "y"]})
    edges = ray.data.from_arrow(t).repartition(2)
    dist = {r["node"]: (r["hub"], r["auth"])
            for r in hits_distributed(edges, iters=2).take_all()}
    loc = {r["node"]: (r["hub"], r["auth"])
           for r in hits_local(t, iters=2).to_pylist()}
    assert dist == loc


def test_hits_distributed_empty(ray_session):
    import ray.data

    from htmlreader_ray.functions.graph import hits_distributed

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()),
                  "dst": pa.array([], pa.string())}))
    assert hits_distributed(edges).count() == 0


def test_hits_auto_dispatch(ray_session):
    import ray.data

    from htmlreader_ray.functions.graph import hits, hits_local

    t = pa.table({"src": ["a", "a", "b"], "dst": ["x", "y", "x"]})
    edges = ray.data.from_arrow(t)
    loc = {r["node"]: (r["hub"], r["auth"])
           for r in hits_local(t, iters=2).to_pylist()}
    for mode in ("auto", "local", "distributed"):
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits(edges, iters=2, mode=mode).take_all()}
        assert got == loc, mode
    # auto past the edge bound routes to the distributed path
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(edges, iters=2, mode="auto",
                         local_max_edges=1).take_all()}
    assert got == loc
