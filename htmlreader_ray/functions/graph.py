"""Link-graph ranking for web-corpus curation (domain ranking a la the
Common Crawl host-level graph: rank hosts, cap/weight documents by the
rank of their publishing host).

PageRank here is defined in EXACT INTEGER arithmetic so the result is
independent of summation order (floats would diverge in the low bits
between Ray's block-parallel sums and any single-threaded oracle):

    N      = #nodes, scale = total rank mass (default 10^12)
    base   = scale // N
    r0[v]  = base
    per iteration:
      contrib(u->v) = r[u] // outdeg[u]          (distinct out-edges)
      inflow[v]     = sum of contrib over in-edges   (exact int64 sum)
      D             = sum of r[u] where outdeg[u] == 0   (dangling mass)
      r'[v] = (15 * base) // 100 + (85 * (inflow[v] + D // N)) // 100

i.e. damping 0.85 with uniform dangling-mass redistribution, all floor
divisions. Magnitudes: inflow + D//N <= 2*scale, so 85*(...) < 2e14 —
comfortably inside int64. The same expressions are SQL-expressible with
DuckDB's `//` BIGINT floor division, which is what the oracle runs.

Two execution paths, same bit-exact result:

* ``pagerank_local`` — the default once the DISTINCT host-pair edge
  table has been reduced by the distributed combiner: factorize node
  ids, then K rounds of numpy int64 scatter-adds. The corpus-scale work
  (parse, host extraction, (src,dst) distinct-count) happens upstream in
  Ray; the rank vector itself is bounded by #distinct hosts. Guarded by
  ``local_max_edges`` — past it, auto mode switches to the Dataset path.
* ``pagerank_distributed`` — for host graphs too big for one machine
  (the full web is ~10^8 hosts / ~10^9 host-pairs): each iteration is
  one hash join of the rank table onto the edge table keyed by src, a
  block-local combiner + narrow groupby(dst) for the inflow sums, and a
  scalar dangling aggregate. The rank table (one row per node) is
  materialized per iteration — it is the small side; the edge table
  streams and is never collected. Joins are repartitioned first per the
  empty-block scrub (see functions/dedup._scrub_empty_blocks).

Reference scope note: the reference engine (nolanw/HTMLReader) has no
graph stage; this extends the extraction surface (its a[href] walk,
Sources/HTMLNode.m tree enumeration) into the standard curation step
downstream of it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10 ** 12
DAMP_NUM, DAMP_DEN = 85, 100   # 0.85, exact


# ------------------------------------------------------------------ local

def pagerank_local(edges: pa.Table, iters: int = 3,
                   scale: int = SCALE) -> pa.Table:
    """(src, dst) string table -> (node, rank) int64 table.

    Duplicate edges are collapsed (PageRank over the distinct graph).
    """
    src = pc.cast(edges.column("src"), pa.string())
    dst = pc.cast(edges.column("dst"), pa.string())
    if len(src) == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    # factorize over the union of both endpoint columns
    both = pa.chunked_array(
        list(src.chunks) + list(dst.chunks), pa.string())
    nodes = pc.unique(both)
    nodes = nodes.take(pc.sort_indices(nodes))   # deterministic order
    idx = pc.index_in(both, value_set=nodes).to_numpy(
        zero_copy_only=False)
    m = len(src)
    si, di = idx[:m].astype(np.int64), idx[m:].astype(np.int64)
    # distinct edges
    pair = si * len(nodes) + di
    keep = np.unique(pair)
    si, di = keep // len(nodes), keep % len(nodes)

    n = len(nodes)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    base = scale // n
    r = np.full(n, base, dtype=np.int64)
    for _ in range(iters):
        contrib = r[si] // outdeg[si]
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, di, contrib)
        dangling = int(r[outdeg == 0].sum())
        r = ((DAMP_DEN - DAMP_NUM) * base) // DAMP_DEN + (
            DAMP_NUM * (inflow + dangling // n)) // DAMP_DEN
    return pa.Table.from_arrays(
        [nodes, pa.array(r, pa.int64())], names=["node", "rank"])


# ------------------------------------------------------------ distributed

def _scrub(ds, n: int = 4):
    """Repartition before a join: groupby/aggregate outputs can contain
    zero-column empty blocks that poison Acero hash joins (see
    functions/dedup._scrub_empty_blocks / memory: ray-data-pitfalls)."""
    return ds.repartition(n)


def pagerank_distributed(edges, iters: int = 3, scale: int = SCALE,
                         num_partitions: int = 4):
    """Dataset[(src, dst)] -> Dataset[(node, rank)].

    Scale shape: the (node, outdeg) table is built ONCE (one left-outer
    join) and the rank table carries outdeg between iterations, so each
    iteration costs exactly TWO hash joins — per-src contributions onto
    the edge stream, and inflow back onto the node table — plus a
    combiner groupby(dst) and a scalar dangling aggregate. The edge
    table is the only corpus-scale object and it streams; only the rank
    table (|nodes| rows) is materialized between iterations.
    """
    from .shuffle import combine_aggregate

    def _distinct(ds, cols):
        out = combine_aggregate(ds, cols, [("", "count", "_c")])
        return out.select_columns(cols)

    edges = _distinct(edges, ["src", "dst"]).materialize()

    def _endpoints(b: pa.Table, col: str) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column(col).cast(pa.string())], names=["node"])

    nodes = _distinct(
        edges.map_batches(lambda b: _endpoints(b, "src"),
                          batch_format="pyarrow").union(
            edges.map_batches(lambda b: _endpoints(b, "dst"),
                              batch_format="pyarrow")),
        ["node"]).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "rank": pa.array([], pa.int64())}))
    base = scale // n

    deg = combine_aggregate(edges, ["src"], [("", "count", "outdeg")])
    deg = deg.map_batches(
        lambda b: b.set_column(b.column_names.index("outdeg"), "outdeg",
                               pc.cast(b.column("outdeg"), pa.int64())),
        batch_format="pyarrow").materialize()

    # (node, outdeg) built ONCE; outdeg travels with the rank table so
    # no per-iteration re-join against deg is needed (outdeg is null
    # for dangling nodes)
    nd = _scrub(nodes, num_partitions).join(
        _scrub(deg, num_partitions), join_type="left_outer",
        num_partitions=num_partitions, on=("node",), right_on=("src",)
    ).select_columns(["node", "outdeg"]).materialize()
    nd_scrubbed = _scrub(nd, num_partitions).materialize()

    rd = nd.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(len(b), base, np.int64))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        def _dang_part(b: pa.Table) -> pa.Table:
            s = pc.sum(pc.if_else(b.column("outdeg").is_valid(),
                                  pa.scalar(0, pa.int64()),
                                  b.column("rank"))).as_py() or 0
            return pa.Table.from_arrays([pa.array([s], pa.int64())],
                                        names=["d"])

        dangling = int(rd.map_batches(
            _dang_part, batch_format="pyarrow").sum("d") or 0)

        linked = rd.map_batches(
            lambda b: b.filter(b.column("outdeg").is_valid()),
            batch_format="pyarrow")

        def _contrib(b: pa.Table) -> pa.Table:
            c = pc.divide(b.column("rank"), b.column("outdeg"))
            return pa.Table.from_arrays(
                [b.column("node"), pc.cast(c, pa.int64())],
                names=["src", "contrib"])

        per_src = linked.map_batches(_contrib, batch_format="pyarrow")
        flow = _scrub(edges, num_partitions).join(
            _scrub(per_src, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("src",))
        inflow = combine_aggregate(
            flow.select_columns(["dst", "contrib"]), ["dst"],
            [("contrib", "sum", "inflow")])

        carry = base  # captured constants for the closure below
        dn, dd, dang_share = DAMP_NUM, DAMP_DEN, dangling // n

        def _new_rank(b: pa.Table) -> pa.Table:
            inf = pc.fill_null(pc.cast(b.column("inflow"), pa.int64()), 0)
            r = pc.add(
                ((dd - dn) * carry) // dd,
                pc.divide(pc.multiply(pc.add(inf, dang_share), dn), dd))
            return pa.Table.from_arrays(
                [b.column("node"), b.column("outdeg"),
                 pc.cast(r, pa.int64())],
                names=["node", "outdeg", "rank"])

        joined = nd_scrubbed.join(
            _scrub(inflow, num_partitions), join_type="left_outer",
            num_partitions=num_partitions, on=("node",), right_on=("dst",))
        rd = joined.map_batches(
            _new_rank, batch_format="pyarrow").materialize()
    return rd.select_columns(["node", "rank"])


# -------------------------------------------------------------- triangles

def triangle_counts(edges, num_partitions: int = 8):
    """Per-node triangle participation counts over the undirected simple
    graph induced by Dataset[(src, dst)] — the graph-motif primitive
    (host-cluster cohesion, link-farm detection) downstream of the
    co-citation/edge extraction stages.

    Scale shape (every step a Dataset op, nothing driver-side):
      1. normalize to u<v, drop self-loops; DISTINCT via the combiner
         (block-local group_by first, so the shuffle moves distinct
         pairs per block, not raw links);
      2. degree table via one narrow groupby over the endpoint stream;
      3. DEGREE ORIENTATION — re-point every edge from its
         (deg, node)-smaller endpoint to the larger: out-degree is then
         bounded by O(sqrt(m)) [Chiba–Nishizeki], so the wedge fan-out
         of step 4 is O(m^1.5) total and NO group is ever hot, whatever
         the original degree skew (a celebrity node with 10^7 neighbors
         generates zero wedges unless its neighbors are higher-degree
         still — and at most ~sqrt(m) can be);
      4. wedges per oriented source via groupby(src).map_groups
         (group size = oriented out-degree, bounded by step 3);
      5. one hash join of the wedge (x, y) stream back onto the
         distinct-edge table closes the triangles; each match emits its
         three corners and a combiner count per node finishes.
    Triangles are enumerated exactly once (the orientation is acyclic).
    Returns Dataset[(node string, n_triangles int64)], nodes in >=1
    triangle only.
    """
    from .shuffle import combine_aggregate

    def _norm(b: pa.Table) -> pa.Table:
        u0 = pc.cast(b.column("src"), pa.string())
        v0 = pc.cast(b.column("dst"), pa.string())
        lt = pc.less(u0, v0)
        t = pa.Table.from_arrays(
            [pc.if_else(lt, u0, v0), pc.if_else(lt, v0, u0)],
            names=["u", "v"])
        return t.filter(pc.less(t.column("u"), t.column("v"))) \
            .group_by(["u", "v"]).aggregate([])

    und = combine_aggregate(
        edges.map_batches(_norm, batch_format="pyarrow"),
        ["u", "v"], [("", "count", "_c")]
    ).select_columns(["u", "v"]).materialize()

    def _endpoints(b: pa.Table, col: str) -> pa.Table:
        return pa.Table.from_arrays([b.column(col)], names=["node"])

    deg = combine_aggregate(
        und.map_batches(lambda b: _endpoints(b, "u"),
                        batch_format="pyarrow").union(
            und.map_batches(lambda b: _endpoints(b, "v"),
                            batch_format="pyarrow")),
        ["node"], [("", "count", "deg")])
    deg = deg.map_batches(
        lambda b: b.set_column(b.column_names.index("deg"), "deg",
                               pc.cast(b.column("deg"), pa.int64())),
        batch_format="pyarrow").materialize()

    ju = _scrub(und, num_partitions).join(
        _scrub(deg, num_partitions), "inner", num_partitions,
        on=("u",), right_on=("node",))
    ju = ju.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("u"), b.column("v"), b.column("deg")],
            names=["u", "v", "deg_u"]), batch_format="pyarrow")
    jv = _scrub(ju, num_partitions).join(
        _scrub(deg, num_partitions), "inner", num_partitions,
        on=("v",), right_on=("node",))

    def _orient(b: pa.Table) -> pa.Table:
        u, v = b.column("u"), b.column("v")
        du, dv = b.column("deg_u"), b.column("deg")
        fwd = pc.or_(pc.less(du, dv),
                     pc.and_(pc.equal(du, dv), pc.less(u, v)))
        return pa.Table.from_arrays(
            [pc.if_else(fwd, u, v), pc.if_else(fwd, v, u)],
            names=["c", "w"])

    oriented = jv.map_batches(_orient, batch_format="pyarrow")

    def _wedges(group: pa.Table) -> pa.Table:
        k = group.num_rows
        if k < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] * 3,
                names=["x", "y", "center"])
        w = group.column("w").combine_chunks()
        w = w.take(pc.sort_indices(w))
        i, j = np.triu_indices(k, 1)
        return pa.Table.from_arrays(
            [w.take(pa.array(i)), w.take(pa.array(j)),
             group.column("c").slice(0, 1).combine_chunks()
             .take(pa.array(np.zeros(len(i), np.int64)))],
            names=["x", "y", "center"])

    wedges = oriented.groupby("c").map_groups(
        _wedges, batch_format="pyarrow")

    closed = _scrub(wedges, num_partitions).join(
        _scrub(und, num_partitions), "inner", num_partitions,
        on=("x", "y"), right_on=("u", "v"))

    def _corners(b: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [b.column("center").combine_chunks(),
             b.column("x").combine_chunks(),
             b.column("y").combine_chunks()], pa.string())
        return pa.Table.from_arrays([nodes.combine_chunks()],
                                    names=["node"])

    per_node = combine_aggregate(
        closed.map_batches(_corners, batch_format="pyarrow"),
        ["node"], [("", "count", "n_triangles")])
    return per_node.map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_triangles"), "n_triangles",
            pc.cast(b.column("n_triangles"), pa.int64())),
        batch_format="pyarrow")


# ------------------------------------------------------------------ auto

def pagerank(edges, iters: int = 3, scale: int = SCALE,
             mode: str = "auto", local_max_edges: int = 5_000_000):
    """Dataset[(src, dst)] -> Dataset[(node, rank)]; picks the local
    path when the (already combiner-reduced) edge table is bounded."""
    import ray.data

    if mode == "distributed":
        return pagerank_distributed(edges, iters=iters, scale=scale)
    if mode == "local":
        import ray
        parts = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        t = (pa.concat_tables(parts) if parts
             else pa.table({"src": pa.array([], pa.string()),
                            "dst": pa.array([], pa.string())}))
        return ray.data.from_arrow(
            pagerank_local(t, iters=iters, scale=scale))
    cnt = edges.count()
    if cnt <= local_max_edges:
        return pagerank(edges, iters=iters, scale=scale, mode="local")
    return pagerank_distributed(edges, iters=iters, scale=scale)


def label_propagation(edges, rounds: int = 2, num_partitions: int = 4,
                      materialize_rounds: bool = True):
    """Dataset[(src, dst)] -> Dataset[(host, label)] after ``rounds``
    SYNCHRONOUS min-label rounds:

        label_0(v)   = v
        label_t+1(v) = min(label_t(v), min over neighbors label_t(u))

    — the min-propagation view of connected components (the alternating
    large-star/small-star CC in dedup.py converges the same quantity);
    a FIXED round count is pinned so the SQL oracle can unroll the
    recursion join-for-join. Each round costs one hash join (labels
    onto the bidirectional edge stream), one combiner min-groupby, and
    one left-outer join back onto the |nodes|-row label table — the
    edge table streams, only labels materialize between rounds
    (``materialize_rounds=False`` keeps the whole plan lazy so tests
    can pin its shuffle shape)."""
    from .shuffle import combine_aggregate

    def _distinct(ds, cols):
        out = combine_aggregate(ds, cols, [("", "count", "_c")])
        return out.select_columns(cols)

    def _mat(ds):
        return ds.materialize() if materialize_rounds else ds

    und = _distinct(edges, ["src", "dst"])
    bi = _mat(und.union(und.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("dst"), b.column("src")], names=["src", "dst"]),
        batch_format="pyarrow")))

    labels = _distinct(bi.map_batches(
        lambda b: pa.Table.from_arrays([b.column("src")], names=["host"]),
        batch_format="pyarrow"), ["host"]).map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("host"), b.column("host")], names=["host", "label"]),
        batch_format="pyarrow")
    labels = _mat(labels)

    for _ in range(rounds):
        lab_src = labels.map_batches(
            lambda b: b.rename_columns(["src", "label"]),
            batch_format="pyarrow")
        contrib = _scrub(bi, num_partitions).join(
            _scrub(lab_src, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("src",))
        nbr = combine_aggregate(
            contrib.map_batches(
                lambda b: pa.Table.from_arrays(
                    [b.column("dst"), b.column("label")],
                    names=["host", "lbl"]), batch_format="pyarrow"),
            ["host"], [("lbl", "min", "nbr")])

        def _new_label(b: pa.Table) -> pa.Table:
            lab = b.column("label")
            new = pc.min_element_wise(lab, pc.coalesce(b.column("nbr"),
                                                       lab))
            return pa.Table.from_arrays([b.column("host"), new],
                                        names=["host", "label"])

        joined = _scrub(labels, num_partitions).join(
            _scrub(nbr, num_partitions), join_type="left_outer",
            num_partitions=num_partitions, on=("host",))
        labels = _mat(joined.map_batches(
            _new_label, batch_format="pyarrow"))
    return labels


def edge_reciprocity(edges):
    """Reciprocity of a directed graph: the share of distinct directed
    edges (u, v), u != v, whose reverse (v, u) is also present.

    Plan: block-local distinct of (src, dst) inside the combiner, ONE
    canonical-pair exchange keyed on (min(src,dst), max(src,dst)) —
    after the distinct, an unordered pair's group holds exactly 1 or 2
    rows, so n_dir == 2 detects reciprocation without a self-join —
    then a single bounded finalize (one row per pair survives the
    combiner, so the last partition sees |distinct pairs| rows, never
    edges x edges). Returns one row:
    (n_edges, n_recip, recip_e6 = floor(1e6 * n_recip / n_edges)).
    """
    from .shuffle import combine_aggregate

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column("src"), b.column("dst")
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.Table.from_arrays([lo, hi], names=["lo", "hi"])

    dist = combine_aggregate(edges, ["src", "dst"],
                             [("", "count", "__w")])
    pairs = combine_aggregate(
        dist.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [("", "count", "n_dir")])

    def partial(b: pa.Table) -> pa.Table:
        nd = pc.cast(b.column("n_dir"), pa.int64())
        two = pc.cast(pc.equal(nd, 2), pa.int64())
        return pa.Table.from_arrays(
            [pa.array([int(pc.sum(nd).as_py() or 0)], pa.int64()),
             pa.array([2 * int(pc.sum(two).as_py() or 0)], pa.int64())],
            names=["e", "r"])

    def finalize(b: pa.Table) -> pa.Table:
        n_edges = int(pc.sum(b.column("e")).as_py() or 0)
        n_recip = int(pc.sum(b.column("r")).as_py() or 0)
        r = int(np.floor(1e6 * float(n_recip) / float(n_edges))) \
            if n_edges else 0
        return pa.Table.from_arrays(
            [pa.array([n_edges], pa.int64()),
             pa.array([n_recip], pa.int64()),
             pa.array([r], pa.int64())],
            names=["n_edges", "n_recip", "recip_e6"])

    import ray.data
    # zero seed row: guarantees the finalize stage sees >= 1 input row
    # even on an edge-free graph (empty upstreams can otherwise produce
    # an empty output dataset instead of a (0, 0, 0) stats row)
    seed = ray.data.from_arrow(pa.table(
        {"e": pa.array([0], pa.int64()), "r": pa.array([0], pa.int64())}))
    return seed.union(pairs.map_batches(partial, batch_format="pyarrow")) \
        .repartition(1).map_batches(finalize, batch_format="pyarrow")


def hits_local(edges: pa.Table, iters: int = 2,
               local_max_edges: int = 5_000_000) -> pa.Table:
    """Unnormalized HITS hub/authority scores after ``iters``
    alternating rounds — a_k(v) = Σ_{u→v} h_{k-1}(u), then
    h_k(u) = Σ_{u→v} a_k(v), starting h_0 = 1 — over the DISTINCT
    (src, dst) graph. Unnormalized scores are exact path-count
    integers, so the result is summation-order independent and the
    oracle unrolls the same rounds in SQL (the pagerank_local
    discipline; magnitudes grow by ≤ max_outdeg·max_indeg per round —
    int64-safe for iters=2 up to ~10^4 degrees). Like pagerank_local
    this runs on the combiner-reduced edge table; past
    ``local_max_edges`` compose the same rounds as join +
    groupby-sum per iteration (the pagerank_distributed shape)."""
    src = pc.cast(edges.column("src"), pa.string())
    dst = pc.cast(edges.column("dst"), pa.string())
    if len(src) == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "hub": pa.array([], pa.int64()),
                         "auth": pa.array([], pa.int64())})
    if len(src) > local_max_edges:
        raise ValueError(
            "hits_local is the bounded-edge-table path; past "
            "local_max_edges call hits_distributed (or the hits() "
            "dispatcher) for the per-iteration join+groupby rounds")
    both = pa.chunked_array(
        list(src.chunks) + list(dst.chunks), pa.string())
    nodes = pc.unique(both)
    nodes = nodes.take(pc.sort_indices(nodes))
    idx = pc.index_in(both, value_set=nodes).to_numpy(
        zero_copy_only=False)
    m = len(src)
    si, di = idx[:m].astype(np.int64), idx[m:].astype(np.int64)
    pair = si * len(nodes) + di
    keep = np.unique(pair)
    si, di = keep // len(nodes), keep % len(nodes)
    n = len(nodes)
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = np.bincount(di, weights=h[si], minlength=n).astype(np.int64)
        h = np.bincount(si, weights=a[di], minlength=n).astype(np.int64)
    return pa.table({"node": nodes,
                     "hub": pa.array(h),
                     "auth": pa.array(a)})


def hits_distributed(edges, iters: int = 2, num_partitions: int = 4):
    """Dataset[(src, dst)] -> Dataset[(node, hub, auth)] — the
    join-per-iteration composition of the same exact-integer HITS
    rounds as ``hits_local`` (bit-parity pinned in
    tests/test_graph.py), for host graphs past ``local_max_edges``.

    Scale shape (the ``pagerank_distributed`` discipline): the edge
    table is reduced to DISTINCT (src, dst) once by the block-local
    combiner, then each iteration costs two hash joins + two narrow
    combiner groupby-sums —

        auth round: hub scores joined onto edges by src,
                    groupby(dst) sum -> auth inflow;
        hub round:  auth scores joined onto edges by dst,
                    groupby(src) sum -> hub inflow

    — and one left-outer join back onto the |nodes|-row score table to
    fill zeros for sink/source nodes. Only the (node, hub, auth) table
    (|nodes| rows) materializes between iterations; the edge table
    streams through every join. All sums are int64 path counts, so the
    result is summation-order independent and byte-identical to the
    numpy scatter-add path regardless of block layout.
    """
    import ray.data

    from .shuffle import combine_aggregate

    def _distinct(ds, cols):
        out = combine_aggregate(ds, cols, [("", "count", "_c")])
        return out.select_columns(cols)

    edges = _distinct(edges, ["src", "dst"]).map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.cast(b.column("src"), pa.string()),
             pc.cast(b.column("dst"), pa.string())],
            names=["src", "dst"]),
        batch_format="pyarrow").materialize()

    def _endpoints(b: pa.Table, col: str) -> pa.Table:
        return pa.Table.from_arrays([b.column(col)], names=["node"])

    nodes = _distinct(
        edges.map_batches(lambda b: _endpoints(b, "src"),
                          batch_format="pyarrow").union(
            edges.map_batches(lambda b: _endpoints(b, "dst"),
                              batch_format="pyarrow")),
        ["node"]).materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "hub": pa.array([], pa.int64()),
                      "auth": pa.array([], pa.int64())}))

    nodes_scrubbed = _scrub(nodes, num_partitions).materialize()

    scores = nodes.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"),
             pa.array(np.ones(len(b), np.int64)),
             pa.array(np.zeros(len(b), np.int64))],
            names=["node", "hub", "auth"]),
        batch_format="pyarrow").materialize()

    def _half_round(scores, src_col: str, dst_col: str,
                    carry_col: str, out_col: str):
        """One alternating half-round: sum ``carry_col`` over edges
        grouped by ``dst_col`` (edges keyed on ``src_col``)."""
        side = scores.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("node"), b.column(carry_col)],
                names=[src_col, "__s"]),
            batch_format="pyarrow")
        flow = _scrub(edges, num_partitions).join(
            _scrub(side, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=(src_col,))
        inflow = combine_aggregate(
            flow.select_columns([dst_col, "__s"]), [dst_col],
            [("__s", "sum", "__inflow")])
        joined = nodes_scrubbed.join(
            _scrub(inflow, num_partitions), join_type="left_outer",
            num_partitions=num_partitions, on=("node",),
            right_on=(dst_col,))
        return joined.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("node"),
                 pc.fill_null(pc.cast(b.column("__inflow"), pa.int64()),
                              0)],
                names=["node", out_col]),
            batch_format="pyarrow")

    for _ in range(iters):
        # a_k(v) = sum over u->v of h_{k-1}(u); the |nodes|-row score
        # table materializes between half-rounds (it is consumed twice:
        # as the next half-round's input and in the final zip join) —
        # the edge table itself never does
        auth = _half_round(scores, "src", "dst", "hub",
                           "auth").materialize()
        # h_k(u) = sum over u->v of a_k(v)
        hub = _half_round(auth, "dst", "src", "auth",
                          "hub").materialize()
        scores = _scrub(hub, num_partitions).join(
            _scrub(auth, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("node",)
        ).select_columns(["node", "hub", "auth"]).materialize()
    return scores


def hits(edges, iters: int = 2, mode: str = "auto",
         local_max_edges: int = 5_000_000, num_partitions: int = 4):
    """Dataset[(src, dst)] -> Dataset[(node, hub, auth)]; picks the
    numpy scatter-add path while the (combiner-reduced) distinct edge
    table is bounded, else the join-per-iteration Dataset path — the
    same auto dispatch (and the same bit-exact result either way) as
    ``pagerank``."""
    import ray
    import ray.data

    if mode == "distributed":
        return hits_distributed(edges, iters=iters,
                                num_partitions=num_partitions)
    if mode == "local":
        parts = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        t = (pa.concat_tables(parts) if parts
             else pa.table({"src": pa.array([], pa.string()),
                            "dst": pa.array([], pa.string())}))
        return ray.data.from_arrow(
            hits_local(t, iters=iters,
                       local_max_edges=max(local_max_edges, t.num_rows)))
    cnt = edges.count()
    if cnt <= local_max_edges:
        return hits(edges, iters=iters, mode="local",
                    local_max_edges=local_max_edges)
    return hits_distributed(edges, iters=iters,
                            num_partitions=num_partitions)
