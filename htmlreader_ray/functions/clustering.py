"""Embedding-space statistics and clustering primitives.

Training-data curation needs a handful of dense-linear-algebra passes the
reference never had (it is an HTML engine), but that a 100 TB pipeline runs
constantly: covariance/PCA prep over an embedding column, k-means assignment
for SemDeDup-style cluster-then-dedup, and the Lloyd's centroid-update step.
All three are expressed as single-pass combiner aggregations — the shuffle
moves O(d^2) or O(k*d) partial rows per block, never an embedding row.

Exactness contract (so a DuckDB oracle can replay bit-for-bit):
- components quantize as q = floor(1000 * double(x) + 0.5) (int64); parquet
  float32 -> double casts are exact, multiply/floor are IEEE;
- all sums/products are exact int64 (|q| <= ~1000, d <= 64, so per-corpus
  sums stay far below 2^53 even at 10^9 rows — the doubles that finalize
  the statistics convert exactly);
- every float expression in a finalizer is mirrored operation-for-operation
  in the SQL oracle, so IEEE determinism gives equality.

Scale notes:
- `embedding_covariance`: per-block Q^T Q partials (numpy int64 matmul),
  one tiny groupby((i,j)) — no all-to-all of rows. O(d^2) output.
- `kmeans_assign`: centroids are a broadcast small side (ray.put once);
  the distance kernel is one int64 matmul per batch. No shuffle at all.
- `kmeans_step`: assignment fused with per-block per-cluster sums; the
  exchange carries k*(d+1) rows per block. Empty clusters are omitted
  (both sides of the oracle agree by construction).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

Q_SCALE = 1000


def quantize_matrix(col, dims: int | None = None) -> np.ndarray:
    """list<float> column -> (n, d) int64 matrix of floor(1000*x + 0.5)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n == 0:
        return np.zeros((0, dims or 0), dtype=np.int64)
    d = len(flat) // n
    q = np.floor(Q_SCALE * flat + 0.5).astype(np.int64).reshape(n, d)
    return q[:, :dims] if dims is not None else q


# ------------------------------------------------------- covariance

def embedding_covariance(ds, *, dims: int = 16,
                         embedding_col: str = "embedding"):
    """(i, j, cov_e9): the dims x dims covariance matrix of the quantized
    embedding components, cov_e9 = floor(1e9 * cov(x_i, x_j) + 0.5) in the
    exact-int contract above. 1-based indices (matching SQL
    generate_subscripts)."""
    from .shuffle import combine_aggregate

    def partials(batch: pa.Table) -> pa.Table:
        q = quantize_matrix(batch.column(embedding_col), dims)
        n, d = q.shape
        sxy = q.T @ q                      # exact int64
        sx = q.sum(axis=0, dtype=np.int64)
        ii, jj = np.indices((d, d))
        i_out = np.concatenate(([0], np.arange(1, d + 1),
                                (ii + 1).ravel())).astype(np.int64)
        j_out = np.concatenate(([0], np.zeros(d, np.int64),
                                (jj + 1).ravel()))
        s_out = np.concatenate(([n], sx, sxy.ravel())).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(i_out), pa.array(j_out), pa.array(s_out)],
            names=["i", "j", "s"])

    parts = ds.map_batches(partials, batch_format="pyarrow")
    small = combine_aggregate(parts, ["i", "j"], [("s", "sum", "s")])

    def finalize(batch: pa.Table) -> pa.Table:
        rows = {(i, j): s for i, j, s in zip(
            batch.column("i").to_pylist(), batch.column("j").to_pylist(),
            batch.column("s").to_pylist())}
        n = float(rows.get((0, 0), 0))
        out_i, out_j, out_c = [], [], []
        for (i, j), sxy in sorted(rows.items()):
            if i == 0 or j == 0:
                continue
            # mirrored verbatim by the SQL oracle: all doubles, same order
            cov = (float(sxy) / n
                   - (float(rows[(i, 0)]) / n) * (float(rows[(j, 0)]) / n))
            out_i.append(i)
            out_j.append(j)
            out_c.append(math.floor(1000.0 * cov + 0.5))
        return pa.Table.from_arrays(
            [pa.array(out_i, pa.int64()), pa.array(out_j, pa.int64()),
             pa.array(out_c, pa.int64())],
            names=["i", "j", "cov_e9"])

    return small.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                            batch_size=None)


# ----------------------------------------------------------- k-means

def load_centroids(sf_dir: str, k: int,
                   embedding_col: str = "embedding"):
    """First-k-by-vec_id centroids (the deterministic seeding both the
    distributed path and the SQL oracle use). Bounded small-side read."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", embedding_col],
                      filters=[("vec_id", "<", k)])
    t = t.sort_by("vec_id")
    cids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = quantize_matrix(t.column(embedding_col))
    return cids, c


def _assign_block(q: np.ndarray, cids: np.ndarray, c: np.ndarray):
    """argmin_j sum_d (q - c_j)^2 in exact int64; ties -> lowest centroid id
    (centroids sorted by id, np.argmin takes the first minimum)."""
    qq = np.einsum("nd,nd->n", q, q)
    cc = np.einsum("kd,kd->k", c, c)
    d2 = qq[:, None] + cc[None, :] - 2 * (q @ c.T)
    best = np.argmin(d2, axis=1)
    return cids[best], d2[np.arange(len(q)), best]


def kmeans_assign(ds, cids: np.ndarray, c: np.ndarray, *,
                  id_col: str = "vec_id", embedding_col: str = "embedding"):
    """(vec_id, cluster, dist_q): nearest centroid under exact integer
    squared L2 on quantized components. Centroids broadcast once."""
    import ray

    ref = ray.put((cids, c))

    def assign(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cids_, c_ = ray.get(_ref)
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array([], pa.int64()),
                 pa.array([], pa.int64())],
                names=[id_col, "cluster", "dist_q"])
        q = quantize_matrix(batch.column(embedding_col))
        cluster, dist = _assign_block(q, cids_, c_)
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(cluster, pa.int64()),
             pa.array(dist.astype(np.int64))],
            names=[id_col, "cluster", "dist_q"])

    return ds.map_batches(assign, batch_format="pyarrow")


def pq_encode(ds, cids: np.ndarray, c: np.ndarray, *, m: int = 4,
              id_col: str = "vec_id", embedding_col: str = "embedding"):
    """Product-quantization encoding — the vector-compression path a
    billion-vector ANN index runs (Jégou et al., TPAMI 2011): split the
    d dims into ``m`` contiguous subspaces, assign each sub-vector to
    its nearest codebook entry under exact integer squared L2 (same
    quantization + first-k-seeding contract as kmeans_assign), and emit
    the code word plus the total reconstruction distance.

    Returns (vec_id, code string "c0,...,c{m-1}", dist_q int64). The
    codebook is ray.put once; one int64 matmul per (batch, subspace);
    zero shuffles — a 64-dim float32 corpus compresses ~64x into codes
    that downstream ADC scans read instead of the vectors."""
    import ray

    import pyarrow.compute as pc

    d = c.shape[1]
    assert d % m == 0, (d, m)
    sub = d // m
    ref = ray.put((cids, c))

    def encode(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cids_, c_ = ray.get(_ref)
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                names=[id_col, "code", "dist_q"])
        q = quantize_matrix(batch.column(embedding_col))
        total = np.zeros(len(q), np.int64)
        str_cols = []
        for s in range(m):
            qs = q[:, s * sub:(s + 1) * sub]
            cs = c_[:, s * sub:(s + 1) * sub]
            best, dist = _assign_block(qs, cids_, cs)
            total += dist.astype(np.int64)
            str_cols.append(pc.cast(pa.array(best, pa.int64()),
                                    pa.string()))
        code = pc.binary_join_element_wise(*str_cols, ",")
        return pa.Table.from_arrays(
            [batch.column(id_col), code,
             pa.array(total, pa.int64())],
            names=[id_col, "code", "dist_q"])

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_adc_topk(ds, cids: np.ndarray, c: np.ndarray,
                query_q: np.ndarray, *, m: int = 4, k: int = 10,
                id_col: str = "vec_id",
                embedding_col: str = "embedding"):
    """Asymmetric-distance (ADC) top-k scan in the PQ compressed domain:
    the query's per-subspace distance to every codebook entry is a tiny
    LUT computed ONCE on the driver (m x k_codebook exact int64 cells);
    each corpus vector's approximate distance is then m LUT lookups on
    its code — never a d-dim arithmetic op per vector. Here the codes
    are derived inline (single pass over the vectors); a stored-code
    corpus would run the same kernel over the code column alone and
    never touch the raw vectors.

    Plan: stateless map emits block-local head-k partials (<= k rows per
    block), one repartition(1) merge — the ann.brute_force_topk shape.
    Returns (vec_id, adc_dist, rank), rank 1..k by (dist, vec_id)."""
    import ray

    d = c.shape[1]
    assert d % m == 0, (d, m)
    sub = d // m
    # LUT: lut[s, j] = ||query_sub_s - c_j_sub_s||^2, exact int64
    lut = np.zeros((m, len(cids)), np.int64)
    for s in range(m):
        diff = query_q[s * sub:(s + 1) * sub][None, :] \
            - c[:, s * sub:(s + 1) * sub]
        lut[s] = np.einsum("kd,kd->k", diff, diff)
    ref = ray.put((cids, c, lut))

    def scan(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cids_, c_, lut_ = ray.get(_ref)
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array([], pa.int64())],
                names=[id_col, "adc_dist"])
        q = quantize_matrix(batch.column(embedding_col))
        dist = np.zeros(len(q), np.int64)
        # positional codes (centroids arrive sorted by id, so positional
        # argmin tie-breaking == lowest-cid tie-breaking)
        pos = np.arange(len(c_), dtype=np.int64)
        for s in range(m):
            qs = q[:, s * sub:(s + 1) * sub]
            cs = c_[:, s * sub:(s + 1) * sub]
            best, _ = _assign_block(qs, pos, cs)
            dist += lut_[s][best]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dist))[:k]
        order = np.sort(order)
        return pa.Table.from_arrays(
            [batch.column(id_col).take(pa.array(order)),
             pa.array(dist[order], pa.int64())],
            names=[id_col, "adc_dist"])

    def merge(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        dist = batch.column("adc_dist").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dist))[:k]
        rank = np.arange(1, len(order) + 1, dtype=np.int64)
        return pa.Table.from_arrays(
            [batch.column(id_col).take(pa.array(order)),
             batch.column("adc_dist").take(pa.array(order)),
             pa.array(rank)],
            names=[id_col, "adc_dist", "rank"])

    local = ds.map_batches(scan, batch_format="pyarrow")
    return local.repartition(1).map_batches(merge,
                                            batch_format="pyarrow")


def kmeans_step(ds, cids: np.ndarray, c: np.ndarray, *,
                embedding_col: str = "embedding"):
    """One Lloyd's update: assign each row, then per-cluster per-dim
    integer means, centroid_q = floor(sum_q / count). Output
    (cluster, dim, centroid_q), dim 1-based; empty clusters omitted."""
    import ray

    from .shuffle import combine_aggregate

    ref = ray.put((cids, c))
    k, d = c.shape

    def partials(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cids_, c_ = ray.get(_ref)
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3, names=["cluster", "dim", "s"])
        q = quantize_matrix(batch.column(embedding_col))
        cluster, _ = _assign_block(q, cids_, c_)
        # cluster ids -> dense 0..k-1 positions for the accumulators
        pos = np.searchsorted(cids_, cluster)
        sums = np.zeros((len(cids_), q.shape[1]), dtype=np.int64)
        np.add.at(sums, pos, q)
        counts = np.bincount(pos, minlength=len(cids_)).astype(np.int64)
        live = counts > 0
        kk = int(live.sum())
        dd = q.shape[1]
        cl = np.repeat(cids_[live], dd + 1)
        dim = np.tile(np.arange(0, dd + 1, dtype=np.int64), kk)
        s = np.concatenate(
            [np.concatenate(([counts[i]], sums[i]))
             for i in np.flatnonzero(live)]) if kk else np.zeros(0, np.int64)
        return pa.Table.from_arrays(
            [pa.array(cl, pa.int64()), pa.array(dim), pa.array(s)],
            names=["cluster", "dim", "s"])

    parts = ds.map_batches(partials, batch_format="pyarrow")
    small = combine_aggregate(parts, ["cluster", "dim"], [("s", "sum", "s")])

    def finalize(batch: pa.Table) -> pa.Table:
        rows = {(cl, dm): s for cl, dm, s in zip(
            batch.column("cluster").to_pylist(),
            batch.column("dim").to_pylist(), batch.column("s").to_pylist())}
        out_c, out_d, out_q = [], [], []
        for (cl, dm), s in sorted(rows.items()):
            if dm == 0:
                continue
            cnt = rows[(cl, 0)]
            # SQL mirror: CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT)
            out_c.append(cl)
            out_d.append(dm)
            out_q.append(math.floor(float(s) / float(cnt)))
        return pa.Table.from_arrays(
            [pa.array(out_c, pa.int64()), pa.array(out_d, pa.int64()),
             pa.array(out_q, pa.int64())],
            names=["cluster", "dim", "centroid_q"])

    return small.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                            batch_size=None)


# ---------------------------------------------------------- SemDeDup

def semdedup_prune(ds, cids: np.ndarray, c: np.ndarray, *,
                   tau_num: int = 2, tau_den: int = 5,
                   id_col: str = "vec_id",
                   embedding_col: str = "embedding",
                   block_rows: int = 2048):
    """SemDeDup-style within-cluster semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): assign each embedding to its nearest centroid
    (exact integer squared L2, same kernel as ``kmeans_assign``), then
    inside each cluster mark a row PRUNED when some LOWER-id row of the
    same cluster has cosine similarity >= tau with it. Output one row per
    input: (vec_id, cluster, keep) with keep in {0, 1}.

    Exactness contract (tau = tau_num / tau_den, a small rational):
        cos(u, v) >= tau  <=>  dot > 0  AND
        tau_den^2 * dot^2 >= tau_num^2 * qq_u * qq_v
    on the quantized int64 components (q = floor(1000*x + 0.5)). With
    d <= 64, |q| <= ~1000 and tau_den <= 20 every product stays below
    2^63, so the DuckDB oracle replays the comparison bit-for-bit.

    Deviation from the paper, on purpose: the representative kept per
    duplicate neighborhood is the LOWEST vec_id (the paper keeps the row
    farthest from the centroid) — keep-lowest-id is deterministic under
    any partitioning and is a plain EXISTS self-join in SQL. Note the
    rule is EXISTS-against-any-lower-id, not connected-components: u can
    prune v even when u is itself pruned.

    Scale shape: centroids are a broadcast small side; the ONLY shuffle
    keys on `cluster`, and a cluster's population is corpus_size/k by
    construction (at 10^9 rows one runs k ~ 10^5, so a group holds ~10^4
    quantized rows). Inside a group the Gram work is row-blocked
    (B x prefix), so peak memory is O(B * g) int64, never the full g x g
    matrix."""
    import ray

    ref = ray.put((cids, c))
    t2n = tau_num * tau_num
    t2d = tau_den * tau_den

    def assign(batch: pa.Table, *, _ref=ref) -> pa.Table:
        cids_, c_ = ray.get(_ref)
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.int64()))],
                names=[id_col, "cluster", "qv"])
        q = quantize_matrix(batch.column(embedding_col))
        cluster, _ = _assign_block(q, cids_, c_)
        offs = np.arange(0, (len(q) + 1) * q.shape[1], q.shape[1],
                         dtype=np.int64)
        qv = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                      pa.array(q.ravel(), pa.int64()))
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(cluster, pa.int64()), qv],
            names=[id_col, "cluster", "qv"])

    def prune_group(group: pa.Table) -> pa.Table:
        if len(group) == 0 or id_col not in group.column_names:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3,
                names=[id_col, "cluster", "keep"])
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order].astype(np.int64)
        qcol = group.column("qv").combine_chunks()
        flat = qcol.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = flat.reshape(len(group), len(flat) // len(group))[order]
        qq = np.einsum("nd,nd->n", q, q)
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        blk = block_rows
        for s in range(1, n, blk):
            e = min(s + blk, n)
            dots = q[s:e] @ q[:e].T                      # exact int64
            cond = (dots > 0) & (t2d * dots * dots
                                 >= t2n * qq[s:e, None] * qq[None, :e])
            lower = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            keep[s:e] = ~np.any(cond & lower, axis=1)
        cl = group.column("cluster").to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(cl),
             pa.array(keep.astype(np.int64))],
            names=[id_col, "cluster", "keep"])

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(
        prune_group, batch_format="pyarrow")


# ------------------------------------------------- PCA power iteration

def pca_power(ds, *, dims: int = 16, iters: int = 3,
              embedding_col: str = "embedding"):
    """Dominant right-singular direction of the quantized embedding
    matrix by power iteration (the PCA/whitening prep a curation
    pipeline runs before embedding compression), exact enough for a SQL
    oracle to replay bit-for-bit.

    Iteration k (v_0 = [1000]*dims):
        z = Q^T (Q v_{k-1})   -- per-block int64 matmul partials; the
                                 cross-block merge sums PYTHON ints, so
                                 no int64 overflow at any corpus size
        m = max(abs(z)), v_k = floor(1000.0 * (double(z)/double(m)) + 0.5)
    Both sides convert the exact integer z to DOUBLE with IEEE
    round-to-nearest (exact below 2^53; at test scales z ~ 1e13), divide
    and floor identically, so v_k matches DuckDB's hugeint SUM + CAST
    replay. Output one row per dim (1-based): (dim, v1_q, .., v{iters}_q).

    Scale shape: each iteration is one streaming pass; the per-block
    partial is `dims` (i, s) rows, and the driver-side merge is bounded
    by n_blocks * dims — never an embedding row. Like PageRank, an
    iterative algorithm re-reads its input; at production scale the
    caller materializes the (bounded-width) quantized projection once.
    """
    iterates = _power_iterates(ds, dims=dims, iters=iters,
                               embedding_col=embedding_col)
    cols = [pa.array(np.arange(1, dims + 1, dtype=np.int64))]
    names = ["dim"]
    for k, vk in enumerate(iterates, 1):
        cols.append(pa.array(vk))
        names.append(f"v{k}_q")
    import ray.data
    return ray.data.from_arrow(pa.Table.from_arrays(cols, names=names))


def _power_iterates(ds, *, dims: int, iters: int,
                    embedding_col: str) -> list[np.ndarray]:
    import ray

    v = np.full(dims, 1000, dtype=np.int64)
    iterates: list[np.ndarray] = []
    for _ in range(iters):
        ref = ray.put(v)

        def partials(batch: pa.Table, *, _ref=ref) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64())] * 2, names=["i", "s"])
            vq = ray.get(_ref)
            q = quantize_matrix(batch.column(embedding_col), dims)
            w = q @ vq                       # (n,) int64, |w| <= 1.6e7
            z = q.T @ w                      # (d,) int64 block partial
            return pa.Table.from_arrays(
                [pa.array(np.arange(1, dims + 1, dtype=np.int64)),
                 pa.array(z)], names=["i", "s"])

        rows = ds.map_batches(partials, batch_format="pyarrow") \
            .take_all()                      # bounded: n_blocks * dims
        z = [0] * dims
        for r in rows:
            z[r["i"] - 1] += int(r["s"])     # python ints: exact
        m = max(abs(x) for x in z)
        if m == 0:
            break
        v = np.array([math.floor(1000.0 * (float(x) / float(m)) + 0.5)
                      for x in z], dtype=np.int64)
        iterates.append(v)
    return iterates


def pca_project(ds, *, dims: int = 16, iters: int = 3,
                id_col: str = "vec_id",
                embedding_col: str = "embedding"):
    """Per-row projection onto the power-iteration direction: learn v_k
    with ``pca_power``'s exact contract, then one broadcast-map pass
    emitting (vec_id, proj_q) with proj_q = sum_i q_i * v_i — exact
    int64 (|q| <= ~1000, |v| <= 1000, d <= 64 keeps the dot below
    2^26*d). The rank-1 embedding compression / sort key of a
    SemDeDup-style curation pass; zero shuffles after the learn step."""
    import ray

    iterates = _power_iterates(ds, dims=dims, iters=iters,
                               embedding_col=embedding_col)
    v = iterates[-1] if iterates else np.zeros(dims, dtype=np.int64)
    ref = ray.put(v)

    def project(batch: pa.Table, *, _ref=ref) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), pa.array([], pa.int64())],
                names=[id_col, "proj_q"])
        vq = ray.get(_ref)
        q = quantize_matrix(batch.column(embedding_col), dims)
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(q @ vq)],
            names=[id_col, "proj_q"])

    return ds.map_batches(project, batch_format="pyarrow")
