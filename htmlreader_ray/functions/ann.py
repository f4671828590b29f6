"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is ray.put ONCE and read inside
  every map_batches task (broadcast, never re-shipped per batch); each batch
  computes a numpy matmul and emits only its LOCAL top-k per query, so the
  shuffle/merge volume is O(n_queries * k * n_blocks), not O(corpus).
- IVF variant: deterministic coarse centroids; vectors are bucketed by
  nearest centroid inside map_batches (one pass); queries probe only the
  nprobe nearest buckets. The scale path when brute force stops fitting.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, len(batch))
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopK:
    """map_batches task fn: emit the batch-local top-k candidates per query.

    ``queries_ref`` is a ray.ObjectRef to (query_ids, normalized query
    matrix) — resolved once per task, zero-copy from the object store.
    """

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id", exclude_self: bool = True) -> None:
        import ray
        self.query_ids, self.q = ray.get(queries_ref)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", "vec_id", "sim"])
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        m = _normalize(_batch_matrix(batch, self.vec_col))
        sims = self.q @ m.T  # (n_queries, n_batch)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi, qid in enumerate(self.query_ids):
            row = sims[qi]
            if self.exclude_self:
                mask = ids == qid
                row = np.where(mask, -np.inf, row)
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                if row[j] == -np.inf:
                    continue
                out_q.append(int(qid))
                out_v.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["query_id", "vec_id", "sim"])


def _merge_topk(batch: pa.Table, k: int) -> pa.Table:
    """Single-task reduce of the per-block partial top-ks: sort by
    (query, sim desc), rank within each query vectorized, keep rank<=k."""
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[
        ("query_id", "ascending"), ("sim", "descending"),
        ("vec_id", "ascending")])
    t = batch.take(idx)
    q = t.column("query_id").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(q)
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.float64()), pa.array([], pa.int64())],
            names=["query_id", "vec_id", "sim", "rank"])
    pos = np.arange(n, dtype=np.int64)
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = q[1:] != q[:-1]
    group_start = np.maximum.accumulate(np.where(is_start, pos, 0))
    rank = pos - group_start + 1
    keep = rank <= k
    t = t.filter(pa.array(keep))
    return pa.Table.from_arrays(
        [t.column("query_id"), t.column("vec_id"), t.column("sim"),
         pa.array(rank[keep], pa.int64())],
        names=["query_id", "vec_id", "sim", "rank"])


def merge_local_topk(local, k: int):
    """Global top-k merge of block-local partials. The partial volume is
    bounded at n_queries x k per input BLOCK — independent of corpus
    size — so the merge is a repartition(1) single-task reduce, not a
    groupby (whose sort-based shuffle costs seconds of barrier latency on
    a few thousand rows). If n_queries x k x n_blocks ever outgrows one
    task, repartition on hash(query_id) ranges and run the same merge per
    range instead."""
    return local.repartition(1).map_batches(
        _merge_topk, fn_kwargs={"k": k}, batch_format="pyarrow")


def brute_force_topk(ds, query_ids: list[int], k: int = 5, *,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Dataset + query ids (rows of the same dataset) -> Dataset
    (query_id, vec_id, sim, rank). Queries are materialized once (they are
    tiny), broadcast via ray.put."""
    import ray
    import pyarrow.compute as pc

    def keep_queries(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col),
                        value_set=pa.array(query_ids, pa.int64()))
        return batch.filter(mask)

    q_rows = ds.map_batches(keep_queries, batch_format="pyarrow").take_all()
    q_rows.sort(key=lambda r: query_ids.index(r[id_col]))
    qids = [r[id_col] for r in q_rows]
    qm = _normalize(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    queries_ref = ray.put((qids, qm))

    from ..stages.task_cache import as_task
    local = ds.map_batches(
        as_task(BatchTopK, queries_ref=queries_ref, k=k,
                vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow")
    return merge_local_topk(local, k)


# ------------------------------------------------------------------- IVF

class IVFAssign:
    """Assign each vector to its nearest coarse centroid (one pass)."""

    def __init__(self, centroids_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> None:
        import ray
        self.centroids = ray.get(centroids_ref)  # normalized (C, d)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int32()))
        m = _normalize(_batch_matrix(batch, self.vec_col))
        sims = m @ self.centroids.T
        buckets = np.argmax(sims, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets))


def deterministic_centroids(ds, n_centroids: int, *,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            kmeans_iters: int = 3) -> np.ndarray:
    """Deterministic coarse quantizer: seeded with the first n_centroids
    vectors by id, refined with a few distributed Lloyd iterations (spherical
    k-means). Each iteration is one map_batches pass emitting per-batch
    partial sums per centroid — the combiner pattern, so the driver merges
    n_centroids x n_blocks partials, never the vectors."""
    import ray
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column(id_col), n_centroids)
        return batch.filter(mask)

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    cents = _normalize(np.array([r[vec_col] for r in rows],
                                dtype=np.float64))

    for _ in range(kmeans_iters):
        cents_ref = ray.put(cents)

        def partial_sums(batch: pa.Table, ref=cents_ref) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.Table.from_arrays(
                [pa.array(range(len(c)), pa.int32()),
                 pa.array(sums.tolist(),
                          pa.list_(pa.float64())),
                 pa.array(counts, pa.int64())],
                names=["centroid", "vec_sum", "count"])

        partials = ds.map_batches(partial_sums,
                                  batch_format="pyarrow").take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in partials:
            sums[r["centroid"]] += np.asarray(r["vec_sum"])
            counts[r["centroid"]] += r["count"]
        nonempty = counts > 0
        cents[nonempty] = _normalize(sums[nonempty] /
                                     counts[nonempty, None])
    return cents


def ivf_topk(ds, query_ids: list[int], k: int = 5, *, n_centroids: int = 16,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id"):
    """IVF-style ANN: bucket by nearest centroid, probe nprobe buckets per
    query. Returns (query_id, vec_id, sim, rank)."""
    import ray
    import pyarrow.compute as pc

    cents = deterministic_centroids(ds, n_centroids, vec_col=vec_col,
                                    id_col=id_col)
    cents_ref = ray.put(cents)
    from ..stages.task_cache import as_task
    assigned = ds.map_batches(
        as_task(IVFAssign, centroids_ref=cents_ref,
                vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow")

    def keep_queries(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col),
                        value_set=pa.array(query_ids, pa.int64()))
        return batch.filter(mask)

    q_rows = ds.map_batches(keep_queries, batch_format="pyarrow").take_all()
    qids = [r[id_col] for r in q_rows]
    qm = _normalize(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_sets = {int(q): set(int(b) for b in row)
                  for q, row in zip(qids, probe)}
    all_buckets = sorted({b for s in probe_sets.values() for b in s})

    def keep_probed(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("bucket"),
                        value_set=pa.array(all_buckets, pa.int32()))
        return batch.filter(mask)

    probed = assigned.map_batches(keep_probed, batch_format="pyarrow")
    queries_ref = ray.put((qids, qm))
    from ..stages.task_cache import as_task
    local = probed.map_batches(
        as_task(BatchTopK, queries_ref=queries_ref, k=k,
                vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow")
    return merge_local_topk(local, k)


def quantize_embeddings_batch(batch: pa.Table, *, vec_col: str = "embedding",
                              id_col: str = "vec_id") -> pa.Table:
    """Symmetric int8 quantization for embedding storage (the standard
    4x shrink before writing a vector corpus): per-vector scale
    127/max|x|, elements floor(x * scale + 0.5). Pure map — no state, no
    shuffle. Every arithmetic step is a double-precision expression the
    SQL oracle mirrors verbatim (parquet float32 -> float64 casts are
    exact, multiply/floor are IEEE), the quantized vector serializes as
    a comma string and the scale as integer nano-units, so the driver
    hash matches bit-for-bit. Zero vectors quantize to zeros with
    scale 0."""
    mat = _batch_matrix(batch, vec_col).astype(np.float64)
    m = np.abs(mat).max(axis=1)
    nz = m != 0
    scale = np.zeros(len(mat), np.float64)
    scale[nz] = 127.0 / m[nz]
    q = np.floor(mat * scale[:, None] + 0.5).astype(np.int64)
    qstr = [",".join(map(str, row)) for row in q]
    scale_e9 = np.zeros(len(mat), np.int64)
    scale_e9[nz] = np.floor(1000000000 * scale[nz] + 0.5).astype(np.int64)
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(qstr, pa.string()),
         pa.array(scale_e9, pa.int64())],
        names=[id_col, "qvec", "scale_e9"])
