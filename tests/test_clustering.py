"""Unit tests for functions/clustering.py (covariance, k-means assign/step)
against numpy brute force, plus tie/empty edge cases."""
import math

import numpy as np
import pyarrow as pa

from htmlreader_ray.functions import clustering


def emb_table(mat, ids=None):
    n = len(mat)
    ids = list(range(n)) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in mat],
                              pa.list_(pa.float32())),
    })


def test_quantize_matrix_contract():
    t = emb_table([[0.1234, -0.49951], [0.0, 0.5]])
    q = clustering.quantize_matrix(t.column("embedding"))
    # floor(1000*double(float32(x)) + 0.5)
    f32 = np.array([[0.1234, -0.49951], [0.0, 0.5]], np.float32)
    want = np.floor(1000 * f32.astype(np.float64) + 0.5).astype(np.int64)
    assert (q == want).all()
    assert clustering.quantize_matrix(t.column("embedding"), dims=1).shape \
        == (2, 1)


def test_covariance_matches_numpy(ray_session):
    import ray.data
    rng = np.random.default_rng(7)
    mat = rng.uniform(-0.6, 0.6, size=(40, 6)).astype(np.float32)
    ds = ray.data.from_arrow(emb_table(mat)).repartition(5)
    out = {(r["i"], r["j"]): r["cov_e9"]
           for r in clustering.embedding_covariance(ds, dims=4).take_all()}
    q = clustering.quantize_matrix(
        emb_table(mat).column("embedding"), dims=4).astype(np.float64)
    n = float(len(mat))
    for i in range(4):
        for j in range(4):
            sxy = float((q[:, i] * q[:, j]).sum())
            cov = sxy / n - (q[:, i].sum() / n) * (q[:, j].sum() / n)
            assert out[(i + 1, j + 1)] == math.floor(1000.0 * cov + 0.5)
    assert len(out) == 16  # no (0, j) bookkeeping rows leak


def test_kmeans_assign_exact_and_ties(ray_session):
    import ray.data
    # centroid 0 at origin, centroid 1 at (0.2, 0); a probe equidistant
    # from both must tie-break to the LOWEST centroid id
    cids = np.array([0, 1], np.int64)
    c = np.array([[0, 0], [200, 0]], np.int64)
    mat = [[0.1, 0.0],      # exactly between -> cluster 0
           [0.19, 0.0],     # nearest 1
           [-0.05, 0.01]]   # nearest 0
    ds = ray.data.from_arrow(emb_table(mat, ids=[10, 11, 12]))
    got = {r["vec_id"]: (r["cluster"], r["dist_q"])
           for r in clustering.kmeans_assign(ds, cids, c).take_all()}
    assert got[10] == (0, 100 * 100)
    assert got[11][0] == 1 and got[11][1] == 10 * 10
    assert got[12] == (0, 50 * 50 + 10 * 10)


def test_kmeans_step_matches_brute(ray_session):
    import ray.data
    rng = np.random.default_rng(3)
    mat = rng.uniform(-0.5, 0.5, size=(30, 4)).astype(np.float32)
    tbl = emb_table(mat)
    q = clustering.quantize_matrix(tbl.column("embedding"))
    cids = np.array([0, 1, 2], np.int64)
    c = q[:3].copy()
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = {(r["cluster"], r["dim"]): r["centroid_q"]
           for r in clustering.kmeans_step(ds, cids, c).take_all()}
    # brute-force assignment + integer means
    d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assign = cids[np.argmin(d2, axis=1)]
    for cl in cids:
        rows = q[assign == cl]
        if len(rows) == 0:
            assert not any(k[0] == cl for k in got)
            continue
        for dim in range(q.shape[1]):
            want = math.floor(float(rows[:, dim].sum()) / float(len(rows)))
            assert got[(cl, dim + 1)] == want


def test_assign_block_empty_cluster_ok():
    # all points nearest centroid 0; centroid 1 gets no rows
    cids = np.array([0, 5], np.int64)
    c = np.array([[0, 0], [10_000, 10_000]], np.int64)
    q = np.array([[1, 1], [2, 2]], np.int64)
    cluster, dist = clustering._assign_block(q, cids, c)
    assert list(cluster) == [0, 0]
    assert list(dist) == [2, 8]
