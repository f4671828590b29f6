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


def _brute_semdedup(mat, cids, c, t_num, t_den):
    q = clustering.quantize_matrix(
        emb_table(mat).column("embedding"))
    cl, _ = clustering._assign_block(q, cids, c)
    n = len(q)
    keep = [1] * n
    for v in range(n):
        for u in range(v):
            if cl[u] != cl[v]:
                continue
            dot = int(q[u] @ q[v])
            qa, qb = int(q[u] @ q[u]), int(q[v] @ q[v])
            if dot > 0 and t_den * t_den * dot * dot \
                    >= t_num * t_num * qa * qb:
                keep[v] = 0
                break
    return cl, keep


def test_semdedup_prune_matches_brute(ray_session):
    import ray.data
    rng = np.random.default_rng(11)
    mat = rng.uniform(-0.6, 0.6, size=(80, 8)).astype(np.float32)
    # plant near-duplicates: rows 50/51 copies of 3/7 with tiny noise
    mat[50] = mat[3] + 0.001
    mat[51] = mat[7] - 0.001
    cids = np.array([0, 1, 2], np.int64)
    c = clustering.quantize_matrix(
        emb_table(mat[:3]).column("embedding"))
    ds = ray.data.from_arrow(emb_table(mat)).repartition(7)
    got = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in clustering.semdedup_prune(
               ds, cids, c, tau_num=9, tau_den=10).take_all()}
    cl, keep = _brute_semdedup(mat, cids, c, 9, 10)
    assert len(got) == len(mat)
    for v in range(len(mat)):
        assert got[v] == (cl[v], keep[v]), v
    # non-vacuous: the planted copies (and the self-identical centroids'
    # duplicates, if any) must actually be pruned
    assert got[50][1] == 0 and got[51][1] == 0
    assert sum(k for _, k in got.values()) < len(mat)


def test_semdedup_exists_rule_chain(ray_session):
    """u prunes v even when u is itself pruned (EXISTS, not CC): three
    identical vectors -> ids 1 and 2 both pruned by lower ids."""
    import ray.data
    mat = [[0.3, 0.1]] * 3
    cids = np.array([0], np.int64)
    c = clustering.quantize_matrix(emb_table(mat[:1]).column("embedding"))
    got = {r["vec_id"]: r["keep"]
           for r in clustering.semdedup_prune(
               ray.data.from_arrow(emb_table(mat)), cids, c,
               tau_num=9, tau_den=10).take_all()}
    assert got == {0: 1, 1: 0, 2: 0}


def test_semdedup_block_boundary(ray_session):
    """The row-blocked Gram path agrees with brute force when a group
    spans multiple blocks (block_rows=4 << group size 30)."""
    import ray.data
    rng = np.random.default_rng(5)
    mat = rng.uniform(-0.5, 0.5, size=(30, 4)).astype(np.float32)
    mat[17] = mat[2]
    mat[5] = mat[4] + 0.0005
    cids = np.array([0], np.int64)
    c = clustering.quantize_matrix(emb_table(mat[:1]).column("embedding"))
    got = {r["vec_id"]: r["keep"]
           for r in clustering.semdedup_prune(
               ray.data.from_arrow(emb_table(mat)), cids, c,
               tau_num=9, tau_den=10, block_rows=4).take_all()}
    _, keep = _brute_semdedup(mat, cids, c, 9, 10)
    assert keep[17] == 0 and got[17] == 0
    assert [got[v] for v in range(30)] == keep


def _brute_pca_power(mat, dims, iters):
    q = clustering.quantize_matrix(
        emb_table(mat).column("embedding"), dims)
    v = [1000] * dims
    outs = []
    for _ in range(iters):
        w = [sum(int(q[r, j]) * v[j] for j in range(dims))
             for r in range(len(q))]
        z = [sum(int(q[r, j]) * w[r] for r in range(len(q)))
             for j in range(dims)]
        m = max(abs(x) for x in z)
        v = [math.floor(1000.0 * (float(x) / float(m)) + 0.5) for x in z]
        outs.append(v)
    return outs


def test_pca_power_matches_brute_and_partition_invariant(ray_session):
    import ray.data
    rng = np.random.default_rng(3)
    # planted dominant direction + noise so 3 iterations converge
    u = rng.uniform(0.5, 1.0, size=50)
    w = rng.uniform(-0.5, 0.5, size=6)
    mat = (np.outer(u, w)
           + rng.uniform(-0.05, 0.05, size=(50, 6))).astype(np.float32)
    want = _brute_pca_power(mat, 6, 3)
    for parts in (1, 7):
        ds = ray.data.from_arrow(emb_table(mat)).repartition(parts)
        got = sorted(clustering.pca_power(ds, dims=6, iters=3).take_all(),
                     key=lambda r: r["dim"])
        for k in range(3):
            assert [r[f"v{k+1}_q"] for r in got] == want[k], (parts, k)
    # the converged iterate is parallel to numpy's dominant eigenvector
    q = clustering.quantize_matrix(
        emb_table(mat).column("embedding")).astype(float)
    evec = np.linalg.eigh(q.T @ q)[1][:, -1]
    v3 = np.array(want[2], dtype=float)
    cos = abs(v3 @ evec) / (np.linalg.norm(v3) * np.linalg.norm(evec))
    assert cos > 0.999


def test_pca_project_matches_brute(ray_session):
    import ray.data
    rng = np.random.default_rng(9)
    u = rng.uniform(0.5, 1.0, size=40)
    w = rng.uniform(-0.5, 0.5, size=5)
    mat = (np.outer(u, w)
           + rng.uniform(-0.05, 0.05, size=(40, 5))).astype(np.float32)
    v3 = np.array(_brute_pca_power(mat, 5, 3)[2], dtype=np.int64)
    q = clustering.quantize_matrix(
        emb_table(mat).column("embedding"), 5)
    ds = ray.data.from_arrow(emb_table(mat)).repartition(3)
    got = {r["vec_id"]: r["proj_q"]
           for r in clustering.pca_project(ds, dims=5, iters=3).take_all()}
    for i in range(40):
        assert got[i] == int(q[i] @ v3)


def test_pq_encode_codebook_self_assigns(ray_session):
    """Each codebook vector PQ-encodes to its own id in every subspace
    with zero reconstruction distance."""
    import ray.data

    from htmlreader_ray.functions.clustering import pq_encode

    rng = np.random.default_rng(11)
    vecs = rng.uniform(-1, 1, (20, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    from htmlreader_ray.functions.clustering import quantize_matrix
    c = quantize_matrix(t.column("embedding"))[:4]
    cids = np.arange(4, dtype=np.int64)
    out = {r["vec_id"]: (r["code"], r["dist_q"])
           for r in pq_encode(ray.data.from_arrow(t), cids, c,
                              m=2).take_all()}
    for j in range(4):
        assert out[j] == (f"{j},{j}", 0)
    # every code references a valid codebook id and dist is non-negative
    for code, dist in out.values():
        assert dist >= 0
        assert all(0 <= int(x) < 4 for x in code.split(","))


def test_pq_encode_matches_brute_force(ray_session):
    import ray.data

    from htmlreader_ray.functions.clustering import (pq_encode,
                                                     quantize_matrix)
    rng = np.random.default_rng(5)
    vecs = rng.uniform(-1, 1, (50, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    q = quantize_matrix(t.column("embedding"))
    c = q[:4]
    cids = np.arange(4, dtype=np.int64)
    got = {r["vec_id"]: (r["code"], r["dist_q"])
           for r in pq_encode(ray.data.from_arrow(t), cids, c,
                              m=4).take_all()}
    for n in range(50):
        codes, tot = [], 0
        for s in range(4):
            qs, best_j, best_d = q[n, s * 2:(s + 1) * 2], -1, None
            for j in range(4):
                d = int(((qs - c[j, s * 2:(s + 1) * 2]) ** 2).sum())
                if best_d is None or d < best_d:
                    best_j, best_d = j, d
            codes.append(str(best_j))
            tot += best_d
        assert got[n] == (",".join(codes), tot)


def test_pq_adc_query_zero_ranks_itself_first(ray_session):
    """ADC distance of the query's own vector is the total quantization
    error of its code vs the LUT — for a codebook member it is 0, so
    vec 0 ranks first."""
    import ray.data

    from htmlreader_ray.functions.clustering import (pq_adc_topk,
                                                     quantize_matrix)
    rng = np.random.default_rng(3)
    vecs = rng.uniform(-1, 1, (30, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    q = quantize_matrix(t.column("embedding"))
    c = q[:4]
    cids = np.arange(4, dtype=np.int64)
    out = pq_adc_topk(ray.data.from_arrow(t), cids, c, q[0],
                      m=2, k=5).take_all()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and out[0]["adc_dist"] == 0
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)
