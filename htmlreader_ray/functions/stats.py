"""Distributed moment statistics with SQL-replayable exactness.

The per-group mean/variance pass every monitoring or data-validation
pipeline runs, shaped for the combiner pattern: blocks ship one
(group, n, sum, sumsq) row each over exact int64 quantized values, the
driver merges the bounded group table in arbitrary-precision Python
ints, and every double expression in the finalizer (mean, variance,
sqrt, the z-threshold compare) is mirrored operation-for-operation by
the DuckDB oracle — IEEE determinism gives bit-equal keep/drop flags.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

Q_SCALE = 1000


def grouped_zscore_outliers(ds, *, group_col: str, value_col: str,
                            id_col: str, sigma: float = 3.0):
    """Rows whose quantized value sits more than ``sigma`` population
    standard deviations from their group's mean. Output
    (id_col, group_col, vq) for flagged rows, vq = floor(1000*x + 0.5).

    Exactness: moments are exact integers (int64 per block, python-int
    merge across blocks — no overflow at any corpus size); the flag is
        abs(double(vq) - double(s1)/n) > sigma * sqrt(double(s2)/n
                                                      - mean*mean)
    evaluated in the same operation order on both sides. Scale shape:
    pass 1 ships one (group, n, s1, s2) row per block-distinct group;
    pass 2 is a broadcast filter map — the table never shuffles."""
    import math

    import ray

    def q_col(batch: pa.Table) -> np.ndarray:
        v = batch.column(value_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * Q_SCALE + 0.5).astype(np.int64)

    def partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 3,
                names=[group_col, "n", "s1", "s2"])
        vq = q_col(batch)
        t = pa.Table.from_arrays(
            [batch.column(group_col), pa.array(vq), pa.array(vq * vq)],
            names=[group_col, "v", "vv"])
        g = t.group_by(group_col).aggregate(
            [([], "count_all"), ("v", "sum"), ("vv", "sum")])
        return g.rename_columns([group_col, "n", "s1", "s2"])

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in rows:                      # python ints: exact at any scale
        n, s1, s2 = acc.get(r[group_col], (0, 0, 0))
        acc[r[group_col]] = (n + int(r["n"]), s1 + int(r["s1"]),
                             s2 + int(r["s2"]))
    stats = {}
    for g, (n, s1, s2) in acc.items():
        mean = float(s1) / float(n)
        var = float(s2) / float(n) - mean * mean
        stats[g] = (mean, math.sqrt(var) if var > 0 else 0.0)
    groups = sorted(stats)
    ref = ray.put((pa.array(groups, pa.string()),
                   np.array([stats[g][0] for g in groups]),
                   np.array([stats[g][1] for g in groups])))

    def flag(batch: pa.Table, *, _ref=ref) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_arrays(
                [batch.column(id_col), batch.column(group_col),
                 pa.array([], pa.int64())],
                names=[id_col, group_col, "vq"])
        gset, means, stds = ray.get(_ref)
        idx = pc.index_in(batch.column(group_col), value_set=gset) \
            .combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vq = q_col(batch)
        keep = np.abs(vq.astype(np.float64) - means[idx]) \
            > sigma * stds[idx]
        out = pa.Table.from_arrays(
            [batch.column(id_col), batch.column(group_col),
             pa.array(vq)], names=[id_col, group_col, "vq"])
        return out.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")
