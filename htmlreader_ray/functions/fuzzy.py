"""Edit-distance fuzzy matching: probe set vs a streamed string column.

The classic fuzzy-join shape: the probe side is SMALL (a dictionary of
known-good names, a blocklist, a query set) and broadcasts to every
task as plain constructor state; the corpus side STREAMS. Per batch the
kernel runs one Wagner-Fischer dynamic program per probe, vectorized
across all rows of the batch (the DP's inner cell update is numpy
elementwise over an (n_rows,) lane), after a length-band prune
(|len(s) - len(p)| <= max_dist is necessary), so a batch costs
O(len(p) * max_len * n_probes) vector ops regardless of row count.

No shuffle at all — this is a pure map-side join. At 100 TB the only
scale knob is probe-set size; beyond a few thousand probes switch to a
trie/automaton per actor (same plan shape, stateful __init__)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _levenshtein_vec(mat: np.ndarray, lengths: np.ndarray,
                     probe: bytes) -> np.ndarray:
    """Edit distance from ``probe`` to each row of the padded uint8
    matrix ``mat`` (row i valid up to lengths[i]). Vectorized across
    rows: dp has shape (n, len(probe)+1)."""
    n, max_len = mat.shape
    m = len(probe)
    dp = np.broadcast_to(np.arange(m + 1, dtype=np.int32),
                         (n, m + 1)).copy()
    p = np.frombuffer(probe, dtype=np.uint8)
    for c in range(max_len):
        active = c < lengths
        col = mat[:, c]
        new = np.empty_like(dp)
        new[:, 0] = dp[:, 0] + 1
        for j in range(1, m + 1):
            cost = (col != p[j - 1]).astype(np.int32)
            new[:, j] = np.minimum(
                np.minimum(dp[:, j] + 1, new[:, j - 1] + 1),
                dp[:, j - 1] + cost)
        dp[active] = new[active]
    return dp[:, m]


class FuzzyProbeMatch:
    """map_batches callable: rows whose ``text_col`` is within
    ``max_dist`` edits of ANY probe -> (id_col, text_col, probe, dist).
    One output row per (row, probe) hit, mirroring the SQL
    ``CROSS JOIN probes WHERE levenshtein(...) <= d`` exactly."""

    def __init__(self, probes: list[str], *, text_col: str = "p_name",
                 id_col: str = "p_partkey", max_dist: int = 2) -> None:
        self.probes = [(p, p.encode("utf-8")) for p in probes]
        self.text_col = text_col
        self.id_col = id_col
        self.max_dist = max_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        enc = [(t or "").encode("utf-8") for t in texts]
        lengths = np.fromiter((len(e) for e in enc), np.int32, count=n)
        max_len = int(lengths.max()) if n else 0
        mat = np.zeros((n, max_len), dtype=np.uint8)
        for i, e in enumerate(enc):
            mat[i, :len(e)] = np.frombuffer(e, dtype=np.uint8)
        out_idx: list = []
        out_probe: list = []
        out_dist: list = []
        for probe_str, probe in self.probes:
            band = np.abs(lengths - len(probe)) <= self.max_dist
            idx = np.flatnonzero(band)
            if len(idx) == 0:
                continue
            d = _levenshtein_vec(mat[idx], lengths[idx], probe)
            hit = d <= self.max_dist
            out_idx.extend(idx[hit].tolist())
            out_probe.extend([probe_str] * int(hit.sum()))
            out_dist.extend(d[hit].tolist())
        take = pa.array(out_idx, pa.int64())
        return pa.Table.from_arrays(
            [batch.column(self.id_col).take(take),
             batch.column(self.text_col).take(take),
             pa.array(out_probe, pa.string()),
             pa.array(out_dist, pa.int64())],
            names=[self.id_col, self.text_col, "probe", "dist"])


def fuzzy_probe_match(ds, probes: list[str], *, text_col: str = "p_name",
                      id_col: str = "p_partkey", max_dist: int = 2):
    """Fuzzy join of a streamed string column against a broadcast probe
    set; see FuzzyProbeMatch."""
    return ds.map_batches(
        FuzzyProbeMatch(probes, text_col=text_col, id_col=id_col,
                        max_dist=max_dist),
        batch_format="pyarrow")
