"""Mergeable quantile sketch (KLL-style) as a combiner-pattern Ray stage.

The exact-quantile operators in this repo (``length_quantiles``,
``value_median``) shuffle the *value distribution* — bounded by distinct
values, which is fine for integer lengths/cents but unbounded for arbitrary
doubles. This module is the scale path for continuous columns: each block
reduces to a fixed-size sketch, one tiny merge produces rank-bounded
quantile estimates. At 100 TB the shuffle moves ``O(blocks * k * levels)``
floats regardless of row count.

Design (KLL-lite, Karnin-Lang-Liberty 2016, public algorithm):
- level ``i`` holds items of weight ``2**i``; every level has capacity
  ``k`` items;
- an over-full level is sorted and every other item is promoted to the
  next level (weight doubles), the rest are discarded;
- the promotion offset alternates via a deterministic per-level parity
  counter rather than a coin flip, so results are reproducible run-to-run
  (a requirement for the driver's value-hash oracle and for resumable
  pipelines; the classic randomized variant only improves constants).
- merge = level-wise concatenation followed by the same compaction.

Rank rule: with total weight ``W``, quantile ``numer/denom`` selects the
item covering 1-based rank ``(W - 1) * numer // denom + 1`` — integer
arithmetic, identical to the SQL ``row_number`` oracle. When no compaction
has occurred (``n <= k``) every item has weight 1 and the result is the
exact order statistic, which is what the strict oracle pins at test scale;
the compacted regime is covered by rank-error unit tests.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


class KLLSketch:
    """Deterministic KLL-lite sketch over float64 values."""

    def __init__(self, k: int = 4096):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self._parity: list[int] = [0]

    # ---------------------------------------------------------- build
    def extend(self, values) -> None:
        """Add a batch of values (any iterable / numpy array)."""
        arr = np.asarray(values, dtype=np.float64)
        if arr.size == 0:
            return
        if np.isnan(arr).any():
            arr = arr[~np.isnan(arr)]
        self.levels[0].extend(arr.tolist())
        self._compact()

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = sorted(self.levels[i])
                p = self._parity[i]
                self._parity[i] ^= 1
                if i + 1 == len(self.levels):
                    self.levels.append([])
                    self._parity.append(0)
                # compact an EVEN count so total weight is preserved
                # exactly (promoted items double their weight); an odd
                # straggler stays at this level
                even = len(buf) & ~1
                self.levels[i + 1].extend(buf[p:even:2])
                self.levels[i] = buf[even:]
            i += 1

    # ---------------------------------------------------------- (de)serialize
    def to_table(self) -> pa.Table:
        """Serialize as (level, value) rows — the shuffle representation."""
        lv: list[int] = []
        vals: list[float] = []
        for i, buf in enumerate(self.levels):
            lv.extend([i] * len(buf))
            vals.extend(buf)
        return pa.Table.from_arrays(
            [pa.array(lv, pa.int32()), pa.array(vals, pa.float64())],
            names=["level", "value"])

    @classmethod
    def from_table(cls, table: pa.Table, k: int) -> "KLLSketch":
        """Rebuild (merge) from concatenated (level, value) rows of any
        number of serialized sketches, then re-establish the capacity
        invariant."""
        sk = cls(k)
        if table.num_rows:
            levels = table.column("level").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            values = table.column("value").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            top = int(levels.max())
            while len(sk.levels) <= top:
                sk.levels.append([])
                sk._parity.append(0)
            for i in range(top + 1):
                sel = values[levels == i]
                if sel.size:
                    sk.levels[i].extend(sel.tolist())
            sk._compact()
        return sk

    # ---------------------------------------------------------- query
    def total_weight(self) -> int:
        return sum(len(buf) << i for i, buf in enumerate(self.levels))

    def quantiles(self, fracs: Sequence[tuple[int, int]]) -> list[float]:
        """Quantile estimates for (numer, denom) fractions, by weighted
        rank selection with the integer rank rule above."""
        items: list[tuple[float, int]] = []
        for i, buf in enumerate(self.levels):
            w = 1 << i
            items.extend((v, w) for v in buf)
        if not items:
            return [float("nan")] * len(fracs)
        items.sort(key=lambda t: t[0])
        vals = np.array([v for v, _ in items])
        cumw = np.cumsum([w for _, w in items])
        total = int(cumw[-1])
        out = []
        for numer, denom in fracs:
            rank = (total - 1) * numer // denom + 1
            idx = int(np.searchsorted(cumw, rank))
            out.append(float(vals[idx]))
        return out


def quantile_sketch(ds, col: str, fracs: Sequence[tuple[int, int]],
                    k: int = 4096):
    """Distributed quantile estimation: per-block KLL partials, one small
    merge. Returns a Dataset with columns (q: float64, value: float64),
    one row per requested fraction.

    The merge input is ``O(blocks * k)`` rows whatever the corpus size; at
    very large block counts insert an intermediate merge keyed by
    ``block_hash % 32`` before the final one (same shape as the sketch
    merges in functions/sketch.py)."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = KLLSketch(k)
        sk.extend(batch.column(col).combine_chunks()
                  .to_numpy(zero_copy_only=False))
        return sk.to_table()

    def merge(batch: pa.Table) -> pa.Table:
        sk = KLLSketch.from_table(batch, k)
        qv = sk.quantiles(fracs)
        return pa.Table.from_arrays(
            [pa.array([n / d for n, d in fracs], pa.float64()),
             pa.array(qv, pa.float64())],
            names=["q", "value"])

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")
    return parts.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None)
