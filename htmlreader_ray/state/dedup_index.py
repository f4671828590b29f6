"""Shared mutable dedup index — the one stage that genuinely cannot be a
Dataset transform (SURVEY.md §4.2 escape hatch: "raw Ray tasks/actors only
for what the Dataset API can't express, e.g. a shared mutable index").

A pool of ``DedupShard`` actors holds the set of content digests seen so
far, sharded by digest prefix so memory and request load spread evenly; a
map_batches stage queries claim() to keep only first-seen rows. Unlike the
groupby-based exact dedup (functions/dedup.py), this works INCREMENTALLY:
across pipeline runs, shards, or a live stream, later occurrences of
already-claimed content are dropped without re-shuffling history.

Scale notes: each shard holds raw 16-byte digests (a 10^9-doc corpus is
~16 GB across the pool — 64 shards x 250 MB); claim() is an idempotent
set-insert so task retries are safe; the actor pool is the partitioning
assumption (digest-prefix sharding), not a Dataset shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa


def _make_shard_cls():
    import ray

    @ray.remote(num_cpus=0.1)
    class DedupShard:
        def __init__(self) -> None:
            self.seen: set[bytes] = set()

        def claim(self, digests: list[bytes]) -> list[bool]:
            """For each digest: True if this call claimed it (first seen),
            False if already present. Atomic per shard (actor serializes)."""
            out = []
            seen = self.seen
            for d in digests:
                if d in seen:
                    out.append(False)
                else:
                    seen.add(d)
                    out.append(True)
            return out

        def size(self) -> int:
            return len(self.seen)

    return DedupShard


class DedupIndex:
    """Client handle for a sharded claim-index."""

    def __init__(self, n_shards: int = 8) -> None:
        import ray
        cls = _make_shard_cls()
        self.n_shards = n_shards
        self.shards = [cls.remote() for _ in range(n_shards)]
        self._ray = ray

    def claim_texts(self, texts: list[str]) -> list[bool]:
        digests = [hashlib.blake2b((t or "").encode("utf-8"),
                                   digest_size=16).digest() for t in texts]
        return self.claim_digests(digests)

    def claim_digests(self, digests: list[bytes]) -> list[bool]:
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(d[0] % self.n_shards, []).append(i)
        results = [False] * len(digests)
        futures = []
        for shard_id, idxs in by_shard.items():
            futures.append((idxs, self.shards[shard_id].claim.remote(
                [digests[i] for i in idxs])))
        for idxs, fut in futures:
            for i, ok in zip(idxs, self._ray.get(fut)):
                results[i] = ok
        return results

    def total_seen(self) -> int:
        return sum(self._ray.get([s.size.remote() for s in self.shards]))


def streaming_exact_dedup(ds, index: DedupIndex, *, text_col: str = "text"):
    """Filter a Dataset to first-seen rows using the shared index. Order of
    concurrent claims is nondeterministic between equal-content rows in
    different blocks — exactly one survives, but which one depends on
    scheduling (use functions/dedup.exact_dedup_ids when a deterministic
    survivor matters)."""
    shards = index.shards
    n_shards = index.n_shards

    class Filter:
        def __init__(self) -> None:
            import ray
            self._ray = ray

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            digests = [hashlib.blake2b((t or "").encode("utf-8"),
                                       digest_size=16).digest()
                       for t in texts]
            by_shard: dict[int, list[int]] = {}
            for i, d in enumerate(digests):
                by_shard.setdefault(d[0] % n_shards, []).append(i)
            keep = [False] * len(digests)
            futs = []
            for shard_id, idxs in by_shard.items():
                futs.append((idxs, shards[shard_id].claim.remote(
                    [digests[i] for i in idxs])))
            for idxs, fut in futs:
                for i, ok in zip(idxs, self._ray.get(fut)):
                    keep[i] = ok
            return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 4))
