"""robots.txt (Robots Exclusion Protocol) filtering for crawl-corpus
curation: parse per-host robots files, then mark every URL in a link /
document table allowed or disallowed.

Semantics implemented (the core REP, RFC 9309 §2.2.2): rules are
literal path PREFIXES grouped under a ``User-agent`` line; the rule
with the LONGEST matching prefix decides; on a length tie ``Allow``
wins; no matching rule means allowed; an empty ``Disallow:`` value
matches nothing. The ``*`` / ``$`` wildcard extensions are NOT
implemented (documented subset — wildcard support would slot into
``_match_lens`` as a second rule class).

Scale shape: the rules table (one row per (host, rule)) is the SMALL
side — ``ray.put`` once via ``RobotsFilter``; the URL table streams
through ``map_batches``. Matching is vectorized per RULE, not per row:
for each of the R rules one ``starts_with`` over the batch column and
a numpy running (best_len, allow) update — O(R) Arrow kernels per
batch, never a Python loop over URLs. R is bounded by the distinct
hosts in the rules side; for web-scale rule sets, hash-partition the
URL table by host and shard the rules the same way first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ------------------------------------------------------------------ parse

def parse_robots(text: str, *, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt text -> [(path_prefix, allow)] for ``agent``.

    Section selection: rules under the matching ``User-agent`` lines
    (exact, case-insensitive; consecutive agent lines share one rule
    group per RFC 9309 §2.2.1). Empty Disallow values are dropped
    (they match nothing); empty Allow values likewise.
    """
    rules: list[tuple[str, bool]] = []
    active = False          # current group applies to our agent
    in_agent_block = False  # last non-blank significant line was UA
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_block:
                active = False      # a new group starts
            in_agent_block = True
            if value.lower() == agent.lower():
                active = True
            continue
        in_agent_block = False
        if field in ("allow", "disallow") and active and value:
            rules.append((value, field == "allow"))
    return rules


# ------------------------------------------------------------------ match

def allowed_mask(hosts, paths, rules_by_host: dict) -> pa.Array:
    """hosts/paths string arrays + {host: [(prefix, allow)]} ->
    bool array (longest-match REP decision per row)."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    n = len(hosts)
    best_len = np.zeros(n, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)   # no match -> allowed
    for host, rules in rules_by_host.items():
        host_mask = pc.equal(hosts, host).to_numpy(zero_copy_only=False)
        if not host_mask.any():
            continue
        for prefix, allow in rules:
            m = pc.starts_with(paths, prefix).to_numpy(
                zero_copy_only=False) & host_mask
            plen = len(prefix)
            # longest match wins; tie -> Allow wins
            upd = m & ((plen > best_len)
                       | ((plen == best_len) & allow))
            best_len[upd] = plen
            best_allow[upd] = allow
    return pa.array(best_allow)


class RobotsFilter:
    """Actor/task stage: annotate (host, path) rows with ``allowed``.

    ``rules_ref`` is a ``ray.put`` of {host: [(prefix, allow)]} — the
    robots side is fetched once per worker, batches stream."""

    def __init__(self, rules_ref, host_col: str = "host",
                 path_col: str = "path",
                 out_col: str = "allowed") -> None:
        import ray
        self.rules = ray.get(rules_ref)
        self.host_col, self.path_col = host_col, path_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = allowed_mask(batch.column(self.host_col),
                            batch.column(self.path_col), self.rules)
        return batch.append_column(
            self.out_col, pc.cast(mask, pa.int64()))
