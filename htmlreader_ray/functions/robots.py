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

Scale shape, two regimes: (a) a BOUNDED rules table is ``ray.put``
once via ``RobotsFilter`` and the URL table streams through
``map_batches``; (b) for web-scale rule sets (millions of hosts),
``robots_filter_joined`` keeps the rules as a Dataset — packed
one-row-per-host, hash-joined onto the URL table on the host key —
so nothing rules-shaped ever transits the driver or a broadcast.
Both regimes share the matcher, which is vectorized per RULE, not
per row: for each rule of a host PRESENT IN THE BATCH, one
``starts_with`` over the batch column and a numpy running
(best_len, allow) update — O(batch_hosts × rules/host) Arrow
kernels per batch, never a Python loop over URLs. The two paths are
bit-parity-pinned by tests and the robots_filter_sharded oracle.
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
    # iterate only hosts PRESENT in the batch: a web-scale rules table
    # holds millions of hosts while a batch touches a handful — probing
    # every rules host with an equality kernel would make the per-batch
    # cost O(rules_hosts), not O(batch_hosts)
    present = set(pc.unique(hosts).to_pylist())
    for host in present:
        rules = rules_by_host.get(host)
        if not rules:
            continue
        host_mask = pc.equal(hosts, host).to_numpy(zero_copy_only=False)
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


# ------------------------------------------------------- distributed path

def pack_rules_by_host(batch: pa.Table) -> pa.Table:
    """map_groups kernel over per-host (host, prefix, allow) rule rows:
    ONE output row per host with the rules packed into a JSON string
    column (Acero joins reject list-typed payload columns, so the
    packed side must be scalar; rule order within a host preserved —
    it arrived in file order and the matcher's tie rule is
    order-independent anyway)."""
    import json
    host = batch.column("host")
    uniq = pc.unique(host)
    packed = []
    for h in uniq.to_pylist():
        sub = batch.filter(pc.equal(host, h))
        packed.append(json.dumps(
            [[p, a] for p, a in zip(sub.column("prefix").to_pylist(),
                                    sub.column("allow").to_pylist())]))
    return pa.table({
        "host": uniq,
        "__rules_json": pa.array(packed, pa.string()),
    })


def _apply_joined_rules(batch: pa.Table, host_col: str, path_col: str,
                        out_col: str) -> pa.Table:
    """Post-join matcher: every URL row carries its host's packed rule
    JSON (null when the host has no robots entry -> allowed). Rebuild
    the per-present-host dict once per batch and reuse the vectorized
    longest-match kernel."""
    hosts = batch.column(host_col)
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    import json
    rj = batch.column("__rules_json")
    if isinstance(rj, pa.ChunkedArray):
        rj = rj.combine_chunks()
    rules_by_host: dict = {}
    # one representative row per present host (rules are host-functional):
    # index_in finds each distinct host's first row in two Arrow kernels —
    # no per-row Python — and the JSON parse runs once per distinct host
    uniq = pc.unique(hosts)
    first_idx = pc.index_in(uniq, value_set=hosts)
    for h, i in zip(uniq.to_pylist(), first_idx.to_pylist()):
        v = rj[i].as_py()
        if v is None:
            continue
        rules_by_host[h] = [(p, a) for p, a in json.loads(v)]
    mask = allowed_mask(hosts, batch.column(path_col), rules_by_host)
    out = batch.drop_columns(["__rules_json"])
    return out.append_column(out_col, pc.cast(mask, pa.int64()))


def robots_filter_joined(urls_ds, rules_ds, *, host_col: str = "host",
                         path_col: str = "path",
                         out_col: str = "allowed",
                         num_partitions: int | None = None):
    """Web-scale robots filtering: the rules side as a DATASET of
    (host, prefix, allow) rows instead of a driver-held dict.

    Scale shape: rules are packed one-row-per-host (groupby(host)
    map_groups — group size = rules per host, bounded by robots.txt
    size), then LEFT-joined onto the URL table hash-partitioned on the
    host key; the per-batch matcher is the same vectorized
    longest-match kernel. Nothing host-rule-shaped ever transits the
    driver or a broadcast, so the rules table may hold millions of
    hosts. Bit-parity with the broadcast RobotsFilter path is pinned
    by tests and the robots_filter_sharded driver oracle."""
    from .dedup import _default_join_partitions
    parts = num_partitions or _default_join_partitions()
    packed = rules_ds.repartition(parts).groupby("host") \
        .map_groups(pack_rules_by_host, batch_format="pyarrow")
    joined = urls_ds.join(
        packed.repartition(parts), join_type="left_outer",
        num_partitions=parts, on=(host_col,), right_on=("host",))
    import functools
    fn = functools.partial(_apply_joined_rules, host_col=host_col,
                           path_col=path_col, out_col=out_col)
    return joined.map_batches(fn, batch_format="pyarrow")
