"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shuffle-frugal Ray Data patterns:
- EXACT: hash the content inside map_batches (so the shuffle key is a small
  fixed-width digest, never the full text), then one groupby on the digest
  with a min-id aggregate.
- MINHASH+LSH: shingle -> 128-perm minhash signature (numpy, vectorized over
  permutations) -> band rows (b bands x r rows) -> groupby(band bucket) ->
  candidate pairs -> exact Jaccard verify inside the group. Only small
  (bucket_key, doc_id, signature-slice) rows ever shuffle.
- SIMHASH: 64-bit simhash -> 4x16-bit band buckets -> same pattern with
  Hamming verification.

All stages stream; nothing materializes the corpus.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

# deterministic 61-bit universal hash parameters for minhash permutations
_MERSENNE = (1 << 61) - 1


def _hash_params(n_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


_SHINGLE_P = np.uint64(1099511628211)  # FNV-64 prime


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Byte k-shingle 64-bit rolling hashes, fully vectorized (one numpy
    pass per window offset instead of a digest per shingle — ~100x faster
    on long documents). Deterministic across workers."""
    t = " ".join(text.split()).lower()
    if len(t) < k:
        t = t + " " * (k - len(t))
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    n_sh = len(b) - k + 1
    with np.errstate(over="ignore"):
        H = np.zeros(n_sh, dtype=np.uint64)
        for j in range(k):
            H = H * _SHINGLE_P + b[j:j + n_sh].astype(np.uint64)
    return np.unique(H)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 5) -> np.ndarray:
    sh = _shingles(text, k)
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (n_perm, n_shingles) universal hashing, vectorized and CACHE-BLOCKED
    # along the shingle axis (working set per chunk ~128KB, L2-resident —
    # the unblocked (128, n_sh) intermediate streamed ~1MB/doc through
    # memory five times). The reduction mod M = 2^61-1 uses the Mersenne
    # fold in place of integer division: 2^61 ≡ 1 (mod M) so
    # x = hi*2^61 + lo ≡ hi + lo, finished by one conditional subtract
    # (folded value < 2^61 + 7 < 2M). Bit-identical to `% _MERSENNE` on
    # the same wrapped uint64 input (pinned by
    # tests/test_functions.py::test_mersenne_fold_identity); together
    # ~2.6x faster on ~900-shingle documents.
    M = np.uint64(_MERSENNE)
    acc = None
    with np.errstate(over="ignore"):
        for j in range(0, len(sh), 128):
            x = a[:, None] * sh[None, j:j + 128] + b[:, None]
            hi = x >> np.uint64(61)
            x &= M
            x += hi
            np.subtract(x, M, out=x, where=x >= M)
            m = x.min(axis=1)
            acc = m if acc is None else np.minimum(acc, m, out=acc)
    return acc


class MinHashBands:
    """map_batches actor: text -> one output row per LSH band.

    Output: (doc_id, band, bucket) — bucket is a digest of the band's
    signature slice, so the groupby key is 16 bytes regardless of corpus
    size.
    """

    def __init__(self, n_perm: int = 128, bands: int = 16, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id",
                 seed: int = 42) -> None:
        assert n_perm % bands == 0
        self.a, self.b = _hash_params(n_perm, seed)
        self.bands = bands
        self.rows = n_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_ids, out_band, out_bucket = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text or "", self.a, self.b, self.k)
            for band in range(self.bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                bucket = hashlib.blake2b(
                    chunk.tobytes() + band.to_bytes(2, "little"),
                    digest_size=8).hexdigest()
                out_ids.append(doc_id)
                out_band.append(band)
                out_bucket.append(bucket)
        return pa.Table.from_arrays(
            [pa.array(out_ids), pa.array(out_band, pa.int32()),
             pa.array(out_bucket, pa.string())],
            names=[self.id_col, "band", "bucket"])


def candidate_pairs_from_bucket(group: pa.Table,
                                id_col: str = "doc_id",
                                max_bucket: int = 256) -> pa.Table:
    """map_groups kernel over (band, bucket) groups: emit unique candidate
    pairs (a < b).

    Hot-bucket guard: a degenerate bucket (e.g. thousands of empty or
    boilerplate-identical docs sharing one MinHash band) would emit C(n,2)
    pairs from a single group — O(n²) memory and shuffle volume. Above
    ``max_bucket`` members the group degrades to the STAR pattern: every
    member pairs with the bucket's minimum id only. For the dedup use-case
    this preserves the connected near-dup cluster (every duplicate is
    linked to one representative) at O(n) pairs; pairwise similarity within
    the long tail is recoverable transitively."""
    id_type = group.column(id_col).type
    ids = sorted(set(group.column(id_col).to_pylist()))
    a_out, b_out = [], []
    if len(ids) > max_bucket:
        rep = ids[0]
        a_out = [rep] * (len(ids) - 1)
        b_out = ids[1:]
    else:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    # type explicitly: an empty group would otherwise infer null-typed
    # columns, poisoning the schema of downstream hash joins
    return pa.Table.from_arrays(
        [pa.array(a_out, id_type), pa.array(b_out, id_type)],
        names=["id_a", "id_b"])


def add_coarse_bucket_key(batch: pa.Table, chars: int = 2) -> pa.Table:
    """Vectorized coarse group key: the first ``chars`` hex chars of the
    bucket digest. All rows of one (band, bucket) share the same bucket
    string, so a prefix keeps every bucket intact inside one coarse group
    while collapsing the groupby from one-group-per-bucket (mostly
    singletons — ~1 bucket per doc per band) to 16**chars groups."""
    import pyarrow.compute as pc
    gkey = pc.utf8_slice_codeunits(batch.column("bucket"), 0, chars)
    return batch.append_column("gkey", gkey)


def candidate_pairs_coarse(group: pa.Table,
                           id_col: str = "doc_id",
                           max_bucket: int = 256) -> pa.Table:
    """map_groups kernel over COARSE bucket-prefix groups: segment the
    group into its (band, bucket) buckets with one vectorized Arrow
    group_by, then emit pairs only for the (rare) buckets holding >= 2
    distinct ids. Semantics are identical to candidate_pairs_from_bucket
    per bucket (all-pairs below ``max_bucket`` members, STAR pattern
    above); the coarse key exists purely to amortize per-group dispatch —
    a naive groupby((band, bucket)).map_groups pays a Python call per
    bucket, and nearly every bucket is a singleton.

    Memory note for scale: one coarse group materializes all its buckets'
    rows, ~total_banded_rows / 16**chars — raise ``chars`` (via
    add_coarse_bucket_key) with corpus size to keep groups ~1M rows."""
    import pyarrow.compute as pc
    id_type = group.column(id_col).type
    agg = (group.select([id_col, "band", "bucket"])
           .group_by(["band", "bucket"])
           .aggregate([(id_col, "distinct")]))
    ids_col = agg.column(f"{id_col}_distinct")
    hot = agg.filter(pc.greater_equal(pc.list_value_length(ids_col), 2))
    a_out: list = []
    b_out: list = []
    for ids in hot.column(f"{id_col}_distinct").to_pylist():
        ids = sorted(ids)
        if len(ids) > max_bucket:
            rep = ids[0]
            a_out.extend([rep] * (len(ids) - 1))
            b_out.extend(ids[1:])
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
    # type explicitly: an empty group would otherwise infer null-typed
    # columns, poisoning the schema of downstream hash joins
    return pa.Table.from_arrays(
        [pa.array(a_out, id_type), pa.array(b_out, id_type)],
        names=["id_a", "id_b"])


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def byte_jaccard_batch(col_a: pa.ChunkedArray,
                       col_b: pa.ChunkedArray) -> np.ndarray:
    """Row-wise Jaccard similarity of the UTF-8 *byte sets* of two string
    columns — the exact semantics of DuckDB's ``jaccard(s1, s2)`` scalar
    (measured: case-sensitive, byte- not codepoint-level), so query
    results are bit-comparable against a SQL oracle.

    Fully vectorized: every row's bytes are tagged with the row id,
    ``np.unique`` over ``row*256 + byte`` codes yields per-row distinct
    counts via one bincount — no Python loop over rows."""

    def row_set_sizes(*cols) -> np.ndarray:
        bufs, rows = [], []
        n = None
        for col in cols:
            vals = col.to_pylist()
            n = len(vals) if n is None else n
            bufs.extend((v or "").encode("utf-8") for v in vals)
            rows.append(np.fromiter(
                ((len((v or "").encode("utf-8"))) for v in vals),
                dtype=np.int64, count=len(vals)))
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
        lengths = np.concatenate(rows) if len(rows) > 1 else rows[0]
        row_ids = np.repeat(np.tile(np.arange(n, dtype=np.int64), len(cols)),
                            lengths)
        codes = np.unique(row_ids * 256 + data)
        return np.bincount(codes >> 8, minlength=n)

    size_a = row_set_sizes(col_a)
    size_b = row_set_sizes(col_b)
    size_union = row_set_sizes(col_a, col_b)
    inter = size_a + size_b - size_union
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = inter / size_union
    return np.where(size_union > 0, sim, 1.0)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard (the non-hashed exact variant)."""
    def grams(t: str) -> set:
        w = t.split()
        return {tuple(w[i:i + n]) for i in range(max(0, len(w) - n + 1))}
    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


# ------------------------------------------------------------------ simhash

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = (1 << 64) - 1


def _fnv64(w: str) -> int:
    h = _FNV_OFFSET
    for byte in w.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _U64
    return h


def _fnv64_bytes(b: bytes) -> int:
    h = _FNV_OFFSET
    for byte in b:
        h = ((h ^ byte) * _FNV_PRIME) & _U64
    return h


def _fnv64_block(enc: list, lens: "np.ndarray") -> "np.ndarray":
    """Column-wise FNV-1a over one NUL-padded word block (all words of
    comparable length — see _fnv64_words' bucketing)."""
    wb = np.array(enc, dtype=np.bytes_)
    mat = wb.view(np.uint8).reshape(len(enc), wb.dtype.itemsize)
    h = np.full(len(enc), _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    for j in range(mat.shape[1]):
        active = lens > j
        if not active.all():
            if not active.any():
                break
            hj = h[active]
            h[active] = (hj ^ mat[active, j].astype(np.uint64)) * prime
        else:
            h = (h ^ mat[:, j].astype(np.uint64)) * prime
    return h


_FNV_VEC_MAX_LEN = 256          # longer tokens take the scalar path
_FNV_BUCKETS = (8, 16, 32, 64, 128, 256)


def _fnv64_words(words: list[str]) -> "np.ndarray":
    """FNV-1a over a word LIST, vectorized across words: one numpy
    xor-multiply per byte COLUMN, not a Python loop per byte.
    Bit-identical to _fnv64 (uint64 multiply wraps mod 2⁶⁴); pinned by
    the simhash_near_pairs oracle and a parity test.

    Words are BUCKETED by length (powers of two up to 256) before the
    NUL-padded np.bytes_ matrix is built, so padding waste is bounded
    at 2× the actual bytes — without this, one long unbroken token
    (base64 data-URI, minified JS), routine in crawl text, would pad
    EVERY word of the batch to its length (measured: 1000 words + one
    100 KB token → a 100 MB matrix). Tokens over 256 bytes are rare
    enough that they take the scalar per-word path. Lengths come from
    the encodings, not the padding — a str.split() word can still
    CONTAIN a NUL byte."""
    enc = [w.encode("utf-8") for w in words]
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    # offset basis = FNV of the empty string, so zero-length entries
    # (impossible from str.split(), possible for direct callers) are
    # correct without a bucket
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    lo = 0
    for hi in _FNV_BUCKETS:
        sel = np.nonzero((lens > lo) & (lens <= hi))[0]
        if len(sel):
            out[sel] = _fnv64_block([enc[i] for i in sel], lens[sel])
        lo = hi
    for i in np.nonzero(lens > _FNV_VEC_MAX_LEN)[0]:
        out[i] = _fnv64_bytes(enc[i])
    return out


def _simhash_from_hashes(hs: "np.ndarray", starts: "np.ndarray",
                         counts: "np.ndarray") -> "np.ndarray":
    """Per-document 64-bit SimHash from the flat word-hash array:
    unpack bits (little-endian ⇒ column j is bit j), segment-sum the
    per-doc bit tallies with one reduceat, set bit i where the tally
    exceeds half the word count (⇔ v[i] > 0 in the ±1 formulation)."""
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(len(hs), 8), axis=1, bitorder="little")
    out = np.zeros(len(counts), dtype=np.uint64)
    nz = counts > 0
    if nz.any():
        # reduceat misbehaves on empty segments, so sum only non-empty;
        # dtype=int64 accumulates the uint8 bit matrix without an
        # astype copy (the matrix is 64 B/word — the big intermediate)
        sums = np.add.reduceat(bits, starts[nz], axis=0, dtype=np.int64)
        vpos = 2 * sums > counts[nz, None]
        shifts = np.arange(64, dtype=np.uint64)
        out[nz] = (vpos.astype(np.uint64) << shifts[None, :]) \
            .sum(axis=1, dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (FNV-1a word hashes; both the
    word hashing and the bit tally are vectorized numpy passes)."""
    words = text.lower().split()
    if not words:
        return 0
    hs = _fnv64_words(words)
    return int(_simhash_from_hashes(
        hs, np.array([0], np.int64), np.array([len(words)], np.int64))[0])


class SimHashBands:
    """map_batches callable: text -> (doc_id, simhash, band, bucket16).
    4 bands x 16 bits finds all pairs within Hamming distance 3."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        words_per_doc = [(t or "").lower().split() for t in texts]
        counts = np.fromiter((len(w) for w in words_per_doc),
                             dtype=np.int64, count=len(words_per_doc))
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        flat = [w for ws in words_per_doc for w in ws]
        if flat:
            sh = _simhash_from_hashes(_fnv64_words(flat), starts, counts)
        else:
            sh = np.zeros(len(counts), dtype=np.uint64)
        n = len(sh)
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        rep = np.repeat(sh, 4)
        buckets = (rep >> (bands.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        ids = batch.column(self.id_col).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), 4)))
        return pa.Table.from_arrays(
            [ids, pa.array(rep.view(np.int64), pa.int64()),
             pa.array(bands.astype(np.int32), pa.int32()),
             pa.array(buckets.astype(np.int32), pa.int32())],
            names=[self.id_col, "simhash", "band", "bucket"])


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------- pipelines

def exact_dedup_ids(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset -> Dataset[(id_col,)] of surviving ids (min id per distinct
    content). Shuffle key = md5 digest, not the text."""
    from ray.data.aggregate import Min

    def digest(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # string -> binary cast is zero-copy (same UTF-8 buffers): md5
        # hashes the raw bytes without a decode + re-encode round trip
        texts = pc.cast(batch.column(text_col), pa.binary()).to_pylist()
        keys = [hashlib.md5(t or b"").hexdigest() for t in texts]
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), batch.column(id_col)],
            names=["content_key", id_col])

    agg = (ds.map_batches(digest, batch_format="pyarrow")
           .groupby("content_key")
           .aggregate(Min(id_col)))
    min_col = f"min({id_col})"

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([batch.column(min_col)], names=[id_col])

    return agg.map_batches(project, batch_format="pyarrow")


def minhash_dedup_pairs(ds, *, threshold: float = 0.8, n_perm: int = 128,
                        bands: int = 16, shingle_k: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        shuffle_partitions: int | None = None,
                        concurrency=(1, 8), scrub: bool = True):
    """Dataset -> Dataset[(id_a, id_b)] candidate near-dup pairs that passed
    banding (pre-verification). Verification against exact Jaccard happens in
    verify_pairs (needs the texts; at scale, a broadcast side table or a join
    against the hot pair set).

    ``shuffle_partitions`` right-sizes the banding shuffle: the banded rows
    are 3 narrow columns, so inheriting the (wide) input's block count pays
    per-block sort barriers for near-empty blocks. Pass roughly
    input_bytes / 32MB (clamped to >= 8); None keeps the input layout.

    ``scrub=False`` skips the final empty-block repartition (one whole
    shuffle barrier, ~0.3 s of fixed cost at small scale): safe whenever
    the caller consumes the pairs directly (iter/write/aggregate) rather
    than feeding them to a Dataset.join, which is the one consumer that
    rejects the groupby machinery's zero-column empty blocks."""
    from ..stages.task_cache import as_task
    banded = ds.map_batches(
        as_task(MinHashBands, n_perm=n_perm, bands=bands,
                shingle_k=shingle_k, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
    if shuffle_partitions:
        banded = banded.repartition(shuffle_partitions)
    pairs = (banded.map_batches(add_coarse_bucket_key,
                                batch_format="pyarrow")
             .groupby("gkey")
             .map_groups(candidate_pairs_coarse,
                         batch_format="pyarrow"))
    # distinct pairs (same pair can fire in many bands)
    from ray.data.aggregate import Count
    distinct = (pairs.groupby(["id_a", "id_b"]).aggregate(Count())
                .select_columns(["id_a", "id_b"]))
    return _scrub_empty_blocks(distinct) if scrub else distinct


def _scrub_empty_blocks(pairs_ds):
    """Coalesce candidate-pair blocks before they feed a hash join.

    The groupby/map_groups machinery emits EMPTY blocks with a ZERO-COLUMN
    schema, and map_batches skips empty blocks so they cannot be rewritten
    in place; a Dataset.join partition that receives only such blocks has
    no id_a field and Acero rejects the join (observed at 32 CPUs /
    16 join partitions, where 39 of 64 candidate blocks were column-less).
    repartition() concatenates blocks, which unifies them under the real
    schema and drops the degenerate ones. The pair set is tiny by
    construction (banding + bucket caps), so this shuffle is narrow."""
    return pairs_ds.repartition(_default_join_partitions())


def verify_pairs(pairs_ds, texts_ref, *, threshold: float = 0.8,
                 shingle_k: int = 5, metric: str = "jaccard"):
    """Verify candidate pairs against the exact similarity.

    ``texts_ref`` is a ray.ObjectRef to {doc_id: text} — broadcast once and
    read zero-copy by every task. At corpora where the id->text map no
    longer fits one object, replace the broadcast with a hash join of the
    (small) candidate-pair set against the corpus; the banding step already
    reduced candidates to a tiny fraction so that join is narrow.

    Returns Dataset (id_a, id_b, sim) filtered to sim >= threshold.
    """
    class Verify:
        def __init__(self, ref, threshold, shingle_k, metric):
            import ray
            self.texts = ray.get(ref)
            self.threshold = threshold
            self.k = shingle_k
            self.metric = metric

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch.column("id_a").to_pylist()
            b_ids = batch.column("id_b").to_pylist()
            out_a, out_b, out_s = [], [], []
            fn = jaccard if self.metric == "jaccard" else ngram_jaccard
            for a, b in zip(a_ids, b_ids):
                ta = self.texts.get(a)
                tb = self.texts.get(b)
                if ta is None or tb is None:
                    continue
                sim = fn(ta, tb) if self.metric == "ngram" else \
                    jaccard(ta, tb, self.k)
                if sim >= self.threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(round(sim, 6))
            return pa.Table.from_arrays(
                [pa.array(out_a, batch.column("id_a").type),
                 pa.array(out_b, batch.column("id_b").type),
                 pa.array(out_s, pa.float64())],
                names=["id_a", "id_b", "sim"])

    return pairs_ds.map_batches(
        Verify, fn_constructor_kwargs=dict(
            ref=texts_ref, threshold=threshold, shingle_k=shingle_k,
            metric=metric),
        batch_format="pyarrow", concurrency=(1, 4))


def _default_join_partitions() -> int:
    """Hash-join partition count sized to the cluster: the join operator
    allocates one aggregator actor per partition, so partitions far above
    the CPU count starve the rest of the DAG (observed deadlock at
    4 CPUs x 16 partitions). On a multi-node cluster pass an explicit
    num_partitions ~ total cores."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(64, cpus // 2))


def attach_pair_payloads(pairs_ds, ds, *, id_col: str, payload_col: str,
                         num_partitions: int | None = None):
    """Distributed equi-join of a candidate-pair set against the corpus:
    (id_a, id_b) -> (id_a, id_b, __payload_a, __payload_b).

    Two hash joins on id — the scale-safe replacement for broadcasting the
    whole corpus to the verify stage. Each join shuffles the (small) pair
    set plus one (id, payload) projection of the corpus; nothing ever
    materializes on the driver."""
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    side = ds.select_columns([id_col, payload_col])

    def rename_to(name):
        def fn(batch: pa.Table) -> pa.Table:
            cols = [name if c == payload_col else c
                    for c in batch.column_names]
            return batch.rename_columns(cols)
        return fn

    a = pairs_ds.join(side, join_type="inner",
                      num_partitions=num_partitions,
                      on=("id_a",), right_on=(id_col,))
    a = a.map_batches(rename_to("__payload_a"), batch_format="pyarrow")
    # the join operator itself emits zero-column blocks for empty
    # partitions — scrub again before they feed the second join
    a = _scrub_empty_blocks(a)
    ab = a.join(side, join_type="inner", num_partitions=num_partitions,
                on=("id_b",), right_on=(id_col,))
    return ab.map_batches(rename_to("__payload_b"), batch_format="pyarrow")


def near_dup_pairs(ds, *, threshold: float = 0.8, n_perm: int = 128,
                   bands: int = 16, shingle_k: int = 5,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_partitions: int | None = None):
    """Full near-dup pipeline: MinHash banding -> candidate pairs ->
    exact-Jaccard verification. Verification joins the (tiny) candidate
    pair set back against the corpus with two distributed hash joins — no
    driver-side materialization of the corpus on any path."""
    candidates = minhash_dedup_pairs(
        ds, threshold=threshold, n_perm=n_perm, bands=bands,
        shingle_k=shingle_k, text_col=text_col, id_col=id_col)
    paired = attach_pair_payloads(candidates, ds, id_col=id_col,
                                  payload_col=text_col,
                                  num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch.column("id_a").to_pylist()
        b_ids = batch.column("id_b").to_pylist()
        ta = batch.column("__payload_a").to_pylist()
        tb = batch.column("__payload_b").to_pylist()
        out_a, out_b, out_s = [], [], []
        for a, b, x, y in zip(a_ids, b_ids, ta, tb):
            sim = jaccard(x or "", y or "", shingle_k)
            if sim >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_s.append(round(sim, 6))
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["id_a", "id_b", "sim"])

    return paired.map_batches(verify, batch_format="pyarrow")


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)],
                    dtype=np.uint8)


def simhash_near_pairs(ds, *, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id"):
    """All document pairs within SimHash Hamming distance ``max_hamming``.

    For max_hamming <= 3 the 4x16-bit banding is EXHAUSTIVE, not
    approximate: a pair differing in <= 3 of 64 bits leaves at least one
    of the 4 disjoint 16-bit bands identical (pigeonhole), so every
    qualifying pair collides in some bucket — the result is exactly the
    self-join ``bit_count(xor(a, b)) <= max_hamming`` the SQL oracle
    computes.

    Join-free plan (2 shuffles, no broadcast, no materialization): the
    64-bit hash rides along on every band row (+8 bytes/row), so the
    grouped pair kernel verifies Hamming distance inline — no join-back
    to re-attach payloads. A final narrow groupby dedups pairs that fire
    in multiple bands. Buckets get NO star-cap here (a cap would drop
    oracle-true pairs); bucket sizes only degenerate under
    mass-duplicate corpora, which should run exact_dedup first.

    Returns Dataset (id_a, id_b, hamming:int64), id_a < id_b."""
    from ray.data.aggregate import Min

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        n = batch.num_rows
        sims = np.empty(n, dtype=np.uint64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            sims[i] = simhash64(t or "")
        parts = []
        for band in range(4):
            bucket = ((sims >> np.uint64(band * 16)) &
                      np.uint64(0xFFFF)).astype(np.int32)
            parts.append(pa.Table.from_arrays(
                [ids, pa.array(sims.view(np.int64)),
                 pa.array(np.full(n, band, np.int32)), pa.array(bucket),
                 pa.array(bucket & np.int32(255))],
                names=[id_col, "simhash", "band", "bucket", "gkey"]))
        return pa.concat_tables(parts)

    def pair_kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        agg = (group.select([id_col, "simhash", "band", "bucket"])
               .group_by(["band", "bucket"])
               .aggregate([(id_col, "list"), ("simhash", "list")]))
        sizes = pc.list_value_length(agg.column(f"{id_col}_list"))
        hot = agg.filter(pc.greater_equal(sizes, 2))
        a_out: list = []
        b_out: list = []
        h_out: list = []
        for ids, sims in zip(hot.column(f"{id_col}_list").to_pylist(),
                             hot.column("simhash_list").to_pylist()):
            order = np.argsort(np.asarray(ids))
            idv = np.asarray(ids, dtype=np.int64)[order]
            sv = np.asarray(sims, dtype=np.int64)[order].view(np.uint64)
            # pairwise xor-popcount, vectorized over the (tiny) bucket
            x = (sv[:, None] ^ sv[None, :]).view(np.uint8) \
                .reshape(len(sv), len(sv), 8)
            ham = _POPCNT8[x].sum(axis=2).astype(np.int64)
            ai, bi = np.triu_indices(len(sv), k=1)
            keep = ham[ai, bi] <= max_hamming
            a_out.extend(idv[ai[keep]].tolist())
            b_out.extend(idv[bi[keep]].tolist())
            h_out.extend(ham[ai, bi][keep].tolist())
        id_type = group.column(id_col).type
        return pa.Table.from_arrays(
            [pa.array(a_out, id_type), pa.array(b_out, id_type),
             pa.array(h_out, pa.int64())],
            names=["id_a", "id_b", "hamming"])

    pairs = (ds.map_batches(band_rows, batch_format="pyarrow")
             .groupby("gkey")
             .map_groups(pair_kernel, batch_format="pyarrow"))
    # same pair can fire in several bands: one narrow distinct groupby
    # (hamming is identical on every firing, so Min is just projection)
    dedup = (pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming")))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["id_a", "id_b", "hamming"])

    return dedup.map_batches(rename, batch_format="pyarrow")


# --------------------------------------------------- embedding near-dups

class HyperplaneBands:
    """Random-hyperplane LSH over an embedding column: each vector gets
    ``bands`` bucket keys of ``bits`` sign-bits each; cosine-close vectors
    collide in at least one band w.h.p. Deterministic (seeded) projections
    built once per actor."""

    def __init__(self, dim: int, bands: int = 8, bits: int = 12,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((bands, bits, dim))
        self.bands = bands
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        vecs = np.array(batch.column(self.vec_col).to_pylist(),
                        dtype=np.float64)
        out_ids, out_band, out_bucket = [], [], []
        if len(ids):
            for band in range(self.bands):
                signs = (vecs @ self.planes[band].T) > 0  # (n, bits)
                keys = np.packbits(signs, axis=1)
                for i, doc_id in enumerate(ids):
                    out_ids.append(doc_id)
                    out_band.append(band)
                    out_bucket.append(keys[i].tobytes().hex())
        return pa.Table.from_arrays(
            [pa.array(out_ids), pa.array(out_band, pa.int32()),
             pa.array(out_bucket, pa.string())],
            names=[self.id_col, "band", "bucket"])


def embedding_near_dups(ds, *, dim: int, threshold: float = 0.95,
                        bands: int = 8, bits: int = 12,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        num_partitions: int | None = None):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH banding ->
    bucket groupby -> candidate pairs -> exact cosine verify via two
    distributed hash joins of the pair set against the vector table (no
    driver-side materialization). Returns (id_a, id_b, sim)."""
    banded = ds.map_batches(
        HyperplaneBands,
        fn_constructor_kwargs=dict(dim=dim, bands=bands, bits=bits,
                                   vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8))
    pairs = (banded.map_batches(add_coarse_bucket_key,
                                batch_format="pyarrow")
             .groupby("gkey")
             .map_groups(candidate_pairs_coarse,
                         fn_kwargs={"id_col": id_col},
                         batch_format="pyarrow"))
    from ray.data.aggregate import Count
    pairs = (pairs.groupby(["id_a", "id_b"]).aggregate(Count())
             .select_columns(["id_a", "id_b"]))
    pairs = _scrub_empty_blocks(pairs)

    # acero's hash join rejects list<float> payload columns — carry the
    # vectors through the joins as fixed-width binary instead
    def to_bytes(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        return pa.Table.from_arrays(
            [batch.column(id_col),
             pa.array([v.tobytes() for v in vecs], pa.binary())],
            names=[id_col, vec_col])

    vec_bytes = ds.map_batches(to_bytes, batch_format="pyarrow")
    paired = attach_pair_payloads(pairs, vec_bytes, id_col=id_col,
                                  payload_col=vec_col,
                                  num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["id_a", "id_b", "sim"])
        va = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in batch.column("__payload_a").to_pylist()])
        vb = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in batch.column("__payload_b").to_pylist()])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        denom = na * nb
        denom[denom == 0] = np.inf  # zero vectors never match
        sims = np.einsum("ij,ij->i", va, vb) / denom
        keep = sims >= threshold
        return pa.Table.from_arrays(
            [batch.column("id_a").combine_chunks().filter(pa.array(keep))
                  .cast(pa.int64()),
             batch.column("id_b").combine_chunks().filter(pa.array(keep))
                  .cast(pa.int64()),
             pa.array(np.round(sims[keep], 6), pa.float64())],
            names=["id_a", "id_b", "sim"])

    return paired.map_batches(verify, batch_format="pyarrow")


class PlantNearDups:
    """map_batches stage that passes vectors through and, for every
    ``every``-th id, additionally emits a slightly perturbed copy under
    ``id + offset`` — deterministic planted near-duplicates so the LSH ->
    verify pipeline demonstrably finds pairs on corpora with no natural
    near-dups (the driver's synthetic embeddings are mutually near-
    orthogonal). With eps=0.1 the planted pair's cosine is ~0.995."""

    def __init__(self, *, every: int = 20, offset: int = 10_000_000,
                 eps: float = 0.1, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 7) -> None:
        self.every = every
        self.offset = offset
        self.eps = eps
        self.vec_col = vec_col
        self.id_col = id_col
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        vecs = np.array(batch.column(self.vec_col).to_pylist(),
                        dtype=np.float32)
        pick = ids % self.every == 0
        out_ids = list(ids)
        out_vecs = [v for v in vecs]
        for i in np.flatnonzero(pick):
            # per-id deterministic perturbation direction
            rng = np.random.RandomState(self.seed + int(ids[i]))
            d = rng.standard_normal(vecs.shape[1]).astype(np.float32)
            d /= max(1e-9, float(np.linalg.norm(d)))
            v = vecs[i]
            nv = float(np.linalg.norm(v))
            out_ids.append(int(ids[i]) + self.offset)
            out_vecs.append(v + self.eps * nv * d)
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.int64()),
             pa.array([v.tolist() for v in out_vecs],
                      pa.list_(pa.float32()))],
            names=[self.id_col, self.vec_col])


# --------------------------------------------------------------------------
# Connected components over a near-duplicate edge set
# --------------------------------------------------------------------------

def _canonical_edges(edges, id_a: str, id_b: str):
    """(id_a, id_b) -> canonical (u, v) int64 rows with u != v."""
    import pyarrow.compute as pc

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).cast(pa.int64())
        b = batch.column(id_b).cast(pa.int64())
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        return pa.Table.from_arrays([a, b], names=["u", "v"])

    return edges.map_batches(canon, batch_format="pyarrow")


def _uf_components(batch: pa.Table) -> pa.Table:
    """Single-task union-find (min-root) over one edge block."""
    us = batch.column("u").to_pylist()
    vs = batch.column("v").to_pylist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(us, vs):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = sorted(set(us) | set(vs))
    comps = [find(x) for x in nodes]
    return pa.Table.from_arrays(
        [pa.array(nodes, pa.int64()), pa.array(comps, pa.int64())],
        names=["node", "component"])


def connected_components(edges, *, id_a: str = "id_a", id_b: str = "id_b",
                         small_graph_limit: int = 5_000_000,
                         max_rounds: int = 64,
                         shuffle_partitions: Optional[int] = None):
    """Component labels (``node``, ``component``) for every node that
    appears in ``edges``; ``component`` is the minimum node id of the
    component (singletons never appear — callers union them back).

    Scale contract: the edge set is the OUTPUT of near-dup verification —
    orders of magnitude smaller than the corpus — so up to
    ``small_graph_limit`` edges a single union-find task is both correct
    and fastest (one narrow shuffle). Beyond the limit the operator
    switches to the alternating large-star / small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): O(log n) rounds of groupby-min + hash join, every step a
    bounded all-to-all over (int64, int64) rows, no driver
    materialization. Each round materializes its (bounded) edge set —
    the standard checkpoint for iterative dataflow so round k+1 does not
    re-execute rounds 1..k.
    """
    # The edge set is bounded (near-dup verification output, orders of
    # magnitude below corpus size) — checkpoint it once so the path choice
    # count() and the component pass don't re-execute the upstream pair
    # pipeline.
    edges = _canonical_edges(edges, id_a, id_b).materialize()
    n_edges = edges.count()
    parts = shuffle_partitions or _default_join_partitions()
    if n_edges <= small_graph_limit:
        return (edges.repartition(1)
                .map_batches(_uf_components, batch_format="pyarrow",
                             batch_size=None))
    return _star_components(edges, parts, max_rounds)


def _star_components(edges, parts: int, max_rounds: int):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([u, v]), pa.int64()),
             pa.array(np.concatenate([v, u]), pa.int64())],
            names=["u", "v"])

    def directed_down(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(np.maximum(u, v), pa.int64()),
             pa.array(np.minimum(u, v), pa.int64())],
            names=["u", "v"])

    def min_table(ds, include_self: bool):
        m = ds.groupby("u").aggregate(Min("v"))

        def finish(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            mv = batch.column("min(v)").to_numpy(zero_copy_only=False)
            m_ = np.minimum(u, mv) if include_self else mv
            return pa.Table.from_arrays(
                [pa.array(u, pa.int64()), pa.array(m_, pa.int64())],
                names=["u", "m"])

        return m.map_batches(finish, batch_format="pyarrow")

    def distinct(ds):
        d = ds.groupby(["u", "v"]).aggregate(Count())
        return d.map_batches(
            lambda b: b.select(["u", "v"]), batch_format="pyarrow"
        ).repartition(parts)

    def signature(ds) -> tuple:
        def sig(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
            v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (u * np.uint64(1000003) + v) * np.uint64(2654435761)
            return pa.Table.from_arrays(
                [pa.array([len(u)], pa.int64()),
                 pa.array([int(h.sum() % (1 << 62))], pa.int64())],
                names=["n", "h"])
        from ray.data.aggregate import Sum
        row = ds.map_batches(sig, batch_format="pyarrow").aggregate(
            Sum("n"), Sum("h"))
        return (row.get("sum(n)"), row.get("sum(h)"))

    prev_sig = None
    for _ in range(max_rounds):
        # large-star: every neighbor larger than u hangs off u's min
        adj = edges.map_batches(both_dirs, batch_format="pyarrow")
        mins = min_table(adj, include_self=True)
        joined = adj.repartition(parts).join(
            mins.repartition(parts), "inner", parts, on=("u",))

        def ls_emit(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            m = batch.column("m").to_numpy(zero_copy_only=False)
            keep = v > u
            return pa.Table.from_arrays(
                [pa.array(v[keep], pa.int64()),
                 pa.array(m[keep], pa.int64())],
                names=["u", "v"])

        edges = joined.map_batches(ls_emit, batch_format="pyarrow")
        # small-star: all smaller neighbors (and u) hang off the min
        down = edges.map_batches(directed_down, batch_format="pyarrow")
        down = down.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("u"),
                                                  b.column("v")))),
            batch_format="pyarrow")
        mins = min_table(down, include_self=False)
        joined = down.repartition(parts).join(
            mins.repartition(parts), "inner", parts, on=("u",))

        def ss_emit(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            m = batch.column("m").to_numpy(zero_copy_only=False)
            keep = v != m
            return pa.Table.from_arrays(
                [pa.array(v[keep], pa.int64()),
                 pa.array(m[keep], pa.int64())],
                names=["u", "v"])

        part1 = joined.map_batches(ss_emit, batch_format="pyarrow")
        part2 = mins.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("u"), b.column("m")], names=["u", "v"]),
            batch_format="pyarrow")
        edges = distinct(part1.union(part2)).materialize()
        sig = signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    def to_components(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([u, v]), pa.int64()),
             pa.array(np.concatenate([v, v]), pa.int64())],
            names=["node", "component"])

    comp = edges.map_batches(to_components, batch_format="pyarrow")
    from ray.data.aggregate import Count as _Count
    comp = comp.groupby(["node", "component"]).aggregate(_Count())
    return comp.map_batches(lambda b: b.select(["node", "component"]),
                            batch_format="pyarrow")
