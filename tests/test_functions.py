"""Training-data function tests: dedup, ANN, text analysis."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from htmlreader_ray.functions import dedup
from htmlreader_ray.functions.text import (fingerprints, lang_id,
                                           quality_scores, token_counts)

SF = "/root/testdata/sf0.001"


def tbl(ids, texts):
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"])


# ------------------------------------------------------------------- text

def test_token_counts():
    out = token_counts(tbl([1, 2, 3], ["a b  c", "", "don't stop, now!"]))
    assert out.column("n_words").to_pylist() == [3, 0, 3]
    assert out.column("n_chars").to_pylist() == [6, 0, 16]
    # GPT-2-style pretokenization: "a", " b", " ", " c" (double space splits)
    assert out.column("n_tokens_bpe").to_pylist()[0] == 4


def test_quality_scores_components():
    out = quality_scores(tbl([1], ["The cat sat on the mat."]))
    row = out.to_pylist()[0]
    assert row["n_words"] == 6
    assert row["n_chars"] == 23
    assert 0 < row["stopword_ratio"] <= 1
    assert 0 <= row["quality_score"] <= 1


def test_lang_id_heuristic():
    out = lang_id(tbl(
        [1, 2, 3, 4, 5],
        ["the cat is on the mat and it is happy",
         "der Hund ist nicht mit der Katze und das ist gut",
         "le chat est dans la maison et il est content avec les autres",
         "el perro es grande y la casa es bonita para los dos",
         "这是一个中文句子"]))
    assert out.column("pred_lang").to_pylist() == ["en", "de", "fr", "es", "zh"]


def test_fingerprints_deterministic():
    a = fingerprints(tbl([1], ["hello"]))
    b = fingerprints(tbl([9], ["hello"]))
    assert a.column("content_md5")[0] == b.column("content_md5")[0]
    assert a.column("rolling_hash")[0] == b.column("rolling_hash")[0]
    import hashlib
    assert a.column("content_md5")[0].as_py() == \
        hashlib.md5(b"hello").hexdigest()


# ------------------------------------------------------------------ dedup

def test_jaccard_and_shingles():
    assert dedup.jaccard("abcdefgh", "abcdefgh") == 1.0
    assert dedup.jaccard("abcdefgh", "zzzzzzzz") == 0.0
    near = dedup.jaccard("the quick brown fox jumps over the lazy dog",
                         "the quick brown fox jumps over the lazy cat")
    assert 0.5 < near < 1.0


def test_ngram_jaccard():
    assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert dedup.ngram_jaccard("a b c d e", "v w x y z") == 0.0


def test_mersenne_fold_identity():
    """minhash_signature's Mersenne fold must be bit-identical to the
    `% (2^61-1)` it replaced, on the same wrapped uint64 inputs —
    signature VALUES are load-bearing (near_dedup_keep's oracle and the
    incremental index both depend on them)."""
    import numpy as np
    M = np.uint64((1 << 61) - 1)
    rng = np.random.RandomState(11)
    xs = rng.randint(0, 2**63, size=500_000, dtype=np.uint64)
    with np.errstate(over="ignore"):
        xs = xs * np.uint64(2654435761) + np.uint64(97)   # wraps
        ref = xs % M
        v = (xs & M) + (xs >> np.uint64(61))
        v = np.where(v >= M, v - M, v)
    assert (ref == v).all()
    edge = np.array([0, 1, (1 << 61) - 2, (1 << 61) - 1, 1 << 61,
                     (1 << 61) + 1, 2 * ((1 << 61) - 1), 2**64 - 1],
                    dtype=np.uint64)
    with np.errstate(over="ignore"):
        f = (edge & M) + (edge >> np.uint64(61))
        f = np.where(f >= M, f - M, f)
    assert (f == edge % M).all()
    # end-to-end: signature for a known text matches the old formula
    a_, b_ = dedup._hash_params(128)
    text = "the quick brown fox jumps over the lazy dog"
    sh = dedup._shingles(text, 5)
    with np.errstate(over="ignore"):
        old = ((a_[:, None] * sh[None, :] + b_[:, None])
               % dedup._MERSENNE).min(axis=1)
    assert (dedup.minhash_signature(text, a_, b_) == old).all()


def test_minhash_similarity_estimates_jaccard():
    a_, b_ = dedup._hash_params(256)
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = "the quick brown fox jumps over the lazy cat " * 5
    s1 = dedup.minhash_signature(t1, a_, b_)
    s2 = dedup.minhash_signature(t2, a_, b_)
    est = (s1 == s2).mean()
    true = dedup.jaccard(t1, t2)
    assert abs(est - true) < 0.15


def test_simhash_near_duplicates_close():
    h1 = dedup.simhash64("the quick brown fox jumps over the lazy dog today")
    h2 = dedup.simhash64("the quick brown fox jumps over the lazy dog t0day")
    h3 = dedup.simhash64("completely different words entirely unrelated set")
    assert dedup.hamming64(h1, h2) < dedup.hamming64(h1, h3)
    assert dedup.simhash64("same text") == dedup.simhash64("same text")


def test_fnv64_vectorized_parity():
    """The column-wise vectorized FNV-1a must stay bit-identical to the
    scalar byte loop — including NUL-containing words (np.bytes_ pads
    with NUL, so lengths must come from the encodings) and multi-byte
    UTF-8."""
    import numpy as np
    words = ["the", "quick", "a", "longerwordhere", "naïve", "日本語",
             "x\x00y", "t0day", "\x00", "z" * 100,
             # bucket boundaries (8/16/32/64/128/256) + the scalar path
             # for >256-byte tokens + the empty-string identity
             "x" * 8, "x" * 9, "y" * 16, "y" * 17, "q" * 256, "q" * 257,
             "B" * 10_000, ""]
    vec = dedup._fnv64_words(words)
    ref = np.array([dedup._fnv64(w) for w in words], dtype=np.uint64)
    assert (vec == ref).all()


def test_fnv64_long_token_does_not_inflate_padding():
    """One long unbroken token (base64 blob, minified JS — routine in
    crawl text) must not set the pad width for the whole batch: words
    are length-bucketed, so peak allocation stays proportional to the
    actual bytes, not max_len × n_words."""
    import tracemalloc
    words = [f"word{i}" for i in range(1000)] + ["B" * 100_000]
    tracemalloc.start()
    dedup._fnv64_words(words)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 5_000_000, peak   # unbucketed: ~100 MB


def test_simhash_bands_vectorized_parity():
    """SimHashBands' batched segment-sum path must agree row-for-row
    with per-doc simhash64 (incl. empty docs → hash 0) and keep the
    int64 two's-complement simhash column and 4×16-bit band buckets."""
    texts = ["alpha beta gamma", "", "x\x00y solo",
             "the quick brown fox jumps over the lazy dog today"]
    batch = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": texts})
    out = dedup.SimHashBands()(batch)
    assert out.num_rows == 16
    for i, text in enumerate(texts):
        sh = dedup.simhash64(text)
        rows = out.filter(pa.compute.equal(out.column("doc_id"), i))
        signed = sh - (1 << 64) if sh >= (1 << 63) else sh
        assert rows.column("simhash").to_pylist() == [signed] * 4
        assert rows.column("bucket").to_pylist() == \
            [(sh >> (b * 16)) & 0xFFFF for b in range(4)]


def test_exact_dedup_ids_ray(ray_session):
    import ray.data
    t = tbl([5, 3, 9, 1, 7], ["dup", "dup", "unique1", "dup", "unique2"])
    ds = ray.data.from_arrow(t)
    out = dedup.exact_dedup_ids(ds).take_all()
    survivors = sorted(r["doc_id"] for r in out)
    assert survivors == [1, 7, 9]  # min id per distinct text


def test_minhash_dedup_pipeline_ray(ray_session):
    import ray.data
    base = "the quick brown fox jumps over the lazy dog and runs far away "
    texts = [base * 4,
             (base * 4)[:-10] + " slightly!",
             "a completely different document about ray data pipelines " * 4,
             base * 4]  # 0,1,3 near/exact dups; 2 distinct
    ds = ray.data.from_arrow(tbl([0, 1, 2, 3], texts))
    pairs = dedup.minhash_dedup_pairs(ds, threshold=0.8).take_all()
    pair_set = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in pair_set
    assert (0, 1) in pair_set or (1, 3) in pair_set
    assert all(2 not in p for p in pair_set)


def test_simhash_near_pairs_exhaustive_ray(ray_session):
    """The banded pipeline must equal the brute-force Hamming<=3
    self-join exactly (the 4x16-bit pigeonhole guarantee the SQL oracle
    relies on)."""
    import itertools
    import ray.data
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    texts = [base,
             base + "mu",                      # 1 extra word: tiny shift
             base + "mu nu",
             "totally unrelated document text about something else " * 8,
             base]                             # exact dup of 0 (hamming 0)
    ids = list(range(len(texts)))
    expected = set()
    hs = [dedup.simhash64(t) for t in texts]
    for i, j in itertools.combinations(ids, 2):
        if dedup.hamming64(hs[i], hs[j]) <= 3:
            expected.add((i, j))
    assert (0, 4) in expected  # non-vacuous: the exact dup qualifies
    ds = ray.data.from_arrow(tbl(ids, texts))
    out = dedup.simhash_near_pairs(ds, max_hamming=3).take_all()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == expected
    for r in out:
        assert r["hamming"] == dedup.hamming64(
            hs[r["id_a"]], hs[r["id_b"]])


# -------------------------------------------------------------------- ann

def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data
    from htmlreader_ray.functions.ann import brute_force_topk
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(emb)
    res = brute_force_topk(ds, query_ids=[0, 1, 2], k=5)
    got = {}
    for r in res.take_all():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    # numpy oracle
    ids = np.array(emb.column("vec_id").to_pylist())
    m = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 1, 2):
        sims = m[ids == q][0] @ m.T
        sims[ids == q] = -np.inf
        order = np.lexsort((ids, -sims))[:5]
        want = [int(ids[j]) for j in order]
        have = [v for _, v in sorted(got[q])]
        assert have == want


def test_ivf_recall_reasonable(ray_session):
    import ray.data
    from htmlreader_ray.functions.ann import brute_force_topk, ivf_topk
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(emb)
    exact = brute_force_topk(ds, query_ids=[0, 1], k=5).take_all()
    approx = ivf_topk(ds, query_ids=[0, 1], k=5, n_centroids=8,
                      nprobe=4).take_all()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # nprobe=4 of 8 buckets


def test_near_dup_pairs_verified(ray_session):
    import ray.data
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the woods ")
    texts = [base * 3,
             base * 3 + "tail change",
             "an entirely different document about streaming engines " * 3,
             base * 3]
    ds = ray.data.from_arrow(tbl([0, 1, 2, 3], texts))
    out = dedup.near_dup_pairs(ds, threshold=0.8).take_all()
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in out}
    assert pairs.get((0, 3)) == 1.0
    assert all(2 not in p for p in pairs)
    assert all(sim >= 0.8 for sim in pairs.values())


def test_embedding_near_dups_planted(ray_session):
    import ray.data
    rng = np.random.RandomState(7)
    dim = 16
    base = rng.standard_normal(dim)
    vecs = [base,
            base + 0.01 * rng.standard_normal(dim),   # near-dup of 0
            rng.standard_normal(dim),
            -base]                                    # anti-correlated
    t = pa.Table.from_arrays(
        [pa.array([0, 1, 2, 3], pa.int64()),
         pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    ds = ray.data.from_arrow(t)
    out = dedup.embedding_near_dups(ds, dim=dim, threshold=0.95).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_media_features_deterministic(ray_session):
    import ray.data
    from htmlreader_ray.stages.media import MediaFeatures
    t = pa.Table.from_arrays(
        [pa.array(["d1", "d2"]), pa.array(["media://a.png", "media://b.png"])],
        names=["doc_id", "media_ref"])
    mf = MediaFeatures(dim=8)
    out1, out2 = mf(t), mf(t)
    assert out1.column("features").to_pylist() == \
        out2.column("features").to_pylist()
    v = np.array(out1.column("features").to_pylist()[0])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_media_frame_sample_fanout():
    from htmlreader_ray.stages.media import MediaFrameSample
    t = pa.Table.from_arrays(
        [pa.array(["d1"]), pa.array(["media://vid/x.mp4"])],
        names=["doc_id", "media_ref"])
    out = MediaFrameSample(fps_target=1.0, max_frames=4)(t)
    assert out.num_rows >= 1
    assert out.column("frame_idx").to_pylist() == list(range(out.num_rows))
    ts = out.column("frame_ts_ms").to_pylist()
    assert ts == sorted(ts)


def test_stubbed_decode_marker_propagates_end_to_end(ray_session):
    """With no codec library in the container, every row produced by the
    stubbed decode stages must carry decoded=False all the way through
    the driver-facing queries (media_features, media_frames) — the stub
    is declared in-band, not only in docstrings (VERDICT r3 item 7)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()
    for name in ("media_features", "media_frames"):
        ds = qs[name]("/root/testdata/sf0.001")
        seen = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            assert "decoded" in b.column_names, name
            vals = set(b.column("decoded").to_pylist())
            assert vals == {False}, (name, vals)
            seen += len(b)
        assert seen > 0, name


# ----------------------------------------------- scale-path regressions


def test_hot_bucket_star_cap():
    """A degenerate bucket (10k identical docs in one LSH bucket) must not
    emit C(n,2) pairs — above max_bucket it degrades to the O(n) star."""
    n = 10_000
    g = pa.Table.from_arrays(
        [pa.array(list(range(n)), pa.int64()),
         pa.array([0] * n, pa.int32()),
         pa.array(["deadbeef"] * n, pa.string())],
        names=["doc_id", "band", "bucket"])
    out = dedup.candidate_pairs_from_bucket(g)
    assert len(out) == n - 1  # star to the min id, not ~50M pairs
    assert set(out.column("id_a").to_pylist()) == {0}
    # below the cap: full pairs
    small = pa.Table.from_arrays(
        [pa.array([5, 9, 1], pa.int64()), pa.array([0, 0, 0], pa.int32()),
         pa.array(["x"] * 3, pa.string())],
        names=["doc_id", "band", "bucket"])
    out = dedup.candidate_pairs_from_bucket(small)
    assert sorted(zip(out.column("id_a").to_pylist(),
                      out.column("id_b").to_pylist())) == \
        [(1, 5), (1, 9), (5, 9)]


def test_candidate_pairs_coarse_matches_per_bucket():
    """The coarse-group kernel (bucket-prefix groupby + vectorized bucket
    segmentation) emits exactly the per-bucket kernel's pairs — including
    the >max_bucket STAR degradation, duplicate input rows, and the
    hyperplane case of one bucket string appearing in two bands."""
    import random

    import pyarrow.compute as pc

    rng = random.Random(7)
    rows = []
    for _ in range(300):
        bucket = f"{rng.getrandbits(64):016x}"
        band = rng.randrange(16)
        for i in rng.sample(range(100000), rng.choice([1, 1, 1, 2, 3])):
            rows.append((i, band, bucket))
    # hot bucket above the star cap
    rows += [(i, 3, "deadbeef" * 2)
             for i in rng.sample(range(100000, 200000), 300)]
    rows += rows[:40]                       # duplicate (id, band, bucket)
    rows += [(1, 0, "aa" * 8), (2, 0, "aa" * 8),
             (3, 1, "aa" * 8), (4, 1, "aa" * 8)]   # same bucket, two bands
    rng.shuffle(rows)
    t = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int32()),
         pa.array([r[2] for r in rows], pa.string())],
        names=["doc_id", "band", "bucket"])

    import collections
    groups = collections.defaultdict(list)
    for i, (_, b, bk) in enumerate(rows):
        groups[(b, bk)].append(i)
    want = set()
    for idxs in groups.values():
        out = dedup.candidate_pairs_from_bucket(t.take(pa.array(idxs)))
        want |= set(zip(out.column("id_a").to_pylist(),
                        out.column("id_b").to_pylist()))

    t2 = dedup.add_coarse_bucket_key(t)
    got = set()
    for g in pc.unique(t2.column("gkey")).to_pylist():
        out = dedup.candidate_pairs_coarse(
            t2.filter(pc.equal(t2.column("gkey"), g)))
        got |= set(zip(out.column("id_a").to_pylist(),
                       out.column("id_b").to_pylist()))
    assert got == want and len(got) > 500


def test_minhash_identical_flood_finishes(ray_session):
    """End-to-end skew guard: thousands of identical docs pass through
    banding + pair expansion without a pair explosion."""
    import ray.data
    n = 3000
    ds = ray.data.from_arrow(tbl(list(range(n)), ["same text here"] * n))
    pairs = dedup.minhash_dedup_pairs(ds).take_all()
    assert 0 < len(pairs) <= n  # star pattern: linear, not quadratic
    assert {r["id_a"] for r in pairs} == {0}


def test_plant_near_dups_stage():
    rng = np.random.RandomState(0)
    t = pa.Table.from_arrays(
        [pa.array([0, 1, 20, 21], pa.int64()),
         pa.array([rng.standard_normal(8).tolist() for _ in range(4)],
                  pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    out = dedup.PlantNearDups(every=20, offset=100, eps=0.1)(t)
    ids = out.column("vec_id").to_pylist()
    assert ids == [0, 1, 20, 21, 100, 120]
    vecs = np.array(out.column("embedding").to_pylist())
    for base, planted in ((0, 4), (2, 5)):
        a, b = vecs[base], vecs[planted]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99


def test_scale_paths_never_materialize_corpus():
    """The distributed verify/join paths must not driver-materialize the
    corpus: no take_all in the scale-path function sources (round-1
    verdict item 3)."""
    import inspect
    from htmlreader_ray.functions import windows
    for fn in (dedup.near_dup_pairs, dedup.embedding_near_dups,
               dedup.attach_pair_payloads, dedup.minhash_dedup_pairs,
               dedup.exact_dedup_ids, windows.asof_join_partitioned,
               windows.session_windows, windows.tumbling_window_agg):
        src = inspect.getsource(fn)
        assert "take_all" not in src, fn.__name__
        assert "to_pandas" not in src, fn.__name__


def test_image_header_roundtrip():
    """Payload builders produce bytes whose REAL header parse recovers the
    exact dimensions (PNG IHDR / GIF LSD / JPEG SOF scan)."""
    from htmlreader_ray.sources.payloads import make_image
    from htmlreader_ray.stages.media import parse_image_header
    for fmt in ("png", "gif", "jpeg"):
        for w, h in ((1, 1), (16, 79), (640, 480), (65535, 2)):
            got = parse_image_header(make_image(fmt, w, h))
            assert got == (fmt, w, h), (fmt, w, h, got)
    # BMP (little-endian signed dims) and WEBP (VP8L 14-bit bitfield);
    # WEBP dimensions cap at 2^14
    for fmt in ("bmp", "webp"):
        for w, h in ((1, 1), (16, 79), (640, 480), (16384, 2)):
            got = parse_image_header(make_image(fmt, w, h))
            assert got == (fmt, w, h), (fmt, w, h, got)
    # malformed / non-image inputs never crash
    for junk in (None, b"", b"\x89PNG\r\n\x1a\n", b"GIF89", b"\xff\xd8",
                 b"\xff\xd8\xff\xfe\x00\x02", b"plain text bytes"):
        assert parse_image_header(junk) is None or isinstance(
            parse_image_header(junk), tuple)


def test_media_decode_real_vs_stub():
    from htmlreader_ray.sources.payloads import make_png
    from htmlreader_ray.stages.media import MediaDecode
    t = pa.Table.from_arrays(
        [pa.array(["d1", "d2"], pa.string()),
         pa.array(["media://a.png", "media://b.png"], pa.string()),
         pa.array([make_png(33, 44), None], pa.binary())],
        names=["doc_id", "media_ref", "payload"])
    out = MediaDecode(payload_col="payload")(t)
    metas = out.column("meta").to_pylist()
    assert metas[0]["decoded"] is True
    assert (metas[0]["width"], metas[0]["height"]) == (33, 44)
    assert metas[1]["decoded"] is False  # no payload -> stub path


def test_wav_header_roundtrip():
    from htmlreader_ray.sources.payloads import make_wav
    from htmlreader_ray.stages.media import parse_audio_header
    for ms in (0, 125, 1000, 60_000):
        assert parse_audio_header(make_wav(ms)) == ("wav", ms)
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert parse_audio_header(b"not audio") is None
    # MediaDecode routes a WAV payload to a real audio decode
    from htmlreader_ray.stages.media import MediaDecode
    import pyarrow as pa
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "media_ref": ["clip.wav"],
                  "payload": pa.array([make_wav(2500)], pa.binary())})
    out = MediaDecode(payload_col="payload")(t)
    meta = out.column("meta").to_pylist()[0]
    assert meta["media_type"] == "audio" and meta["format"] == "wav"
    assert meta["duration_ms"] == 2500 and meta["decoded"] is True


def test_quantize_embeddings_matches_naive():
    import math
    import numpy as np
    import pyarrow as pa
    from htmlreader_ray.functions.ann import quantize_embeddings_batch
    vecs = [[0.5, -1.0, 0.25], [0.0, 0.0, 0.0], [3.0, 3.0, -3.0],
            [1e-8, -2e-8, 0.0]]
    b = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = quantize_embeddings_batch(b).to_pylist()
    for row, vec in zip(out, vecs):
        v = [float(np.float32(x)) for x in vec]
        m = max(abs(x) for x in v)
        if m == 0:
            assert row["qvec"] == ",".join("0" for _ in v)
            assert row["scale_e9"] == 0
            continue
        scale = 127.0 / m
        want = [math.floor(x * scale + 0.5) for x in v]
        assert row["qvec"] == ",".join(map(str, want))
        assert row["scale_e9"] == math.floor(1000000000 * scale + 0.5)
        # int8 range contract
        assert all(-128 <= q <= 127 for q in want)


# ------------------------------------------------------------------ fuzzy

def test_fuzzy_levenshtein_kernel():
    """The vectorized DP must equal the classic scalar recurrence."""
    from htmlreader_ray.functions.fuzzy import FuzzyProbeMatch
    import numpy as np

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    words = ["cold widget", "small bolt", "", "x", "cald gear",
             "old gear", "a completely different long string"]
    t = pa.table({"p_partkey": pa.array(range(len(words)), pa.int64()),
                  "p_name": pa.array(words)})
    probes = ["cald gear", "small bol", ""]
    out = FuzzyProbeMatch(probes, max_dist=2)(t)
    got = {(r["p_partkey"], r["probe"]): r["dist"]
           for r in out.to_pylist()}
    expected = {}
    for i, w in enumerate(words):
        for p in probes:
            d = lev(w, p)
            if d <= 2:
                expected[(i, p)] = d
    assert got == expected


def test_media_resize_exact_nn():
    """MediaResize must implement out[i,j] = src[(i*H)//oh, (j*W)//ow]
    exactly — checked against a naive double loop, up- and downscale."""
    import numpy as np
    import pyarrow as pa
    from htmlreader_ray.stages.media import MediaResize

    rng = np.random.default_rng(3)
    cases = [(5, 7), (32, 32), (64, 17), (1, 1), (48, 3)]
    st = MediaResize(out_w=8, out_h=6)
    payloads, ws, hs = [], [], []
    for w, h in cases:
        payloads.append(rng.integers(0, 256, w * h, np.uint8).tobytes())
        ws.append(w)
        hs.append(h)
    batch = pa.table({"doc_id": pa.array(range(len(cases)), pa.int64()),
                      "payload": pa.array(payloads, pa.binary()),
                      "width": pa.array(ws, pa.int64()),
                      "height": pa.array(hs, pa.int64())})
    out = st(batch)
    for r, (w, h) in enumerate(cases):
        src = np.frombuffer(payloads[r], np.uint8).reshape(h, w)
        ref = np.array([[src[(i * h) // 6, (j * w) // 8]
                         for j in range(8)] for i in range(6)], np.uint8)
        got = np.frombuffer(out.column("resized")[r].as_py(),
                            np.uint8).reshape(6, 8)
        assert (got == ref).all(), (w, h)
        assert out.column("checksum")[r].as_py() == int(ref.sum())
    assert out.column("out_w").to_pylist() == [8] * len(cases)


def test_lang_id_exact_integer_contract():
    from htmlreader_ray.functions.text import lang_id_exact
    out = lang_id_exact(tbl(
        [1, 2, 3, 4],
        ["the cat is on the mat and it is happy",
         "这是一个中文句子",
         "zz yy xx ww",              # no profile hits -> und, conf 0
         "the " + "x " * 96]))       # 97 words, 1 hit -> floor test
    assert out.column("pred_lang").to_pylist() == ["en", "zh", "und", "und"]
    confs = out.column("conf_e6").to_pylist()
    assert out.column("conf_e6").type.equals(__import__("pyarrow").int64())
    assert confs[1] == 1_000_000
    assert confs[2] == 0
    # 1 hit / 97 words: floor(1e6/97 + 0.5) = 10309; 50*1 < 97 -> und
    assert confs[3] == (2_000_000 * 1 + 97) // (2 * 97) == 10309
    # acceptance boundary: exactly 2% (1 hit / 50 words) is ACCEPTED
    out2 = lang_id_exact(tbl([1], ["the " + "x " * 49]))
    assert out2.column("pred_lang").to_pylist() == ["en"]


def test_grouped_zscore_outliers_matches_brute(ray_session):
    """Exact moment merge + IEEE flag vs a brute-force replay, plus
    partition invariance and the var<=0 degenerate group (all-equal
    values -> std 0 -> every row flagged unless exactly at the mean)."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from htmlreader_ray.functions.stats import grouped_zscore_outliers

    rng = np.random.default_rng(21)
    n = 300
    grp = ["a" if i % 3 else "b" for i in range(n - 4)] + ["c"] * 4
    val = list(rng.exponential(5.0, size=n - 4)) + [2.5] * 4
    t = pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "event_type": pa.array(grp),
                  "value": pa.array(val, pa.float64())})
    vq = [math.floor(v * 1000 + 0.5) for v in val]
    want = set()
    for g in set(grp):
        idx = [i for i in range(n) if grp[i] == g]
        cnt, s1, s2 = len(idx), sum(vq[i] for i in idx), \
            sum(vq[i] * vq[i] for i in idx)
        mean = float(s1) / cnt
        var = float(s2) / cnt - mean * mean
        std = math.sqrt(var) if var > 0 else 0.0
        want |= {i for i in idx if abs(float(vq[i]) - mean) > 3.0 * std}
    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        got = {r["event_id"] for r in grouped_zscore_outliers(
            ds, group_col="event_type", value_col="value",
            id_col="event_id", sigma=3.0).take_all()}
        assert got == want, parts
    # group c: all values identical -> zero std, nothing beyond the mean
    assert not any(grp[i] == "c" for i in want)
    assert want  # non-vacuous on the exponential tail
