"""Shared mutable dedup index (raw-actor escape hatch) tests."""

import pyarrow as pa

from htmlreader_ray.state.dedup_index import DedupIndex, streaming_exact_dedup


def tbl(ids, texts):
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"])


def test_claim_semantics(ray_session):
    idx = DedupIndex(n_shards=4)
    assert idx.claim_texts(["a", "b", "a"]) == [True, True, False]
    # second call: everything already claimed
    assert idx.claim_texts(["a", "b"]) == [False, False]
    assert idx.total_seen() == 2


def test_streaming_dedup_across_runs(ray_session):
    import ray.data
    idx = DedupIndex(n_shards=4)
    first = ray.data.from_arrow(tbl([1, 2, 3], ["x", "y", "x"]))
    out1 = streaming_exact_dedup(first, idx).take_all()
    texts1 = sorted(r["text"] for r in out1)
    assert texts1 == ["x", "y"]
    # a later run (new dataset, same index) drops everything already seen
    second = ray.data.from_arrow(tbl([4, 5], ["y", "z"]))
    out2 = streaming_exact_dedup(second, idx).take_all()
    assert [r["text"] for r in out2] == ["z"]
    assert idx.total_seen() == 3
