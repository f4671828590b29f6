"""Per-worker task-cache wrapper tests."""

import pyarrow as pa

from htmlreader_ray.stages.task_cache import _WORKER_INSTANCES, as_task


class CountingStage:
    instances = 0

    def __init__(self, tag="x"):
        CountingStage.instances += 1
        self.tag = tag

    def __call__(self, batch):
        return batch.append_column(
            "tag", pa.array([self.tag] * len(batch)))


def test_instance_reused_per_kwargs():
    CountingStage.instances = 0
    _WORKER_INSTANCES.clear()
    fn_a = as_task(CountingStage, tag="a")
    fn_b = as_task(CountingStage, tag="b")
    t = pa.Table.from_arrays([pa.array([1, 2])], names=["x"])
    assert fn_a(t).column("tag").to_pylist() == ["a", "a"]
    assert fn_a(t).column("tag").to_pylist() == ["a", "a"]
    assert fn_b(t).column("tag").to_pylist() == ["b", "b"]
    assert CountingStage.instances == 2  # one per kwargs-key, not per call


def test_entry_staged_corpus_caches(tmp_path, monkeypatch):
    import __ray_entry__ as m
    import os
    p = m._staged_corpus("/root/testdata/sf0.001")
    assert os.path.exists(os.path.join(p, "_done"))
    # second call: instant (cache hit, same path)
    assert m._staged_corpus("/root/testdata/sf0.001") == p
