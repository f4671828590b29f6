"""Interchange-format shims (sources/io.py): JSONL and CSV sink+source
round-trips preserve values; CSV restores via explicit casts."""
import shutil
import tempfile

import pyarrow as pa
import ray.data

from htmlreader_ray.sources.io import (read_csv, read_jsonl, write_csv,
                                       write_jsonl)


def _tmp(prefix):
    d = tempfile.mkdtemp(prefix=prefix, dir="/tmp")
    shutil.rmtree(d, ignore_errors=True)
    return d


def test_jsonl_roundtrip_values(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(['plain', 'quote"comma,', 'unié'],
                         pa.string()),
        "n": pa.array([10, -5, 0], pa.int64())})
    out = _tmp("t_jsonl_")
    write_jsonl(ray.data.from_arrow(t), out)
    got = sorted(read_jsonl(out).take_all(), key=lambda r: r["id"])
    assert got == sorted(t.to_pylist(), key=lambda r: r["id"])


def test_csv_roundtrip_values(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(['plain', 'quote"comma,', 'line'],
                         pa.string())})
    out = _tmp("t_csv_")
    write_csv(ray.data.from_arrow(t), out)
    got = sorted(read_csv(out).take_all(), key=lambda r: r["id"])
    assert got == sorted(t.to_pylist(), key=lambda r: r["id"])


def test_orc_roundtrip_unit(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from htmlreader_ray.sources.io import read_orc, write_orc

    t = pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(["x", "y", None], pa.string()),
        "ts": pa.array([1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
    })
    out = str(tmp_path / "orc")
    write_orc(ray.data.from_arrow(t), out)
    back = read_orc(out).take_all()
    got = sorted((r["a"], r["s"], r["ts"]) for r in back)
    want = sorted((r["a"], r["s"], r["ts"]) for r in
                  ray.data.from_arrow(t).take_all())
    assert got == want


def test_ipc_roundtrip_unit(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from htmlreader_ray.sources.io import read_ipc, write_ipc

    t = pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(["x", None, "z"], pa.string()),
    })
    out = str(tmp_path / "ipc")
    write_ipc(ray.data.from_arrow(t), out)
    got = sorted((r["a"], r["s"]) for r in read_ipc(out).take_all())
    assert got == [(1, "x"), (2, None), (3, "z")]
