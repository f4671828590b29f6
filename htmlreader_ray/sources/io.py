"""Storage shim: Lance when available, Parquet otherwise.

The north rule specifies Lance tables for the interleaved corpus
(BASELINE.json `input_hint`); this sandbox cannot install `lance`/`pylance`
(no network), so every read/write funnels through this one shim: when the
`lance` module is importable, `read_corpus`/`write_corpus` use
`ray.data.read_lance` / `Dataset.write_lance`; otherwise Parquet with the
identical schema. Nothing else in the repo touches the storage format
directly, so enabling Lance is a zero-change drop-in.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

try:
    import lance  # noqa: F401
    HAVE_LANCE = True
except Exception:
    HAVE_LANCE = False


def corpus_format() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def read_corpus(path, *, override_num_blocks: Optional[int] = None,
                columns: Optional[Sequence[str]] = None):
    """path (file, dir, or list) -> ray.data.Dataset of corpus rows."""
    import ray.data
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    if HAVE_LANCE and isinstance(path, str) and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=list(columns) if columns
                                   else None, **kw)
    if columns is not None:
        kw["columns"] = list(columns)
    return ray.data.read_parquet(path, **kw)


def write_corpus(ds, path: str) -> str:
    """Dataset -> storage at path; returns the path written."""
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path)
        return path
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    return path


# ------------------------------------------------- interchange formats
#
# JSONL and CSV are the interchange surface a corpus pipeline meets at
# its edges (raw crawls arrive as JSONL; labels/manifests as CSV). Thin
# wrappers over the native Ray Data readers/writers so every entry point
# in the repo goes through one place — same policy as the Lance shim.

def write_jsonl(ds, path: str) -> str:
    """Dataset -> newline-delimited JSON files under ``path`` (one file
    per block — the same resumable many-files layout as the parquet
    sink)."""
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)
    return path


def read_jsonl(path, *, override_num_blocks: Optional[int] = None):
    """JSONL file/dir -> ray.data.Dataset (Arrow-native JSON reader)."""
    import ray.data
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_json(path, **kw)


def write_csv(ds, path: str) -> str:
    """Dataset -> CSV files under ``path`` (header per file, RFC-4180
    quoting via the Arrow writer)."""
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
    return path


def read_csv(path, *, override_num_blocks: Optional[int] = None):
    """CSV file/dir -> ray.data.Dataset (Arrow CSV reader, schema
    inferred)."""
    import ray.data
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_csv(path, **kw)


def write_orc(ds, path: str) -> str:
    """Dataset -> ORC files under ``path``, one file per block (the same
    resumable many-files layout as the parquet/jsonl sinks). Ray Data
    has no native ORC sink, so each block writes itself inside a
    map_batches task via pyarrow.orc — distributed, no driver
    materialization; the returned manifest (path, rows) is the only
    thing that crosses back."""
    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        from pyarrow import orc
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        f = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(batch, f)
        return pa.table({"path": pa.array([f], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(write_block, batch_size=None,
                   batch_format="pyarrow").materialize()
    return path


def read_orc(path, *, override_num_blocks: Optional[int] = None):
    """ORC dir -> ray.data.Dataset: the file listing streams through
    read_binary_files (one task per file) and each task decodes its ORC
    bytes with pyarrow.orc — a real distributed read, schema preserved
    bit-exactly (ORC round-trips Arrow int/string/timestamp types)."""
    import pyarrow as pa
    import ray.data

    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    files = ray.data.read_binary_files(path, **kw)

    def decode(batch: pa.Table) -> pa.Table:
        import io as _io

        from pyarrow import orc
        tables = [orc.ORCFile(_io.BytesIO(b.as_py())).read()
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(decode, batch_format="pyarrow")


def write_ipc(ds, path: str) -> str:
    """Dataset -> Arrow IPC (Feather V2) files under ``path``, one file
    per block inside map_batches tasks — same distributed sink shape as
    write_orc."""
    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.feather as feather
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        f = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        feather.write_feather(batch, f, compression="uncompressed")
        return pa.table({"path": pa.array([f], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(write_block, batch_size=None,
                   batch_format="pyarrow").materialize()
    return path


def read_ipc(path, *, override_num_blocks: Optional[int] = None):
    """Arrow IPC dir -> ray.data.Dataset, one decode task per file
    (pa.ipc.open_file over the in-memory bytes — IPC is the zero-copy
    wire format, so this is the cheapest of the interchange reads)."""
    import pyarrow as pa
    import ray.data

    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    files = ray.data.read_binary_files(path, **kw)

    def decode(batch: pa.Table) -> pa.Table:
        tables = [pa.ipc.open_file(pa.BufferReader(b.as_py())).read_all()
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(decode, batch_format="pyarrow")
