"""Local emulation of the driver's correctness gate.

Runs every queries() entry against its oracle_sql() (DuckDB over the same
parquet tables), compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_correctness.py [--strict] [sf_dir] [query ...]

--strict additionally compares the ARROW dtypes and bit-exact values of both
sides (columns sorted by name, rows sorted) — a local stand-in for the
driver's value-hash compare, which proved dtype-sensitive in round 1
(user_sessions: int64 vs decimal128 hashed differently while the tolerant
compare passed).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def strict_compare(got_tbl, want_tbl) -> str:
    """Arrow-level dtype + bit-exact value compare (driver-hash stand-in).
    Returns '' when identical, else a description."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        t = t.select(sorted(t.column_names))
        t = t.combine_chunks()
        keys = [(c, "ascending") for c in t.column_names]
        try:
            return t.take(pc.sort_indices(t, sort_keys=keys))
        except pa.ArrowNotImplementedError:
            return t  # unsortable types (lists): compare unsorted
    a, b = norm(got_tbl), norm(want_tbl)
    if a.schema != b.schema:
        return (f"SCHEMA {[(f.name, str(f.type)) for f in a.schema]} vs "
                f"{[(f.name, str(f.type)) for f in b.schema]}")
    if not a.equals(b):
        bad = [c for c in a.column_names
               if not a.column(c).equals(b.column(c))]
        return f"BITS differ in {bad}"
    return ""

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            tbls = [b for b in result.iter_batches(batch_format="pyarrow",
                                                   batch_size=None)]
            if not tbls:
                return pd.DataFrame()
            return pa.concat_tables(
                tbls, promote_options="permissive").to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def to_arrow(result):
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            tbls = [b for b in result.iter_batches(batch_format="pyarrow",
                                                   batch_size=None)]
            if not tbls:
                return pa.table({})
            return pa.concat_tables(tbls, promote_options="permissive")
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result
    return pa.Table.from_pandas(pd.DataFrame(result), preserve_index=False)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got_tbl = to_arrow(fn(sf_dir))
            got = canon(got_tbl.to_pandas())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            continue
        want_tbl = con.sql(sql).arrow()
        want = canon(want_tbl.to_pandas())
        status = "ok"
        if list(got.columns) != list(want.columns):
            status = f"COLS {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS {len(got)} vs {len(want)}"
        else:
            # tolerant float compare, exact otherwise
            mismatch_cols = []
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        import numpy as np
                        if not np.allclose(a.astype(float), b.astype(float),
                                           rtol=1e-9, atol=1e-9):
                            mismatch_cols.append(c)
                    elif not a.astype(str).equals(b.astype(str)):
                        mismatch_cols.append(c)
                except Exception:
                    mismatch_cols.append(c)
            if mismatch_cols:
                status = f"VALUES differ in {mismatch_cols}"
                for c in mismatch_cols[:2]:
                    diff = got[c].astype(str) != want[c].astype(str)
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"   {name}.{c}[{i}] got={got[c][i]!r} "
                              f"want={want[c][i]!r}")
        if status == "ok" and strict:
            s = strict_compare(got_tbl, want_tbl)
            if s:
                status = f"strict: {s}"
        if status != "ok":
            failures += 1
            print(f"FAIL  {name}: {status}")
        else:
            tag = "ok+s " if strict else "ok   "
            print(f"{tag} {name}: {len(got)} rows ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
