"""Local emulation of the driver's correctness gate.

Runs every queries() entry against its oracle_sql() (DuckDB over the same
parquet tables), compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
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
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            continue
        want = canon(con.sql(sql).df())
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
        if status != "ok":
            failures += 1
            print(f"FAIL  {name}: {status}")
        else:
            print(f"ok    {name}: {len(got)} rows ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
