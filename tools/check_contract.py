"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir alongside
its ``oracle_sql()`` DuckDB query (views pre-registered over the parquet
tables), compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns). Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def dtype_class(dt) -> str:
    """Realized-dtype equivalence class. The driver's hash is dtype-sensitive
    (r04 caught int64-vs-float64 skews the old int→float canon masked), so the
    replica must compare realized pandas dtypes engine-vs-oracle and fail on
    mismatch. Only documented-equivalent realizations share a class:
    int64/Int64 (nullable realization of the same logical type), the datetime
    units, and object-vs-string_view (duckdb .df() may use either)."""
    s = str(dt)
    if s in ("int64", "Int64"):
        return "i64"
    if s in ("int32", "Int32"):
        return "i32"
    if "datetime" in s:
        return "datetime"
    if s in ("object", "string", "large_string[pyarrow]", "string[pyarrow]"):
        return "object"
    return s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("Int64", "Int32"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("float64")
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA got={sorted(got.columns)} want={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    bad_dtypes = [
        (c, str(got[c].dtype), str(want[c].dtype))
        for c in sorted(got.columns)
        if dtype_class(got[c].dtype) != dtype_class(want[c].dtype)
    ]
    if bad_dtypes:
        c, g_dt, w_dt = bad_dtypes[0]
        return f"DTYPE col={c} got={g_dt} want={w_dt} (+{len(bad_dtypes) - 1} more)"
    g, w = canon(got), canon(want)
    for c in g.columns:
        a, b = g[c], w[c]
        if a.dtype.kind == "f":
            ok = np.allclose(a.fillna(-1e18), b.fillna(-1e18), rtol=0, atol=1e-9)
        else:
            ok = (a.fillna("~") == b.fillna("~")).all()
        if not ok:
            i = int(np.argmax(~(a.fillna(-1e18) == b.fillna(-1e18)).to_numpy())) if a.dtype.kind == "f" else int(np.argmax(~(a.fillna("~") == b.fillna("~")).to_numpy()))
            return f"VALUES col={c} row={i} got={a.iloc[i]!r} want={b.iloc[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_ok = n_bad = 0
    import time as _time

    t_start = _time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
            t_ray = _time.perf_counter() - t0
            if name in oracles:
                want = con.sql(oracles[name]).df()
                verdict = compare(name, got, want)
            else:
                verdict = f"ROWS-ONLY n={len(got)}"
            t_all = _time.perf_counter() - t0
            print(f"{name:34s} {t_ray:6.2f}s ray {t_all - t_ray:6.2f}s oracle  {verdict}")
            n_bad += verdict.split()[0] not in ("OK", "ROWS-ONLY")
            n_ok += verdict.split()[0] in ("OK", "ROWS-ONLY")
        except Exception:
            print(f"{name:34s} EXCEPTION")
            traceback.print_exc(limit=4)
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad, total {_time.perf_counter() - t_start:.1f}s")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
