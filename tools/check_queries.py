"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare against its oracle_sql() via DuckDB
(row count + schema-insensitive sorted-value equality).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rows: ray={len(got)} sql={len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"cols: ray={sorted(got.columns)} sql={sorted(want.columns)}")
        return problems
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gc, wc = g[c], w[c]
            # The driver hashes stringified values, so int64 4059 vs float64
            # 4059.0 is a hard mismatch even when numerically identical —
            # require exact dtype parity so that class can never pass locally
            # (round-1 AND round-2 both shipped uncast HUGEINT oracle sums).
            if gc.dtype != wc.dtype:
                problems.append(
                    f"col {c}: dtype mismatch ray={gc.dtype} sql={wc.dtype}"
                )
                continue
            try:
                if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(wc):
                    ok = (
                        (gc.astype("float64").fillna(-1e308)
                         - wc.astype("float64").fillna(-1e308)).abs() < 1e-9
                    ).all()
                else:
                    ok = (gc.astype(str) == wc.astype(str)).all()
            except Exception as e:
                ok = False
                problems.append(f"col {c}: compare error {e}")
                continue
            if not ok:
                bad = (gc.astype(str) != wc.astype(str))
                i = bad.idxmax() if bad.any() else 0
                problems.append(
                    f"col {c}: first diff at row {i}: ray={gc.iloc[i]!r} sql={wc.iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised: {e}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name} [{dt:.1f}s]: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
