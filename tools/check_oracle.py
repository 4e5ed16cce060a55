"""Mimic the driver's correctness gate: run every queries() entry at a
given sf and diff it against oracle_sql() via DuckDB.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype family — the driver's value hash is dtype-sensitive
    (int64 vs float64 hash differently even when values are bit-equal),
    so the local gate must FAIL on family disagreement rather than
    coerce both sides like round 2 did (that masking shipped a red
    `climate_indices_events` row)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(mine) != len(oracle):
        return f"ROWS {len(mine)} vs {len(oracle)}"
    for c in sorted(set(mine.columns) & set(oracle.columns)):
        ka, kb = dtype_class(mine[c]), dtype_class(oracle[c])
        if ka != kb:
            return (f"DTYPE col={c}: engine {mine[c].dtype} ({ka}) vs "
                    f"oracle {oracle[c].dtype} ({kb})")
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
        elif pd.api.types.is_datetime64_any_dtype(a[c]):
            # NaT == NaT is False; matched nulls must compare equal
            ok = (av == bv) | (pd.isna(av) & pd.isna(bv))
        else:
            ok = av == bv
        if not np.all(ok):
            i = int(np.nonzero(~ok)[0][0])
            return f"VALUES col={c} row={i}: {av[i]!r} vs {bv[i]!r} ({int((~ok).sum())} diffs)"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("CHECK_CPUS", "8")),
                 include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, ".")
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would print
        # 'all green' for a query that was never checked
        print(f"unknown query names: {sorted(unknown)}")
        sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ENGINE ERROR: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(mine)} rows")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ORACLE ERROR: {type(e).__name__}: {e}")
            continue
        verdict = compare(name, mine, oracle)
        if verdict != "OK":
            failures.append(name)
        print(f"{name:28s} {verdict}  ({len(mine)} rows)")
    ray.shutdown()
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
