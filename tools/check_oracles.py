"""Local emulation of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB
(row count + order-insensitive value comparison after sorting columns by
name). Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame)
    return res


def canon(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    sort_cols = []
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        if len(df) and not isinstance(
                df[c].iloc[0], (list, tuple)) and df[c].dtype != object or (
                len(df) and isinstance(df[c].iloc[0], (str, bytes))):
            sort_cols.append(c)
    if sort_cols:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import numpy as np

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs, sqls = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        if name not in sqls:
            print(f"ok    {name}: rows-only ({len(mine)} rows, cols "
                  f"{list(mine.columns)})")
            continue
        try:
            orc = canon(con.execute(sqls[name]).fetchdf())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL raised {ex}")
            continue
        if list(mine.columns) != list(orc.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(mine.columns)} != "
                  f"{list(orc.columns)}")
            continue
        if len(mine) != len(orc):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(mine)} != {len(orc)}")
            continue
        mismatch = None
        for c in mine.columns:
            a, b = mine[c].to_numpy(), orc[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = np.allclose(a.astype(float), b.astype(float),
                                 rtol=1e-9, atol=1e-9)
            else:
                eq = (a == b).all()
            if not eq:
                mismatch = c
                break
        if mismatch:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch in column {mismatch}")
            print("  mine:", mine.head(3).to_dict("records"))
            print("  orc :", orc.head(3).to_dict("records"))
        else:
            print(f"MATCH {name}: {len(mine)} rows x "
                  f"{len(mine.columns)} cols")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures
                                           else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
