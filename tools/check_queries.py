"""Local replica of the driver's correctness gate: run every queries()
entry at a given SF and compare SQL-oracled ones against DuckDB
(row count, column names, order-insensitive value equality)."""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = 0
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"FAIL  unknown query name(s): {unknown}")
            return 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = to_df(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(df)} rows, cols={list(df.columns)} ({dt:.1f}s)")
            continue
        odf = con.execute(sqls[name]).df()
        a, b = norm(df.copy()), norm(odf.copy())
        status = "OK  "
        msgs = []
        if list(a.columns) != list(b.columns):
            status = "FAIL"
            msgs.append(f"cols ray={list(a.columns)} sql={list(b.columns)}")
        elif len(a) != len(b):
            status = "FAIL"
            msgs.append(f"rows ray={len(a)} sql={len(b)}")
        else:
            for c in a.columns:
                av, bv = a[c].values, b[c].values
                # The driver's value hash is dtype-sensitive (round-1 lesson:
                # DuckDB SUM(BIGINT)->HUGEINT->float64 vs engine int64 failed
                # hash_match with identical values). Replicate that here.
                if av.dtype != bv.dtype:
                    status = "FAIL"
                    msgs.append(f"col {c} dtype ray={av.dtype} sql={bv.dtype}")
                    continue
                try:
                    eq = (pd.Series(av) == pd.Series(bv)) | (
                        pd.Series(av).isna() & pd.Series(bv).isna()
                    )
                    if not eq.all():
                        status = "FAIL"
                        bad = (~eq).idxmax()
                        msgs.append(f"col {c} differs at row {bad}: {av[bad]!r} vs {bv[bad]!r}")
                except Exception as exc:  # noqa: BLE001
                    status = "FAIL"
                    msgs.append(f"col {c} compare error {exc}")
        if status != "OK  ":
            failures += 1
        print(f"{status}  {name}: {len(df)} rows ({dt:.1f}s) {'; '.join(msgs)}")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    rc = main(sf, only)
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
