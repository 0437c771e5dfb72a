"""Local replica of the driver's correctness gate: run every queries()
entry and compare with its oracle_sql() via DuckDB (row count + schema +
order-insensitive value hash after sorting columns by name).

Usage: python tools/check_oracles.py [sf_dir] [filter]
where filter is a substring, or a comma-separated list of substrings
(a query runs if ANY listed substring matches its name).
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    raise TypeError(type(res))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main(sf_dir: str, only: str | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    wanted = [s for s in (only or "").split(",") if s]
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if wanted and not any(s in name for s in wanted):
            continue
        try:
            got = norm(to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            from json_remedy_ray.functions.queries import ORACLE_NOTES

            note = ORACLE_NOTES.get(name, "UNDOCUMENTED rows-only query")
            print(f"weak  {name}: rows={len(got)} cols={list(got.columns)} "
                  f"(rows-only by construction: {note})")
            n_weak += 1
            continue
        try:
            want = norm(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            diff = None
            for c in got.columns:
                try:
                    if not got[c].equals(want[c]):
                        diff = c
                        break
                except Exception:  # noqa: BLE001
                    diff = c
                    break
            problems.append(f"value hash mismatch (first differing col: {diff})")
            print(got.head(3).to_string(), "\n---\n", want.head(3).to_string())
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(got)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} FAIL")
    return n_fail


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    raise SystemExit(main(sf, only))
