"""Grouped exact COUNT DISTINCT via the bucket exchange: NULL-user
exclusion (SQL semantics) and duckdb parity on a planted table."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from json_remedy_ray.functions.queries import distinct_users_by_type


def test_null_users_excluded_and_counts_exact(ray_session, tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    rng = np.random.default_rng(5)
    n = 5000
    types = rng.choice(["a", "b", "c"], size=n)
    users = rng.integers(0, 200, size=n).astype("float64")
    users[rng.random(n) < 0.05] = np.nan          # planted NULL users
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * n),
        "user_id": pa.array([None if np.isnan(u) else int(u)
                             for u in users], type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    out = distinct_users_by_type(d)
    got = dict(zip(out["event_type"], out["n_users"]))
    valid = ~np.isnan(users)
    want = {t: len(set(users[valid & (types == t)].astype(int)))
            for t in ["a", "b", "c"]}
    assert got == want
