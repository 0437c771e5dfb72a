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


def test_all_null_group_and_null_type(ray_session, tmp_path):
    """SQL GROUP BY semantics: a type whose users are ALL NULL emits
    (type, 0); a NULL event_type is itself a group."""
    d = str(tmp_path / "ev2")
    os.makedirs(d)
    tbl = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * 6),
        "user_id": pa.array([1, 2, None, None, 7, 7], type=pa.int64()),
        "event_type": pa.array(["a", "a", "ghost", "ghost", None, None]),
        "value": pa.array([0.0] * 6),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    out = distinct_users_by_type(d)
    got = {(None if t is None or t != t else t): int(n)
           for t, n in zip(out["event_type"], out["n_users"])}
    assert got == {"a": 2, "ghost": 0, None: 1}


def test_daily_active_users_null_ts_group(ray_session, tmp_path):
    """DAU: users bucket by event-time day; a NULL ts is its own group
    whose (non-null) users still count."""
    from json_remedy_ray.functions.queries import daily_active_users

    d = str(tmp_path / "ev3")
    os.makedirs(d)
    d1 = np.datetime64("2024-01-01T05:00", "us")
    d2 = np.datetime64("2024-01-02T23:59", "us")
    nat = np.datetime64("NaT", "us")
    tbl = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array([d1, d1, d2, d2, nat, nat]),
        "user_id": pa.array([1, 1, 1, 2, 3, None], type=pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([0.0] * 6),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    out = daily_active_users(d)
    counts = {(None if p != p else str(p)[:10]): int(n)
              for p, n in zip(out["day"], out["n_users"])}
    assert counts == {"2024-01-01": 1, "2024-01-02": 2, None: 1}
