"""Regression tests for the third round-3 review pass (the findings the
interrupted end-of-session review surfaced): nullable-int join keys,
non-decimal line-stats thresholds, NULL timestamps in the funnel and the
as-of join.  All four were latent on the shipped testdata (the full
oracle gate passes without them) but bite on inputs the public operator
signatures admit."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_hash_join_nullable_int_key(ray_session):
    """A null in an int key column must not change the bucket of the
    other keys in its block: to_numpy silently promotes the block to
    float64 and the old .view(uint64) hashed float bit patterns —
    breaking co-partitioning against null-free blocks on the other
    side, so matches silently vanished."""
    import ray.data as rd

    from json_remedy_ray.stages.join import hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k2": pa.array([1, 2, 4], type=pa.int64()),
        "w": pa.array([100, 200, 400], type=pa.int64()),
    }))
    out = hash_join(left, right, "k", "k2", n_buckets=4).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 4]
    assert sorted(out["w"].tolist()) == [100, 200, 400]


def test_line_stats_nondecimal_threshold():
    """Thresholds that are not multiples of 0.1 must be exact: with the
    old int(round(frac*10)) scaling, max_ellipsis_frac=0.25 banker's-
    rounded to 2/10 and a doc with 2/9 = 22% ellipsis lines (< 25%) was
    wrongly dropped."""
    from json_remedy_ray.stages.c4 import line_stats_batch

    lines = ["plain line number %d" % i for i in range(7)]
    lines += ["to be continued...", "and more..."]       # 2 of 9 ellipsis
    batch = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["\n".join(lines)]),
    })
    out = line_stats_batch(batch, max_ellipsis_frac=0.25)
    assert out["ellipsis_lines"].to_pylist() == [2]
    assert out["n_lines"].to_pylist() == [9]
    assert out["line_keep"].to_pylist() == [True]        # 2/9 < 1/4
    # and the threshold still binds: 3/9 > 1/4 drops
    batch2 = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["\n".join(lines[:6] + ["x...", "y...", "z..."])]),
    })
    assert line_stats_batch(
        batch2, max_ellipsis_frac=0.25)["line_keep"].to_pylist() == [False]


def test_funnel_null_ts_never_converts(ray_session, tmp_path):
    """SQL semantics for NULL timestamps: a NULL-ts view still counts in
    n_views but never converts (NULL comparisons are never true), and a
    NULL-ts purchase is never a conversion source.  The old int64 view
    of NaT wrapped the subtraction and counted a conversion."""
    from json_remedy_ray.functions.queries import events_funnel_conversion

    d = str(tmp_path / "funnel_null")
    os.makedirs(d)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    nat = np.datetime64("NaT", "us")
    rows = [
        (1, nat, "view"), (1, t0, "purchase"),   # NULL view: counted, no conv
        (2, t0, "view"), (2, nat, "purchase"),   # NULL purchase: no conv
        (3, t0, "view"), (3, t0, "purchase"),    # control: converts
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    out = (events_funnel_conversion(d).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    got = {int(r.user_id): (int(r.n_views), int(r.n_converted_views))
           for r in out.itertuples()}
    assert got == {1: (1, 0), 2: (1, 0), 3: (1, 1)}


def test_asof_join_null_orderdate_never_matches(ray_session, tmp_path):
    """A NULL o_orderdate order must never be a forward-fill source
    (DuckDB ASOF never matches a NULL right-side ts; the replaced
    pandas groupby dropped NaT keys).  The raw int64 view of NaT sorted
    it to the group front and made it matchable."""
    from json_remedy_ray.functions.queries import events_asof_join_orders

    d = str(tmp_path / "asof_null")
    os.makedirs(d)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ev = pa.table({
        "event_id": pa.array([1], type=pa.int64()),
        "ts": pa.array([t0]),
        "user_id": pa.array([7], type=pa.int64()),
        "event_type": ["a"], "value": [1.0], "props": ["{}"],
    })
    pq.write_table(ev, f"{d}/events.parquet")
    orders = pa.table({
        "o_orderkey": pa.array([42], type=pa.int64()),
        "o_custkey": pa.array([7], type=pa.int64()),
        "o_orderdate": pa.array([np.datetime64("NaT", "us")]),
    })
    pq.write_table(orders, f"{d}/orders.parquet")
    out = events_asof_join_orders(d).to_pandas()
    assert len(out) == 1
    assert np.isnan(out.loc[0, "matched_orderkey"])
    assert pa.compute.is_null(pa.array(out["matched_orderdate"]))[0].as_py()
