"""crawl_delta_per_url: LAG-classification kernel (new/unchanged/changed)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from json_remedy_ray.functions.queries import (
    _DELTA_STATUS,
    crawl_delta_status,
)


def _run(h, urls, ids, ts, content):
    u, i, t, st, _last = crawl_delta_status(
        np.asarray(h, dtype=np.uint64), pa.array(urls),
        np.asarray(ids, dtype=np.int64), np.asarray(ts, dtype=np.int64),
        pa.array(content))
    return pd.DataFrame({
        "url": u.to_pandas(), "doc_id": i, "ts": t,
        "status": _DELTA_STATUS[st],
    }).sort_values(["url", "ts", "doc_id"]).reset_index(drop=True)


def test_statuses_and_ts_tie_breaks_by_id():
    # url a: ts 10 (new), ts 20 same content (unchanged), ts 20 tie ->
    # id order decides which is "previous": id 3 at ts20 comes after
    # id 2 at ts20; url b: single fetch (new)
    out = _run(
        h=[5, 5, 5, 9], urls=["a", "a", "a", "b"], ids=[1, 2, 3, 4],
        ts=[10, 20, 20, 7], content=["x", "x", "y", "z"])
    assert out["status"].tolist() == ["new", "unchanged", "changed", "new"]


def test_collision_run_never_lags_across_urls():
    # two DIFFERENT urls share one 64-bit hash with IDENTICAL content:
    # adjacency would call x@9 "unchanged vs y@6"; the exact re-resolve
    # must classify per url
    out = _run(
        h=[7, 7, 7, 7], urls=["x", "y", "x", "y"], ids=[1, 2, 3, 4],
        ts=[5, 6, 9, 11], content=["c", "c", "d", "c"])
    x = out[out.url == "x"]["status"].tolist()
    y = out[out.url == "y"]["status"].tolist()
    assert x == ["new", "changed"]       # c -> d
    assert y == ["new", "unchanged"]     # c -> c


def test_is_latest_exact_in_collision_runs():
    """A url's LAST fetch flag must survive hash-collision interleaving:
    with urls x and y forged onto one hash, x's fetches straddle y's in
    (ts, id) order, so adjacency alone would flag x@5 latest (its
    neighbor is y's row).  The collision re-resolve must mark exactly
    the true last fetch of each url."""
    h = np.asarray([7, 7, 7, 7], dtype=np.uint64)
    urls, ids = ["x", "y", "x", "y"], np.asarray([1, 2, 3, 4], np.int64)
    ts = np.asarray([5, 6, 9, 11], np.int64)
    _u, i_s, _t, _st, last = crawl_delta_status(
        h, pa.array(urls), ids, ts, pa.array(["c", "c", "d", "c"]))
    latest_ids = sorted(i_s[last].tolist())
    assert latest_ids == [3, 4]          # x's last is id 3, y's is id 4

    # random cross-check: last-per-url == pandas idxmax of (ts, id)
    rng = np.random.RandomState(23)
    n = 2000
    page = rng.randint(0, 150, n)
    urls = [f"u{p}" for p in page]
    ids = np.arange(n, dtype=np.int64)
    ts = rng.randint(0, 30, n).astype(np.int64)
    h = (page % 5).astype(np.uint64)     # heavy planted collisions
    _u, i_s, _t, _st, last = crawl_delta_status(
        h, pa.array(urls), ids, ts,
        pa.array([f"v{b}" for b in rng.randint(0, 2, n)]))
    got = set(i_s[last].tolist())
    df = pd.DataFrame({"url": urls, "doc_id": ids, "ts": ts})
    want = set(df.sort_values(["url", "ts", "doc_id"])
                 .groupby("url")["doc_id"].last().tolist())
    assert got == want


def test_matches_pandas_lag_on_random_input():
    rng = np.random.RandomState(11)
    n = 4000
    page = rng.randint(0, 300, n)
    urls = [f"u{p}" for p in page]
    ids = np.arange(n, dtype=np.int64)
    ts = rng.randint(0, 40, n).astype(np.int64)
    content = [f"v{b}" for b in rng.randint(0, 2, n)]
    # planted collisions: every url hashes into FEW buckets
    h = (page % 7).astype(np.uint64)
    out = _run(h, urls, ids, ts, content)

    df = pd.DataFrame({"url": urls, "doc_id": ids, "ts": ts,
                       "content": content})
    df = df.sort_values(["url", "ts", "doc_id"], kind="stable")
    prev = df.groupby("url")["content"].shift()
    df["status"] = np.where(prev.isna(), "new",
                            np.where(prev == df["content"],
                                     "unchanged", "changed"))
    want = df[["url", "doc_id", "ts", "status"]].sort_values(
        ["url", "ts", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
