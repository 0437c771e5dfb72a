"""latest_crawl_per_url: argmax-per-key on the first-occurrence kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa

from json_remedy_ray.stages.dedup import first_occurrence_dups


def _argmax_latest(h, urls, ids, ts):
    order, urls_sorted, dup = first_occurrence_dups(h, urls, -ts, ids)
    keep = ~dup
    return pd.DataFrame({
        "url": urls_sorted.filter(pa.array(keep)).to_pandas(),
        "doc_id": ids[order][keep],
        "ts": ts[order][keep],
    }).sort_values("url").reset_index(drop=True)


def test_negated_key_gives_latest_with_min_id_tiebreak():
    urls = pa.array(["a", "a", "a", "b", "b", "c"])
    ids = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    ts = np.array([10, 30, 30, 7, 5, 1], dtype=np.int64)
    h = np.array([11, 11, 11, 22, 22, 33], dtype=np.uint64)
    out = _argmax_latest(h, urls, ids, ts)
    # a: ts 30 tie between ids 2,3 -> min id 2; b: latest ts 7 -> id 4
    assert out.values.tolist() == [["a", 2, 30], ["b", 4, 7], ["c", 6, 1]]


def test_hash_collision_keeps_urls_separate():
    # two DIFFERENT urls sharing one 64-bit hash must each keep a row
    urls = pa.array(["x", "y", "x", "y"])
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    ts = np.array([5, 6, 9, 2], dtype=np.int64)
    h = np.array([7, 7, 7, 7], dtype=np.uint64)
    out = _argmax_latest(h, urls, ids, ts)
    assert out.values.tolist() == [["x", 3, 9], ["y", 2, 6]]


def test_matches_pandas_groupby_on_random_input():
    rng = np.random.RandomState(7)
    n = 5000
    page = rng.randint(0, 700, n)
    urls = pa.array([f"u{p}" for p in page])
    ids = np.arange(n, dtype=np.int64)
    ts = rng.randint(0, 50, n).astype(np.int64)
    # planted collision: all urls hashed into FEW buckets
    h = (page % 17).astype(np.uint64)
    out = _argmax_latest(h, urls, ids, ts)
    df = pd.DataFrame({"url": [f"u{p}" for p in page], "doc_id": ids,
                       "ts": ts})
    want = (df.sort_values(["url", "ts", "doc_id"],
                           ascending=[True, False, True])
              .groupby("url", as_index=False).first()
              .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out, want[["url", "doc_id", "ts"]], check_dtype=False)
