"""stages/graph: outlink extraction and integer fixed-point PageRank."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from json_remedy_ray.stages.graph import (
    extract_outlink_anchors,
    extract_outlink_hosts,
    pagerank_refs,
)


def test_extract_skips_relative_and_empty_hosts():
    html = pa.array([
        '<a href="/rel">r</a><a href="https://a.com/x">a</a>'
        '<a href="https://b.net">b</a>',
        "no links at all",
        '<a href="https://">empty</a><a href="https://c.org/y">c</a>',
        None,
        '<a href="https://a.com/1">1</a><a href="https://a.com/2">2</a>',
    ])
    parents, hosts = extract_outlink_hosts(html)
    assert parents.tolist() == [0, 0, 2, 4, 4]
    assert hosts.to_pylist() == ["a.com", "b.net", "c.org", "a.com", "a.com"]


def test_extract_anchors_pairs_host_with_text():
    html = pa.array([
        '<a href="https://a.com/x">first link</a> and '
        '<a href="https://b.net/y">second</a>',
        '<a href="https://c.org/z">no close',     # malformed: dropped
        '<a href="/rel">relative</a>',
        '<a href="https://d.io/q"><img src="i"></a>'
        '<a href="https://e.gov/w">ok</a>',
    ])
    parents, hosts, anchors = extract_outlink_anchors(html)
    # d.io's anchor starts with '<' (an img tag) so the [^<]* capture
    # can't span it — dropped, like the unclosed c.org link
    assert parents.tolist() == [0, 0, 3]
    assert hosts.to_pylist() == ["a.com", "b.net", "e.gov"]
    assert anchors.to_pylist() == ["first link", "second", "ok"]


def _ref_pagerank(edges, iters=5, base=150_000, init=1_000_000):
    """Dense dict-of-dicts reference: exact int arithmetic."""
    agg: dict[tuple[str, str], int] = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0) + w
    outw: dict[str, int] = {}
    for (s, _), w in agg.items():
        outw[s] = outw.get(s, 0) + w
    hosts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    rank = {h: init for h in hosts}
    for _ in range(iters):
        new = {h: base for h in hosts}
        for (s, d), w in agg.items():
            new[d] += (rank[s] * 85 // 100) * w // outw[s]
        rank = new
    return rank


def _run_pagerank(edges, n_blocks, n_buckets, iters=5):
    """Split the edge list into n_blocks blocks (so one src's edges
    span blocks — the cross-block aggregation path) and run the
    exchange implementation."""
    tbls = []
    for i in range(n_blocks):
        chunk = edges[i::n_blocks]
        tbls.append(pa.table({
            "src": pa.array([e[0] for e in chunk], type=pa.string()),
            "dst": pa.array([e[1] for e in chunk], type=pa.string()),
            "w": pa.array([e[2] for e in chunk], type=pa.int64())}))
    refs = [ray.put(t) for t in tbls]
    out = pa.concat_tables(
        ray.get(pagerank_refs(refs, n_buckets=n_buckets, iters=iters)))
    return dict(zip(out["host"].to_pylist(), out["rank_micro"].to_pylist()))


@pytest.mark.parametrize("n_buckets", [1, 3, 8])
def test_pagerank_matches_dense_reference(n_buckets):
    rng = np.random.RandomState(3)
    hosts = [f"h{i}" for i in range(17)]
    edges = []
    for _ in range(200):
        s, d = rng.randint(0, 17, 2)
        if s == d:
            continue
        edges.append((hosts[s], hosts[d], int(rng.randint(1, 4))))
    # a dangling host: receives but never emits
    edges.append(("h0", "sink.example", 5))
    got = _run_pagerank(edges, n_blocks=4, n_buckets=n_buckets)
    want = _ref_pagerank(edges)
    assert got == want


def test_pagerank_dangling_host_keeps_base_plus_inflow():
    # a -> sink only; sink emits nothing, a receives nothing
    edges = [("a", "sink", 1)]
    got = _run_pagerank(edges, n_blocks=1, n_buckets=2, iters=1)
    assert got["a"] == 150_000
    assert got["sink"] == 150_000 + (1_000_000 * 85 // 100)


def test_pagerank_weighted_split():
    # b gets 2/3 of a's damped mass, c gets 1/3 (floor division)
    edges = [("a", "b", 2), ("a", "c", 1)]
    got = _run_pagerank(edges, n_blocks=1, n_buckets=4, iters=1)
    damped = 1_000_000 * 85 // 100
    assert got["b"] == 150_000 + damped * 2 // 3
    assert got["c"] == 150_000 + damped * 1 // 3
