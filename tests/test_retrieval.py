"""BM25 retrieval tests: scalar-reference parity and determinism."""

import math

import numpy as np
import pyarrow as pa

from json_remedy_ray.stages.retrieval import B, K1, bm25_topk


def _scalar_bm25(docs: list[str], terms: list[str], k: int):
    """Plain-Python reference: same formula, same evaluation order."""
    toks = [d.lower().split() for d in docs]
    n = len(docs)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    scores = []
    for i, t in enumerate(toks):
        s = 0.0
        for term in terms:
            df = sum(1 for tt in toks if term in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            tf = float(t.count(term))
            s = s + idf * (tf * 2.2) / (tf + K1 * (1 - B + B * dl[i] / avgdl))
        scores.append(np.float32(s))
    order = sorted(range(n), key=lambda i: (-scores[i], i))[:k]
    return [(i, scores[i]) for i in order]


def test_bm25_matches_scalar_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = ["data", "merge", "stream", "query", "row", "table", "sort",
             "join", "the", "filter"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
            for _ in range(200)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(200), type=pa.int64()),
        "text": pa.array(docs),
    }))
    terms = ["data", "merge", "query"]
    got = bm25_topk(ds, terms, k=15)
    want = _scalar_bm25(docs, terms, k=15)
    assert list(got["doc_id"]) == [w[0] for w in want]
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  np.array([w[1] for w in want],
                                           dtype=np.float32))


def test_bm25_handles_empty_and_null_docs(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["data data data", "", None, "merge data"],
                         type=pa.string()),
    })
    out = bm25_topk(rd.from_arrow(tbl), ["data"], k=4)
    # empty/null docs score 0 and sort after the hits, ties by doc_id
    assert list(out["doc_id"]) == [0, 3, 1, 2]
    assert out["score"].iloc[0] > out["score"].iloc[1] > 0
    assert out["score"].iloc[2] == 0.0


def test_bm25_k_larger_than_corpus(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([5, 6], type=pa.int64()),
                    "text": pa.array(["data here", "none at all"])})
    out = bm25_topk(rd.from_arrow(tbl), ["data"], k=50)
    assert len(out) == 2
