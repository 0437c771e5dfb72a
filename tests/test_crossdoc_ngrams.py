"""crossdoc_ngram_stats: planted duplicate spans, gram-less docs, and
brute-force parity on a small random corpus."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from json_remedy_ray.stages.dedup import crossdoc_ngram_stats


def _run(texts, n=3, n_buckets=4):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))
    out = crossdoc_ngram_stats(ds, n=n, n_buckets=n_buckets).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _brute(texts, n=3):
    grams = []
    for t in texts:
        toks = t.split()
        grams.append({tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)})
    out = []
    for i, gs in enumerate(grams):
        dup = sum(1 for g in gs
                  if any(g in other for j, other in enumerate(grams) if j != i))
        out.append((i, len(gs), dup))
    return out


def test_planted_shared_span(ray_session):
    texts = ["u1 u2 u3 a b c d", "v1 v2 a b c v3", "w1 w2 w3 w4 w5"]
    out = _run(texts, n=3)
    # "a b c" is the only cross-doc 3-gram
    assert out.loc[0, "dup_grams"] == 1
    assert out.loc[1, "dup_grams"] == 1
    assert out.loc[2, "dup_grams"] == 0
    assert out.loc[0, "n_grams"] == 5


def test_gramless_docs_emit_zero_rows(ray_session):
    texts = ["only two", "", "x y z q"]
    out = _run(texts, n=3)
    assert len(out) == 3
    assert out.loc[0, "n_grams"] == 0          # 2 tokens < n
    assert out.loc[1, "n_grams"] == 0
    assert out.loc[2, "n_grams"] == 2


def test_brute_force_parity_random(ray_session):
    rng = np.random.default_rng(11)
    texts = [" ".join(f"t{rng.integers(0, 12)}"
                      for _ in range(rng.integers(0, 20)))
             for _ in range(60)]
    out = _run(texts, n=3, n_buckets=8)
    want = _brute(texts, n=3)
    got = list(zip(out["doc_id"], out["n_grams"], out["dup_grams"]))
    assert got == want
