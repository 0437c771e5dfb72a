"""Bottom-k quantile sketch: rank-error envelope against the exact
twin, determinism, and small-input degeneracy."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from json_remedy_ray.functions.queries import (
    _QUANTILES,
    docs_length_quantiles,
    docs_length_quantiles_sketch,
)
from json_remedy_ray.stages.sketch import quantiles_bottomk

SF = "/root/testdata/sf0.001"


def test_small_corpus_is_exact(ray_session):
    """k >= corpus size: the 'sample' is the full data, so every
    quantile equals the exact histogram path."""
    exact = docs_length_quantiles(SF).iloc[0]
    sk = docs_length_quantiles_sketch(SF, k=100_000).iloc[0]
    assert sk["sample_size"] == 500
    for q in _QUANTILES:
        assert sk[f"p{int(q * 100)}"] == exact[f"p{int(q * 100)}"]


def test_rank_error_envelope(ray_session):
    """Compressed regime on a large synthetic column: the estimate's
    true rank must be within 5*sqrt(q(1-q)/k) of q (about 4.4 sigma —
    deterministic here since the hash sample is fixed)."""
    n, k = 200_000, 1024
    rng = np.random.default_rng(3)
    vals = rng.lognormal(3.0, 1.0, size=n)      # heavy-tailed domain
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "v": pa.array(vals),
    }))
    est, m = quantiles_bottomk(ds, "doc_id", "v", _QUANTILES, k=k)
    assert m == k
    sv = np.sort(vals)
    for q in _QUANTILES:
        true_rank = np.searchsorted(sv, est[q], side="right") / n
        tol = 5.0 * np.sqrt(q * (1 - q) / k)
        assert abs(true_rank - q) <= tol, (q, true_rank, tol)


def test_deterministic(ray_session):
    a = docs_length_quantiles_sketch(SF, k=64)
    b = docs_length_quantiles_sketch(SF, k=64)
    assert a.equals(b)


def test_empty_input(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.float64()),
    }))
    est, m = quantiles_bottomk(ds, "doc_id", "v", [0.5], k=16)
    assert m == 0 and est[0.5] is None


def test_kmv_tree_merge_matches_flat(ray_session):
    """The KMV bottom-k union is associative: tree-merged sample (many
    blocks, forced intermediate levels) must yield identical quantile
    estimates to the flat driver merge."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_remedy_ray.stages.sketch import quantiles_bottomk

    rng = np.random.default_rng(3)
    t = pa.table({"key": pa.array(np.arange(20000, dtype=np.int64)),
                  "v": pa.array(rng.integers(0, 10**6, 20000))})
    ds = rd.from_arrow(t).repartition(32)
    got, m = quantiles_bottomk(ds, "key", "v", [0.1, 0.5, 0.9], k=512,
                               tree_fanout=4)   # 32 -> 8 -> 2: two levels
    flat, m2 = quantiles_bottomk(ds, "key", "v", [0.1, 0.5, 0.9], k=512,
                                 tree_fanout=10**9)
    assert m == m2 == 512
    assert got == flat
