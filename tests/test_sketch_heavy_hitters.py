"""Misra-Gries heavy-hitter sketch: MG bounds against the exact
top_tokens_corpus twin, plus a planted-skew recall check."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from json_remedy_ray.functions.queries import top_tokens_corpus, top_tokens_sketch
from json_remedy_ray.stages.sketch import top_tokens_misra_gries

SF = "/root/testdata/sf0.001"


def test_large_k_equals_exact(ray_session):
    """With k larger than the corpus vocabulary no compression ever
    fires, so the sketch IS the exact computation — counts, order and
    undercount bound all match the oracle-backed twin."""
    exact = top_tokens_corpus(SF, k=20)
    sk = top_tokens_sketch(SF, k=100_000, topn=20)
    assert sk["max_undercount"].iloc[0] == 0
    assert list(sk["token"]) == list(exact["token"])
    assert list(sk["est_cnt"]) == list(exact["cnt"])


def test_small_k_bounds_hold(ray_session):
    """Compressed regime: estimates never overcount, true counts sit
    within the reported undercount bound, and the undercount bound is
    within the theoretical N/(k+1)."""
    k = 16                                 # sf0.001 vocab is ~31 tokens
    exact = top_tokens_corpus(SF, k=200)
    truth = dict(zip(exact["token"], exact["cnt"]))
    sk = top_tokens_sketch(SF, k=k, topn=20)
    bound = int(sk["max_undercount"].iloc[0])
    assert bound > 0                       # compression actually fired
    for t, est in zip(sk["token"], sk["est_cnt"]):
        true = truth.get(t)
        if true is None:
            continue                       # truth list truncated at 200
        assert est <= true                 # MG never overcounts
        assert true <= est + bound         # within the reported bound


def test_planted_heavy_hitter_recovered(ray_session):
    """A token holding >25% of a synthetic stream must survive any
    MG-k (k >= 8) merge path and rank first."""
    rng = np.random.default_rng(7)
    docs = []
    for i in range(500):
        toks = [f"w{rng.integers(0, 2000)}" for _ in range(20)]
        toks += ["jackpot"] * 8             # ~28.6% of every doc
        docs.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    out = top_tokens_misra_gries(ds, k=8, topn=5)
    assert out["token"].iloc[0] == "jackpot"
    n_total = 28 * 500
    assert int(out["max_undercount"].iloc[0]) <= n_total  # sane bound
    true_cnt = 8 * 500
    est = int(out["est_cnt"].iloc[0])
    assert est <= true_cnt <= est + int(out["max_undercount"].iloc[0])


def test_tree_merge_preserves_bounds_and_heavy_hitter(ray_session):
    """tree_fanout=2 over ~32 blocks forces several intermediate merge
    levels (round-4): MG mergeability must keep the never-overcount /
    within-bound guarantees and still surface the planted heavy hitter."""
    rng = np.random.default_rng(11)
    docs = []
    for i in range(512):
        toks = [f"w{rng.integers(0, 3000)}" for _ in range(20)]
        toks += ["jackpot"] * 8
        docs.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(32)
    flat = top_tokens_misra_gries(ds, k=8, topn=5, tree_fanout=10**9)
    tree = top_tokens_misra_gries(ds, k=8, topn=5, tree_fanout=2)
    assert tree["token"].iloc[0] == "jackpot" == flat["token"].iloc[0]
    true_cnt = 8 * 512
    est = int(tree["est_cnt"].iloc[0])
    bound = int(tree["max_undercount"].iloc[0])
    assert est <= true_cnt <= est + bound


def test_partial_agg_tree_matches_flat(ray_session):
    """The generic _partial_agg tree level must be output-identical to
    the flat driver merge (sum/min/max are associative)."""
    import pyarrow.compute as pc

    from json_remedy_ray.functions.queries import _partial_agg

    rng = np.random.default_rng(5)
    t = pa.table({"k": pa.array(rng.integers(0, 20, 5000)),
                  "v": pa.array(rng.integers(0, 1000, 5000))})
    ds = rd.from_arrow(t).repartition(40)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("k").aggregate([("v", "sum"), ("v", "min"),
                                           ("v", "max")])
        return g.rename_columns(["k", "s", "mn", "mx"])

    aggs = {"s": "sum", "mn": "min", "mx": "max"}
    flat = (_partial_agg(ds, partial, ["k"], aggs, tree_fanout=10**9)
            .sort_values("k").reset_index(drop=True))
    tree = (_partial_agg(ds, partial, ["k"], aggs, tree_fanout=4)
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(flat, tree)
