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
