"""DSIR importance weights: batch==scalar parity and directional
semantics (target-domain text must outscore off-domain text)."""

import numpy as np
import pyarrow as pa

from json_remedy_ray.stages.dsir import (
    logratio_micro,
    score_batch,
    token_count_partial,
)


def _fit(texts, is_target):
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts)})
    part = token_count_partial(batch, np.asarray(is_target))
    toks = part["token"].to_pylist()
    ct = np.asarray(part["ct"].to_pylist(), dtype=np.int64)
    ca = np.asarray(part["ca"].to_pylist(), dtype=np.int64)
    wt = logratio_micro(ct, ca)
    return batch, pa.array(toks, type=pa.string()), wt, dict(zip(toks, wt))


def test_scalar_batch_parity():
    texts = ["alpha beta beta gamma", "delta alpha", "beta beta beta",
             "", "gamma gamma delta"]
    batch, vocab, wt, table = _fit(texts, [True, True, False, False, False])
    out = score_batch(batch, vocab, wt)
    for txt, got_s, got_n in zip(texts, out["dsir_micro"].to_pylist(),
                                 out["n_tokens"].to_pylist()):
        toks = [t for t in txt.lower().split() if t]
        assert got_n == len(toks)
        assert got_s == sum(table[t] for t in toks)


def test_target_domain_scores_higher():
    # "wiki wiki cite" dominates target docs; "spam click" the raw pool
    texts = (["wiki cite wiki reference"] * 10
             + ["spam click spam buy spam"] * 30)
    is_target = [True] * 10 + [False] * 30
    batch, vocab, wt, _ = _fit(texts, is_target)
    out = score_batch(batch, vocab, wt)
    s = np.asarray(out["dsir_micro"].to_pylist())
    assert s[:10].min() > s[10:].max()


def test_large_string_corpus_type():
    batch = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                      "text": pa.array(["alpha beta"],
                                       type=pa.large_string())})
    vocab = pa.array(["alpha", "beta"], type=pa.string())
    out = score_batch(batch, vocab, np.array([3, 4], dtype=np.int64))
    assert out["dsir_micro"].to_pylist() == [7]


def test_resample_semantics(ray_session):
    """Docs with non-negative log-weight have p=1 and must ALL be kept;
    kept set is deterministic; p_micro is correctly capped at 1e6."""
    from json_remedy_ray.functions.queries import (
        dsir_importance_weights,
        dsir_resample_documents,
    )

    sf = "/root/testdata/sf0.001"
    scores = dsir_importance_weights(sf).to_pandas()
    kept = dsir_resample_documents(sf).to_pandas()
    pos = set(scores.loc[scores["dsir_micro"] >= 0, "doc_id"])
    assert pos <= set(kept["doc_id"])
    assert (kept["p_micro"] <= 1_000_000).all()
    assert set(kept.loc[kept["dsir_micro"] >= 0, "p_micro"]) == {1_000_000}
    kept2 = dsir_resample_documents(sf).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(kept2["doc_id"])


def test_unknown_token_scores_zero():
    texts = ["alpha beta", "alpha"]
    batch, vocab, wt, _ = _fit(texts, [True, False])
    probe = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                      "text": pa.array(["zzz-unseen zzz-unseen"])})
    out = score_batch(probe, vocab, wt)
    assert out["dsir_micro"].to_pylist() == [0]
    assert out["n_tokens"].to_pylist() == [2]
