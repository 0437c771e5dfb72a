"""Tests for dedup family, similarity search, textstats, multimodal stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _docs_with_neardups():
    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "to the river where many small animals live in the tall green grass")
    return [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base + " extra"},          # near-dup of 0
        {"doc_id": 2, "text": base.replace("fox", "cat")},  # near-dup of 0
        {"doc_id": 3, "text": "completely different content about compilers and type systems and parsers"},
        {"doc_id": 4, "text": base},                      # exact dup of 0
    ]


def test_minhash_signature_similarity():
    from json_remedy_ray.stages.dedup import _perm_params, minhash_signature

    a, b = _perm_params(64)
    docs = _docs_with_neardups()
    s0 = minhash_signature(docs[0]["text"], a, b)
    s4 = minhash_signature(docs[4]["text"], a, b)
    s3 = minhash_signature(docs[3]["text"], a, b)
    assert (s0 == s4).all()                       # identical docs -> identical sigs
    assert (s0 == s3).mean() < 0.2                # unrelated docs -> low overlap
    # deterministic across calls
    assert (minhash_signature(docs[0]["text"], a, b) == s0).all()


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data as rd

    from json_remedy_ray.stages.dedup import components_from_pairs, minhash_dedup_pairs

    ds = rd.from_items(_docs_with_neardups())
    pairs = minhash_dedup_pairs(ds, threshold=0.7).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 4) in found                        # exact dup always found
    assert (0, 1) in found or (1, 4) in found     # near-dup found
    assert not any(3 in p for p in found)         # unrelated never paired
    mapping = components_from_pairs(pairs)
    dup_of = dict(zip(mapping["doc_id"], mapping["dup_of"]))
    assert dup_of[4] == 0


def test_simhash_neardups(ray_session):
    import ray.data as rd

    from json_remedy_ray.stages.dedup import simhash64, simhash_dedup_pairs

    docs = _docs_with_neardups()
    assert simhash64(docs[0]["text"]) == simhash64(docs[4]["text"])
    ds = rd.from_items(docs)
    pairs = simhash_dedup_pairs(ds, max_hamming=3).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 4) in found
    assert not any(3 in p for p in found)


def test_ngram_jaccard():
    from json_remedy_ray.stages.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e f", "a b c d e x") < 1.0


def test_embedding_neardup_and_ivf(ray_session):
    import ray.data as rd

    from json_remedy_ray.stages.similarity import (
        embedding_neardup_pairs,
        ivf_build,
        ivf_search,
        train_centroids,
    )

    rng = np.random.RandomState(0)
    vecs = rng.randn(60, 16).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype(np.float32)  # planted near-dup
    items = [{"vec_id": i, "embedding": vecs[i]} for i in range(60)]
    ds = rd.from_items(items)

    pairs = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    assert (0, 1) in {tuple(sorted(p)) for p in zip(pairs["vec_a"], pairs["vec_b"])}

    cents = train_centroids(ds, n_centroids=4, sample_rows=60)
    indexed = ivf_build(ds, cents)
    out = ivf_search(indexed, cents, vecs[:2].astype(np.float64), np.array([0, 1]), k=5, nprobe=4)
    # with nprobe == n_centroids the search is exhaustive: query 0's top
    # neighbor must be the planted near-dup 1 and vice versa
    top = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert top[0] == 1 and top[1] == 0


def test_textstats(ray_session):
    import pyarrow as pa

    from json_remedy_ray.stages.textstats import (
        bpeish_token_count,
        textstats_batch,
        winnowed_fingerprints,
    )

    assert bpeish_token_count("hello world, it's 42") >= 5
    fp1 = winnowed_fingerprints("the quick brown fox jumps over the lazy dog")
    fp2 = winnowed_fingerprints("the quick brown fox jumps over the lazy dog")
    assert fp1 == fp2 and len(fp1) > 0
    batch = pa.table({"text": ["hello world", ""]})
    out = textstats_batch(batch)
    assert out["ws_token_count"].to_pylist() == [2, 0]
    import hashlib

    assert out["fingerprint"][0].as_py() == hashlib.md5(b"hello world").hexdigest()


def test_multimodal_stubs(ray_session):
    import pyarrow as pa

    from json_remedy_ray.stages.multimodal import AudioFrameSampleStage, ImageDecodeStage

    batch = pa.table({"payload": [b"fakeimagebytes" * 10, b""]})
    img = ImageDecodeStage()
    out = img(batch)
    assert out["img_width"][0].as_py() >= 16
    assert len(out["img_features"][0].as_py()) == ImageDecodeStage.FEATURE_DIM
    # deterministic fake decode
    out2 = img(batch)
    assert out["img_width"].to_pylist() == out2["img_width"].to_pylist()

    audio = AudioFrameSampleStage()
    aout = audio(batch)
    assert aout["n_frames"][0].as_py() == 4
    assert len(aout["frame_offsets"][0].as_py()) == 4
