"""BPE tokenizer (stages/bpe.py): trainer semantics, vectorized-apply
parity with the scalar reference, and the pack_sequences token-count
mode."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_remedy_ray.stages.bpe import (
    BPETokenizer,
    _SEED_COUNTS,
    bpe_token_counts_batch,
    default_tokenizer,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def test_train_bpe_classic_example():
    # Sennrich et al. 2016 running example: the most frequent pair in
    # {low:5, lower:2, newest:6, widest:3} char vocab is (e, s) -> es
    merges = train_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3},
                       num_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_train_bpe_deterministic_tiebreak():
    # equal counts: lexicographically smallest pair wins
    merges = train_bpe({"ab": 2, "cd": 2}, num_merges=1)
    assert merges == [("a", "b")]


def test_vectorized_matches_scalar_reference():
    tok = default_tokenizer()
    words = ["table", "merge", "stream", "columnar", "zzzz", "a", "the",
             "café", "sortsort", "windowwindow", "xyzzy", "llll"]
    vec = tok.token_counts(pa.array(words))
    ref = np.array([len(tok.encode_word(w)) for w in words])
    assert (vec == ref).all()


def test_equal_pair_run_greedy_parity():
    # rule (a, a): a run of k 'a's merges at offsets 0,2,4,... so
    # counts are ceil(k/2) after one rule; the vectorized parity mask
    # must match the scalar greedy pass for every run length
    tok = BPETokenizer([("a", "a")])
    words = ["a" * k for k in range(1, 12)]
    vec = tok.token_counts(pa.array(words))
    ref = np.array([len(tok.encode_word(w)) for w in words])
    assert (vec == ref).all()
    assert vec.tolist() == [-(-k // 2) for k in range(1, 12)]


def test_stacked_equal_pair_rules():
    # (a,a)->aa then (aa,aa)->aaaa: 8 a's -> 2 tokens, 6 -> 2, 7 -> 3
    tok = BPETokenizer([("a", "a"), ("aa", "aa")])
    words = ["aaaaaaaa", "aaaaaa", "aaaaaaa"]
    vec = tok.token_counts(pa.array(words))
    ref = np.array([len(tok.encode_word(w)) for w in words])
    assert (vec == ref).all()
    assert vec.tolist() == [2, 2, 3]


def test_duplicate_merged_symbol_asserts():
    # (a,bc) after (b,c), then (ab,c) after (a,b) would both produce
    # 'abc' — the trainer must refuse the ambiguous string space
    with pytest.raises(AssertionError, match="duplicate merged symbol"):
        BPETokenizer([("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")])


def test_batch_counts_and_nonvacuous_vs_ws():
    b = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the fast table scan", None,
                          "merge merge stream"]),
    })
    out = bpe_token_counts_batch(b)
    assert out["n_words"].to_pylist() == [4, 0, 3]
    nb = out["n_bpe_tokens"].to_pylist()
    assert nb[1] == 0
    # BPE counts differ from word counts (merges fired, some words > 1
    # token) — the operator is not the whitespace counter in disguise
    assert nb[0] != 4 and nb[0] >= 4
    tok = default_tokenizer()
    assert len(tok.encode_word("merge")) == 1          # trained merge
    assert nb[2] == 2 * 1 + len(tok.encode_word("stream"))


def test_tokenize_words_matches_scalar_segmentation():
    tok = default_tokenizer()
    words = ["table", "merge", "stream", "aaaa", "café", "a", "windowkey"]
    got = tok.tokenize_words(pa.array(words)).to_pylist()
    want = ["\x1f".join(tok.encode_word(w)) for w in words]
    assert got == want


def test_bpe_tokenize_batch_doc_stream():
    from json_remedy_ray.stages.bpe import bpe_tokenize_batch

    tok = default_tokenizer()
    b = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the fast merge", ""]),
    })
    out = bpe_tokenize_batch(b)
    toks = out["bpe_tokens"].to_pylist()
    want = "\x1f".join(tok.encode_word("the") + tok.encode_word("fast")
                       + tok.encode_word("merge"))
    assert toks == [want, ""]
    assert out["n_bpe_tokens"].to_pylist() == [want.count("\x1f") + 1, 0]


def test_vectorized_matches_scalar_property():
    """Property test: for arbitrary small words over the trained
    alphabet (plus exotic chars), the vectorized flat-array application
    equals the scalar per-word reference — counts AND segmentation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = default_tokenizer()
    alphabet = st.sampled_from(list("abcdefghijklmnopqrstuvwxyz") +
                               ["é", "ß", "中"])
    word = st.text(alphabet=alphabet, min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(word, min_size=1, max_size=20))
    def check(words):
        arr = pa.array(words)
        vec = tok.token_counts(arr)
        ref = np.array([len(tok.encode_word(w)) for w in words])
        assert (vec == ref).all()
        got = tok.tokenize_words(arr).to_pylist()
        want = ["\x1f".join(tok.encode_word(w)) for w in words]
        assert got == want

    check()


def test_pack_sequences_bpe_chunk_rows_invariant(ray_session):
    from json_remedy_ray.functions.queries import pack_sequences_bpe

    a = (pack_sequences_bpe(SF, chunk_rows=32).to_pandas()
         .sort_values(["source", "doc_id"]).reset_index(drop=True))
    b = (pack_sequences_bpe(SF, chunk_rows=1).to_pandas()
         .sort_values(["source", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["bin_id"] > 0).any()                     # multiple bins
