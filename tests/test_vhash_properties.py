"""Property tests for the shared vectorized hashing core (functions/vhash).

Invariants the 100-TB pipelines rely on:
  - slicing invariance: results do not depend on _SLICE_BYTES (batches of
    any size hash identically)
  - order/content determinism: hash depends only on the string bytes
  - window position independence: equal k-byte windows hash equal wherever
    they sit, across documents
  - minhash permutation-min property vs a direct dense computation
  - winnowing matches the scalar specification
  - simhash matches a per-token scalar accumulation
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from json_remedy_ray.functions import vhash

_DOCS = st.lists(st.text(max_size=80), min_size=0, max_size=24)


@st.composite
def _docs_and_slice(draw):
    docs = draw(_DOCS)
    slice_bytes = draw(st.sampled_from([1, 7, 64, 1 << 20]))
    return docs, slice_bytes


@given(_docs_and_slice())
@settings(max_examples=60, deadline=None)
def test_hash_strings_slice_invariance(arg):
    docs, slice_bytes = arg
    col = pa.array(docs, type=pa.string())
    want = vhash.hash_strings(col)
    orig = vhash._SLICE_BYTES
    try:
        vhash._SLICE_BYTES = slice_bytes
        got = vhash.hash_strings(col)
    finally:
        vhash._SLICE_BYTES = orig
    assert (got == want).all()


@given(_docs_and_slice())
@settings(max_examples=60, deadline=None)
def test_rolling_hashes_slice_invariance(arg):
    docs, slice_bytes = arg
    col = pa.array(docs, type=pa.string())
    W0, wo0 = vhash.rolling_hashes(col, 5)
    orig = vhash._SLICE_BYTES
    try:
        vhash._SLICE_BYTES = slice_bytes
        W1, wo1 = vhash.rolling_hashes(col, 5)
    finally:
        vhash._SLICE_BYTES = orig
    assert (wo0 == wo1).all() and (W0 == W1).all()


@given(st.text(max_size=60), st.text(max_size=60))
@settings(max_examples=80, deadline=None)
def test_hash_strings_content_determinism(a, b):
    h = vhash.hash_strings(pa.array([a, b, a], type=pa.string()))
    assert h[0] == h[2]
    if a != b:
        # 64-bit hash: collisions astronomically unlikely on random text
        assert h[0] != h[1]


@given(st.text(min_size=5, max_size=30), st.text(max_size=20), st.text(max_size=20))
@settings(max_examples=60, deadline=None)
def test_window_position_independence(core, pre, post):
    """The same k-byte window hashes identically at any byte offset in any
    document."""
    k = 5
    d1 = pre + core + post
    d2 = "XX" + core
    W, wo = vhash.rolling_hashes(pa.array([d1, d2], type=pa.string()), k)
    b1, b_core, b2 = d1.encode(), core.encode(), d2.encode()
    if len(b_core) < k:
        return
    off1 = len(pre.encode())
    off2 = 2
    w1 = W[wo[0]:wo[1]]
    w2 = W[wo[1]:wo[2]]
    # compare hash of core's FIRST window in both docs
    assert w1[off1] == w2[off2]


@given(st.lists(st.text(min_size=0, max_size=50), min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_minhash_matches_dense(docs):
    from json_remedy_ray.stages.dedup import _perm_params

    a, b = _perm_params(16)
    col = pa.array(docs, type=pa.string())
    W, wo = vhash.rolling_hashes(col, 5)
    sig = vhash.minhash_from_windows(W, wo, a, b)
    a_odd = a | np.uint64(1)
    for d in range(len(docs)):
        ws = W[wo[d]:wo[d + 1]]
        with np.errstate(over="ignore"):
            dense = (a_odd[:, None] * ws[None, :] + b[:, None]).min(axis=1)
        assert (sig[d] == dense).all()


@given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_winnow_matches_scalar_spec(docs):
    col = pa.array(docs, type=pa.string())
    W, wo = vhash.rolling_hashes(col, 8)
    sel, fo = vhash.winnow_positions(W, wo, 4)
    for d in range(len(docs)):
        hs = W[wo[d]:wo[d + 1]]
        out, last = [], -1
        for i in range(max(1, len(hs) - 4 + 1)):
            w = hs[i:i + 4]
            j = i + int(np.argmin(w))
            if j != last:
                out.append(j)
                last = j
        got = (sel[fo[d]:fo[d + 1]] - wo[d]).tolist()
        assert got == out


@given(st.lists(st.text(max_size=50), min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_simhash_matches_scalar_accumulation(docs):
    from json_remedy_ray.stages.dedup import _batch_simhash

    col = pa.array(docs, type=pa.string())
    got = _batch_simhash(col)
    import pyarrow.compute as pc

    for d, t in enumerate(docs):
        toks_list = pc.utf8_split_whitespace(pa.array([t]))
        toks = [x for x in toks_list[0].as_py() if x]
        if not toks:
            assert got[d] == 0
            continue
        th = vhash.hash_strings(pa.array(toks, type=pa.string()))
        acc = np.zeros(64, dtype=np.int64)
        for hv in th:
            for bit in range(64):
                acc[bit] += 1 if (int(hv) >> bit) & 1 else -1
        want = 0
        for bit in range(64):
            if acc[bit] > 0:
                want |= 1 << bit
        assert int(got[d]) == want


def test_popcount_exhaustive_small():
    xs = np.array([0, 1, 2, 3, 0xFF, 1 << 63, (1 << 64) - 1], dtype=np.uint64)
    want = [bin(int(x)).count("1") for x in xs]
    assert vhash.popcount64(xs).tolist() == want
