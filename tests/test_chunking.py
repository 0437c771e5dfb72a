"""chunk_batch property test: the vectorized gather must equal a
scalar str.split reference for arbitrary (window, stride) and texts
full of edge whitespace (utf8_split_whitespace's str.split parity is
the repo's documented tokenization contract)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from json_remedy_ray.functions.queries import chunk_batch

_ALPHABET = st.sampled_from(list("abz.,!0μ天 \t\n\x1c\x85\xa0"))


def _scalar_chunks(doc_id, text, w, s):
    toks = (text or "").split()
    out, start, no = [], 0, 0
    while start < len(toks):
        c = toks[start:start + w]
        out.append({"doc_id": doc_id, "chunk_no": no,
                    "n_tokens_chunk": len(c), "chunk_text": " ".join(c)})
        no += 1
        start += s
    return out


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet=_ALPHABET, max_size=120)),
                      min_size=0, max_size=10),
       w=st.integers(1, 7), s=st.integers(1, 9))
def test_chunk_batch_matches_scalar(texts, w, s):
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    got = chunk_batch(batch, window=w, stride=s).to_pylist()
    want = [row for i, t in enumerate(texts)
            for row in _scalar_chunks(i, t, w, s)]
    assert got == want


def test_chunk_batch_large_string_and_empty():
    batch = pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "text": pa.array(["one two three four five", ""],
                         type=pa.large_string()),
    })
    got = chunk_batch(batch, window=2, stride=2).to_pylist()
    assert got == [
        {"doc_id": 7, "chunk_no": 0, "n_tokens_chunk": 2,
         "chunk_text": "one two"},
        {"doc_id": 7, "chunk_no": 1, "n_tokens_chunk": 2,
         "chunk_text": "three four"},
        {"doc_id": 7, "chunk_no": 2, "n_tokens_chunk": 1,
         "chunk_text": "five"},
    ]
