"""Intra-document line dedup: planted-case semantics + collision-run
resolution + contrast with the corpus-wide operator."""

import numpy as np
import pyarrow as pa

from json_remedy_ray.stages.dedup import intradoc_line_dedup_batch


def _run(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    batch = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts)})
    return intradoc_line_dedup_batch(batch)


def test_within_doc_first_occurrence_kept():
    out = _run(["a\nb\na\nc\nb\na"])
    assert out["n_lines"].to_pylist() == [6]
    assert out["n_kept"].to_pylist() == [3]
    assert out["text_dedup"].to_pylist() == ["a\nb\nc"]


def test_cross_doc_lines_never_merge():
    # the SAME line in two docs survives in both (unlike line_dedup)
    out = _run(["x\ny", "x\nz"])
    assert out["text_dedup"].to_pylist() == ["x\ny", "x\nz"]
    assert out["n_kept"].to_pylist() == [2, 2]


def test_interleaved_dup_run_aba():
    # [A, B, A] within one (doc, hash-run) exercises the re-resolve path
    # when A and B hash-adjacent; semantics must hold regardless
    out = _run(["A\nB\nA\nB\nA"])
    assert out["text_dedup"].to_pylist() == ["A\nB"]


def test_empty_and_null_docs():
    batch = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["", None], type=pa.string())})
    out = intradoc_line_dedup_batch(batch)
    # "" splits to one empty line; null fills to "" — identical handling
    assert out["n_lines"].to_pylist() == [1, 1]
    assert out["text_dedup"].to_pylist() == ["", ""]


def test_large_string_corpus_type():
    batch = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                      "text": pa.array(["p\nq\np"], type=pa.large_string())})
    out = intradoc_line_dedup_batch(batch)
    assert out["text_dedup"].to_pylist() == ["p\nq"]


def test_batch_order_and_counts_random(ray_session):
    # deterministic pseudo-random docs: per-doc recompute with a Python
    # set must match the vectorized batch result
    rng = np.random.default_rng(42)
    texts = []
    for _ in range(200):
        lines = [f"line-{rng.integers(0, 8)}" for _ in range(rng.integers(0, 12))]
        texts.append("\n".join(lines))
    out = _run(texts)
    for txt, kept in zip(texts, out["text_dedup"].to_pylist()):
        seen, want = set(), []
        for ln in txt.split("\n"):
            if ln not in seen:
                seen.add(ln)
                want.append(ln)
        assert "\n".join(want) == kept
