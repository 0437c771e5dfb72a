"""C4/Gopher-style quality heuristics — stateless vectorized map_batches.

New design (not in the reference; SURVEY §2.9 graft extensions).  Rules
follow the published C4 (Raffel et al. 2020) and Gopher (Rae et al.
2021) heuristic families: word counts, mean word length, symbol ratios,
alpha ratio, stopword presence, duplicate-line fraction.

Everything is computed with numpy over the batch; the only per-row
Python is a single pre-tokenized pass that fills numpy arrays (string
tokenization has no Arrow kernel; the loop body is C-level str ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it that this for on with as at by".split()
)

_HEURISTIC_COLS = [
    ("word_count", pa.int32()),
    ("mean_word_len", pa.float32()),
    ("alpha_ratio", pa.float32()),
    ("symbol_word_ratio", pa.float32()),
    ("stopword_hits", pa.int32()),
    ("dup_line_frac", pa.float32()),
]


def heuristics_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    n = len(texts)
    word_count = np.zeros(n, dtype=np.int32)
    mean_word_len = np.zeros(n, dtype=np.float32)
    alpha_ratio = np.zeros(n, dtype=np.float32)
    symbol_word_ratio = np.zeros(n, dtype=np.float32)
    stopword_hits = np.zeros(n, dtype=np.int32)
    dup_line_frac = np.zeros(n, dtype=np.float32)

    for i, t in enumerate(texts):
        if not t:
            continue
        words = t.split()
        wc = len(words)
        word_count[i] = wc
        if wc:
            mean_word_len[i] = sum(map(len, words)) / wc
            symbol_word_ratio[i] = (t.count("#") + t.count("...")) / wc
            stopword_hits[i] = sum(1 for w in words if w.lower().strip(".,!?;:") in STOPWORDS)
        nc = len(t)
        if nc:
            alpha_ratio[i] = sum(c.isalpha() or c.isspace() for c in t) / nc
        lines = [ln for ln in t.splitlines() if ln.strip()]
        if len(lines) > 1:
            dup_line_frac[i] = 1.0 - len(set(lines)) / len(lines)

    arrays = [word_count, mean_word_len, alpha_ratio, symbol_word_ratio, stopword_hits, dup_line_frac]
    for (name, typ), arr in zip(_HEURISTIC_COLS, arrays):
        batch = batch.append_column(name, pa.array(arr, type=typ))
    return batch
