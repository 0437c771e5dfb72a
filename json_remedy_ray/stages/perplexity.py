"""KenLM-style n-gram perplexity scoring — vectorized batch stage.

New design (SURVEY §2.9).  A BYTE-bigram language model with add-alpha
smoothing stands in for a KenLM binary (not available in this
container); the 256x256 log-prob table is built deterministically once
per worker from an embedded seed text.  Byte-level (not char-level) is
deliberate: the whole batch scores as ONE numpy gather over the Arrow
string buffer + a cumulative-sum segment reduction — zero per-document
Python.  Swapping in a real KenLM changes only the table construction.

Scores are deterministic pure functions of the text, so task retries
are safe.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Embedded seed corpus (filler English written for this repo) — gives
# common English byte transitions realistic mass.
_SEED_TEXT = """
the quick brown fox jumps over the lazy dog and then runs far away to the
river where many small animals live in the tall green grass near the old
stone bridge people often walk there in the morning and talk about the
weather the news and the little things that make a day feel long or short
it is a quiet place with good light and the sound of water moving slowly
over smooth rocks children play on the path and dogs chase birds that rise
from the field when the wind turns cold everyone goes home to warm rooms
and bright windows where dinner waits on wooden tables and stories are told
"""


def _build_logp(alpha: float = 0.1) -> np.ndarray:
    seed = " ".join(_SEED_TEXT.lower().split()).encode("utf-8")
    arr = np.frombuffer(seed, dtype=np.uint8)
    bigrams = Counter(zip(arr[:-1].tolist(), arr[1:].tolist()))
    unigrams = Counter(arr.tolist())
    v = 256
    logp = np.full((v, v), math.log(alpha / (alpha * v)), dtype=np.float64)
    for (a, b), c in bigrams.items():
        logp[a, b] = math.log((c + alpha) / (unigrams[a] + alpha * v))
    return logp


class PerplexityScorer:
    def __init__(self, text_col: str = "text", alpha: float = 0.1):
        self.text_col = text_col
        self.logp = _build_logp(alpha)

    # ---- scalar reference (tests + single-doc API)
    def ppl_one(self, text: str) -> float:
        if not text:
            return float("inf")
        b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
        if len(b) < 2:
            return float("inf")
        total = self.logp[b[:-1], b[1:]].sum()
        return float(math.exp(-total / (len(b) - 1)))

    # ---- vectorized batch path: one gather over the whole Arrow buffer
    def _batch_ppl(self, col: pa.Array) -> np.ndarray:
        lowered = pc.utf8_lower(col)
        if isinstance(lowered, pa.ChunkedArray):
            lowered = lowered.combine_chunks()
        n = len(lowered)
        bufs = lowered.buffers()
        off_dtype = np.int64 if pa.types.is_large_string(lowered.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[lowered.offset:lowered.offset + n + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        if len(data) < 2:
            # every doc is <2 bytes -> scalar ppl_one returns inf for each
            return np.full(n, np.inf, dtype=np.float32)
        lp = self.logp[data[:-1], data[1:]]          # all adjacent byte pairs
        cum = np.concatenate(([0.0], np.cumsum(lp)))
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        lens = ends - starts
        # pairs fully inside a doc: positions [start, end-2] of lp
        totals = cum[np.maximum(ends - 1, starts)] - cum[starts]
        counts = np.maximum(lens - 1, 1).astype(np.float64)
        ppl = np.minimum(np.exp(-totals / counts), 3.4e38)
        ppl[lens < 2] = np.inf  # after the cap: scalar parity (ppl_one -> inf)
        return ppl.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if col.num_chunks != 1:
            col = col.combine_chunks()
        else:
            col = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        ppl = self._batch_ppl(col)
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
