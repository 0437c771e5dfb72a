"""KenLM-style n-gram perplexity scoring — actor-pool map_batches stage.

New design (SURVEY §2.9).  A character-bigram language model with
add-alpha smoothing stands in for a KenLM binary (not available in this
container); the model table is built deterministically ONCE per actor in
``__init__`` from an embedded seed text — the actor-pool pattern for
model-holding stages.  Swapping in a real KenLM .arpa/.bin changes only
``__init__`` / ``logprob``.

Scores are deterministic pure functions of the text, so task retries are
safe.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

# Embedded seed corpus (public-domain-style filler English written for this
# repo) — gives common English character transitions realistic mass.
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


class PerplexityScorer:
    def __init__(self, text_col: str = "text", alpha: float = 0.1):
        self.text_col = text_col
        seed = " ".join(_SEED_TEXT.lower().split())
        bigrams = Counter(zip(seed, seed[1:]))
        unigrams = Counter(seed)
        vocab = sorted(set(seed))
        self.vocab_index = {c: i for i, c in enumerate(vocab)}
        v = len(vocab)
        self.logp = np.full((v, v), math.log(alpha / (alpha * v)), dtype=np.float64)
        for (a, b), c in bigrams.items():
            ia, ib = self.vocab_index[a], self.vocab_index[b]
            self.logp[ia, ib] = math.log((c + alpha) / (unigrams[a] + alpha * v))
        # renormalize rows for chars never seen as context
        self.oov_logp = math.log(alpha / (alpha * v + 1))

        # vectorized path: a 0x110000-entry codepoint -> vocab-index table so
        # scoring is two numpy gathers + a masked sum per document
        self._code_table = np.full(0x110000, -1, dtype=np.int32)
        for c, i in self.vocab_index.items():
            self._code_table[ord(c)] = i

    def ppl_one(self, text: str) -> float:
        if not text or len(text) < 2:
            return float("inf")
        codes = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
        idx = self._code_table[codes]
        a, b = idx[:-1], idx[1:]
        known = (a >= 0) & (b >= 0)
        total = self.logp[a[known], b[known]].sum() + self.oov_logp * float((~known).sum())
        return float(math.exp(-total / (len(codes) - 1)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ppl = np.zeros(len(texts), dtype=np.float32)
        for i, t in enumerate(texts):
            p = self.ppl_one(t or "")
            ppl[i] = np.float32(min(p, 3.4e38))
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
