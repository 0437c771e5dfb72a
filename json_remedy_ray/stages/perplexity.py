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

    def ppl_one(self, text: str) -> float:
        if not text or len(text) < 2:
            return float("inf")
        t = text.lower()
        idx = self.vocab_index
        total = 0.0
        count = 0
        prev = idx.get(t[0], -1)
        for ch in t[1:]:
            cur = idx.get(ch, -1)
            if prev >= 0 and cur >= 0:
                total += self.logp[prev, cur]
            else:
                total += self.oov_logp
            count += 1
            prev = cur
        return float(math.exp(-total / count))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ppl = np.zeros(len(texts), dtype=np.float32)
        for i, t in enumerate(texts):
            p = self.ppl_one(t or "")
            ppl[i] = np.float32(min(p, 3.4e38))
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
