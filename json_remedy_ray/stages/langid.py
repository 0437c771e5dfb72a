"""fastText-style language identification — actor-pool map_batches stage.

New design (SURVEY §2.9): a self-contained n-gram/stopword scorer so the
engine has zero external model dependencies (the container has no
fastText).  The "model" (per-language marker-word tables + char-range
hints) is built ONCE per actor in ``__init__`` — the actor-pool pattern
the north_rule requires for model-holding stages; swapping in a real
fastText .bin file changes only ``__init__``.

Usage: ``ds.map_batches(LangIdScorer, batch_format="pyarrow",
concurrency=(2, 8), batch_size=4096)``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# public, well-known high-frequency marker words per language
_MARKERS: dict[str, str] = {
    "en": "the and of to in is you that it for was with are this have from they not",
    "fr": "le la les de et un une est que pour dans qui sur pas vous nous avec sont",
    "es": "el la los las de y que en un una es por para con no se su al como",
    "de": "der die das und von ein eine ist zu mit den dem nicht auf für sich als",
    "it": "il la le di e che un una per con non sono del si da come anche più",
    "pt": "o a os as de e que um uma para com não se por mais dos como foi",
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


class LangIdScorer:
    def __init__(self, text_col: str = "text", langs: tuple[str, ...] | None = None):
        self.text_col = text_col
        use = langs or tuple(_MARKERS) + ("zh",)
        self.tables = {
            lang: frozenset(_MARKERS[lang].split()) for lang in use if lang in _MARKERS
        }
        self.detect_zh = "zh" in use
        self.word_re = _WORD_RE
        self.cjk_re = _CJK_RE

    def score_one(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        if self.detect_zh:
            cjk = len(self.cjk_re.findall(text))
            if cjk and cjk / max(1, len(text)) > 0.05:
                return "zh", min(1.0, cjk / max(1, len(text)) * 2.0)
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und", 0.0
        best_lang, best_hits = "und", 0
        for lang, table in self.tables.items():
            hits = sum(1 for w in words if w in table)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        conf = best_hits / len(words)
        return (best_lang, conf) if best_hits else ("und", 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs = np.empty(len(texts), dtype=object)
        confs = np.zeros(len(texts), dtype=np.float32)
        for i, t in enumerate(texts):
            langs[i], confs[i] = self.score_one(t or "")
        batch = batch.append_column("lang_pred", pa.array(list(langs), type=pa.string()))
        batch = batch.append_column("lang_conf", pa.array(confs, type=pa.float32()))
        return batch
