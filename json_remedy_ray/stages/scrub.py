"""PII / toxicity regex scrub — stateless vectorized map_batches stage.

New design (SURVEY §2.9).  Precompiled public-pattern regexes (emails,
phone numbers, IPv4, SSN-style ids, credit-card-style numbers) replace
matches with typed placeholder tokens; a small denylist handles
toxicity flagging.  An Arrow ``match_substring_regex`` pre-filter skips
clean rows entirely, so the Python substitution loop only touches rows
that actually contain candidates.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PII_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("EMAIL", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("IP", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")),
    ("SSN", re.compile(r"\b\d{3}-\d{2}-\d{4}\b")),
    ("CARD", re.compile(r"\b(?:\d[ -]?){13,16}\b")),
    ("PHONE", re.compile(r"\b(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?\b")),
]

# combined cheap pre-filter (Arrow RE2 syntax)
_PREFILTER = r"@|\d{3}[ .-]\d{2,4}|(?:\d{1,3}\.){3}\d"

# placeholder denylist — stands in for a real toxicity lexicon
_TOXIC_WORDS = frozenset("badword1 badword2 slur1 slur2".split())
_TOXIC_RE = re.compile(
    r"\b(" + "|".join(re.escape(w) for w in sorted(_TOXIC_WORDS)) + r")\b", re.IGNORECASE
)


def scrub_batch(batch: pa.Table, text_col: str = "text", out_col: str = "scrubbed_text") -> pa.Table:
    col = batch[text_col]
    candidates = pc.match_substring_regex(col, _PREFILTER).to_numpy(zero_copy_only=False)
    texts = col.to_pylist()
    n = len(texts)
    scrubbed = list(texts)
    pii_counts = np.zeros(n, dtype=np.int32)
    toxic = np.zeros(n, dtype=bool)
    for i, t in enumerate(texts):
        if t is None:
            scrubbed[i] = ""
            continue
        if candidates[i]:
            total = 0
            for token, pat in _PII_PATTERNS:
                t, k = pat.subn(f"<{token}>", t)
                total += k
            pii_counts[i] = total
            scrubbed[i] = t
        if _TOXIC_RE.search(t):
            toxic[i] = True
    batch = batch.append_column(out_col, pa.array(scrubbed, type=pa.large_string()))
    batch = batch.append_column("pii_count", pa.array(pii_counts, type=pa.int32()))
    batch = batch.append_column("toxic", pa.array(toxic, type=pa.bool_()))
    return batch
