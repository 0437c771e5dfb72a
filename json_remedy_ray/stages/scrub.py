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

# combined cheap pre-filter (Arrow RE2 syntax); \d{13} catches
# separator-less card numbers the CARD pattern scrubs
_PREFILTER = r"@|\d{3}[ .-]\d{2,4}|(?:\d{1,3}\.){3}\d|\d{13}"

# placeholder denylist — stands in for a real toxicity lexicon
_TOXIC_WORDS = frozenset("badword1 badword2 slur1 slur2".split())
_TOXIC_RE = re.compile(
    r"\b(" + "|".join(re.escape(w) for w in sorted(_TOXIC_WORDS)) + r")\b", re.IGNORECASE
)


_TOXIC_ARROW_RE = r"(?i)\b(" + "|".join(sorted(_TOXIC_WORDS)) + r")\b"


def scrub_batch(batch: pa.Table, text_col: str = "text", out_col: str = "scrubbed_text") -> pa.Table:
    col = batch[text_col]
    if col.num_chunks != 1:
        col = col.combine_chunks()
    n = len(col)
    # both detectors are vectorized; Python substitution only touches the
    # (usually tiny) candidate subset
    cand_mask = pc.match_substring_regex(col, _PREFILTER)
    toxic = pc.and_kleene(pc.is_valid(col), pc.match_substring_regex(col, _TOXIC_ARROW_RE))
    pii_counts = np.zeros(n, dtype=np.int32)
    cand_idx = np.nonzero(cand_mask.to_numpy(zero_copy_only=False))[0]
    if len(cand_idx):
        scrubbed = pc.cast(pc.fill_null(col, ""), pa.large_string()).to_pylist()
        for i in cand_idx:
            t = scrubbed[i]
            total = 0
            for token, pat in _PII_PATTERNS:
                t, k = pat.subn(f"<{token}>", t)
                total += k
            pii_counts[i] = total
            scrubbed[i] = t
        out_arr = pa.array(scrubbed, type=pa.large_string())
    else:
        out_arr = pc.cast(pc.fill_null(col, ""), pa.large_string())
    batch = batch.append_column(out_col, out_arr)
    batch = batch.append_column("pii_count", pa.array(pii_counts, type=pa.int32()))
    batch = batch.append_column("toxic", pc.cast(pc.fill_null(toxic, False), pa.bool_()))
    return batch
