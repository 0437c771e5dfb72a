"""Text analysis: token counting, document fingerprinting (SURVEY §2.9).

  - whitespace token count (SQL-checkable; see docs_token_counts)
  - BPE-ish token count: a GPT-2-style pre-tokenizer regex (public
    pattern family) counts sub-word candidate chunks — the cheap
    stand-in for a real tokenizer's token count at corpus scale
  - content fingerprint: md5 of the exact text (SQL-checkable) plus a
    winnowed rolling-hash fingerprint set (robust to small edits)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# GPT-2-flavored pre-tokenization pattern (public knowledge), simplified to
# ASCII-safe classes available in `re`
_BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?\d+| ?[^\sA-Za-zÀ-ÿ\d]+|\s+(?!\S)|\s+"
)

_B = 1_000_003  # rolling-hash base (prime)
_M = (1 << 61) - 1


def bpeish_token_count(text: str) -> int:
    return len(_BPEISH_RE.findall(text or ""))


def winnowed_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): rolling k-gram hashes, keep the
    min in each sliding window -> compact, edit-robust fingerprint set."""
    data = (text or "").encode("utf-8", errors="ignore")
    n = len(data)
    if n < k:
        return [int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little") >> 1]
    # rolling hash over k-byte grams
    h = 0
    pow_k = pow(_B, k - 1, _M)
    hashes = np.empty(n - k + 1, dtype=np.int64)
    for i in range(k):
        h = (h * _B + data[i]) % _M
    hashes[0] = h
    for i in range(1, n - k + 1):
        h = ((h - data[i - 1] * pow_k) * _B + data[i + k - 1]) % _M
        hashes[i] = h
    out: list[int] = []
    last = -1
    for i in range(max(1, len(hashes) - window + 1)):
        w = hashes[i:i + window]
        j = i + int(np.argmin(w))
        if j != last:
            out.append(int(hashes[j]))
            last = j
    return out


def textstats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    n = len(texts)
    ws_tokens = np.zeros(n, dtype=np.int64)
    bpe_tokens = np.zeros(n, dtype=np.int64)
    md5s: list[str] = []
    n_fps = np.zeros(n, dtype=np.int32)
    for i, t in enumerate(texts):
        t = t or ""
        ws_tokens[i] = len(t.split())
        bpe_tokens[i] = bpeish_token_count(t)
        md5s.append(hashlib.md5(t.encode("utf-8", errors="ignore")).hexdigest())
        n_fps[i] = len(winnowed_fingerprints(t))
    batch = batch.append_column("ws_token_count", pa.array(ws_tokens, type=pa.int64()))
    batch = batch.append_column("bpeish_token_count", pa.array(bpe_tokens, type=pa.int64()))
    batch = batch.append_column("fingerprint", pa.array(md5s, type=pa.string()))
    batch = batch.append_column("n_winnowed_fps", pa.array(n_fps, type=pa.int32()))
    return batch
