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
import pyarrow.compute as _pc


def pc_fill_null_empty(col):
    return _pc.fill_null(col, "") if col.null_count else col

# GPT-2-flavored pre-tokenization pattern (public knowledge), simplified
# to RE2-compatible form: the original's `\s+(?!\S)` lookahead branch is
# dropped (it only re-splits whitespace runs — for COUNTING it differs
# solely on runs ending in non-space whitespace, and removing it makes
# the engine pattern byte-identical to the DuckDB oracle's), and
# re.ASCII pins \s/\d to the ASCII semantics RE2 uses.
_BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?\d+| ?[^\sA-Za-zÀ-ÿ\d]+|\s+",
    re.ASCII,
)

# Canonical whitespace tokenization = the Python str.isspace() set —
# empirically ALSO what Arrow's utf8_split_whitespace splits on
# (verified: it splits \x1c-\x1f and \x85 too).  Spelled out so the
# batch kernels, the scalar reference paths and the RE2/DuckDB oracles
# share ONE definition (RE2's \s is ASCII-only and misses \x0b).
UWS_CHARS = ("\t\n\x0b\x0c\r \x1c\x1d\x1e\x1f\x85\xa0\u1680"
             + "".join(chr(c) for c in range(0x2000, 0x200B))
             + "\u2028\u2029\u202f\u205f\u3000")
_UWS_TOKEN_RE = re.compile(f"[^{re.escape(UWS_CHARS)}]+")
# the same class in RE2 syntax (\x{...}) for DuckDB oracle SQL
UWS_RE2_CLASS = (r"\s\x{000b}\x{001c}-\x{001f}\x{0085}\x{00a0}\x{1680}"
                 r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}")


def ws_tokens(text: str) -> list[str]:
    return _UWS_TOKEN_RE.findall(text or "")


def ws_token_count(text: str) -> int:
    return len(_UWS_TOKEN_RE.findall(text or ""))


def bpeish_token_count(text: str) -> int:
    return len(_BPEISH_RE.findall(text or ""))


def winnowed_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): rolling k-gram hashes, keep the
    min in each sliding window -> compact, edit-robust fingerprint set.

    Scalar reference path — exactly the vectorized batch computation
    (functions/vhash rolling_hashes + winnow_positions) on one row.
    Docs shorter than k are space-padded (one window -> one fingerprint)."""
    W, wo, sel, fo = _winnow_batch(pa.array([text or ""], type=pa.string()), k, window)
    return [int(v) for v in W[sel[fo[0]:fo[1]]]]


def _winnow_batch(col, k: int = 8, window: int = 4):
    from json_remedy_ray.functions.vhash import rolling_hashes, winnow_positions

    W, wo = rolling_hashes(col, k)
    sel, fo = winnow_positions(W, wo, window)
    return W, wo, sel, fo


def textstats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    n = len(texts)
    ws_counts = np.zeros(n, dtype=np.int64)
    bpe_tokens = np.zeros(n, dtype=np.int64)
    md5s: list[str] = []
    for i, t in enumerate(texts):
        t = t or ""
        ws_counts[i] = ws_token_count(t)
        bpe_tokens[i] = bpeish_token_count(t)
        md5s.append(hashlib.md5(t.encode("utf-8", errors="ignore")).hexdigest())
    # winnowed fingerprint counts: one vectorized pass over the raw buffer
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    _, _, _, fo = _winnow_batch(pc_fill_null_empty(col))
    n_fps = (fo[1:] - fo[:-1]).astype(np.int32)
    batch = batch.append_column("ws_token_count", pa.array(ws_counts, type=pa.int64()))
    batch = batch.append_column("bpeish_token_count", pa.array(bpe_tokens, type=pa.int64()))
    batch = batch.append_column("fingerprint", pa.array(md5s, type=pa.string()))
    batch = batch.append_column("n_winnowed_fps", pa.array(n_fps, type=pa.int32()))
    return batch
