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


def ws_token_counts_batch(col) -> np.ndarray:
    """Per-doc whitespace token counts, fully vectorized: the dedicated
    utf8_split_whitespace kernel splits on exactly the canonical
    UWS_CHARS set (str.split parity, verified incl. \\x1c-\\x1f), so
    counting its non-empty tokens equals len(_UWS_TOKEN_RE.findall(t))
    — the scalar ws_token_count — with zero per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc_fill_null_empty(col)
    toks = _pc.utf8_split_whitespace(col)
    flat_lens = _pc.utf8_length(_pc.list_flatten(toks)).to_numpy(zero_copy_only=False)
    parents = _pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return np.bincount(parents[flat_lens > 0], minlength=len(col)).astype(np.int64)


def textstats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """All-Arrow/numpy batch path (round-2 verdict: this was the last
    per-row Python loop on a headline text stage):

      ws_token_count     — utf8_split_whitespace kernel (scalar parity
                           by the shared canonical whitespace set)
      bpeish_token_count — count_substring_regex with the VERBATIM
                           engine pattern (RE2-compatible by authoring,
                           same leftmost counting as re.findall — the
                           DuckDB oracle already runs it verbatim)
      fingerprint        — md5 per doc; hashlib stays (the oracle is
                           md5(text)) but now hashes zero-copy slices
                           of the raw Arrow buffer instead of
                           re-encoding Python strings
      n_winnowed_fps     — vectorized rolling-hash winnowing (vhash)
    """
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc_fill_null_empty(col)
    n = len(col)

    ws_counts = ws_token_counts_batch(col)
    bpe_tokens = _pc.cast(
        _pc.count_substring_regex(col, _BPEISH_RE.pattern), pa.int64())

    # md5 over zero-copy views of the UTF-8 buffer (hashlib accepts any
    # buffer object; numpy slices are contiguous views, no bytes copies)
    from json_remedy_ray.functions.vhash import string_view

    offsets, data = string_view(col)
    md5s = [hashlib.md5(data[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(n)]

    _, _, _, fo = _winnow_batch(col)
    n_fps = (fo[1:] - fo[:-1]).astype(np.int32)
    batch = batch.append_column("ws_token_count", pa.array(ws_counts, type=pa.int64()))
    batch = batch.append_column("bpeish_token_count", bpe_tokens)
    batch = batch.append_column("fingerprint", pa.array(md5s, type=pa.string()))
    batch = batch.append_column("n_winnowed_fps", pa.array(n_fps, type=pa.int32()))
    return batch
