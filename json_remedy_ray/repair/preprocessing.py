"""Pre-parse normalizers (SURVEY §2.3) — string -> string regex passes.

These run before the tolerant parse; they are the vectorizable part of
the reference's Layer-3 pre-pass (reference
layer3/syntax_normalization.ex:437-471, layer3/hardcoded_patterns.ex,
utils/preprocessing.ex).
"""

from __future__ import annotations

import re

from json_remedy_ray.repair.actions import LAYER_PREPROCESSING, LAYER_SYNTAX, Repair

# reference layer3/hardcoded_patterns.ex:60-73,114-123 — smart double quotes
# -> ", smart single quotes -> ' (straight ' handled by the parser)
_SMART_QUOTES = str.maketrans({
    "“": '"', "”": '"', "«": '"', "»": '"', "‹": '"', "›": '"',
    "‘": "'", "’": "'",
})
_SMART_QUOTE_RE = re.compile("[“”«»‹›‘’]")

# reference utils/preprocessing.ex:5-17 — `"```json {…}```"` as a *string
# value* -> inline the JSON so it parses as a nested structure
_FENCE_IN_STRING_RE = re.compile(r'([:\[,]\s*)"```json\s+(.+?)```"', re.DOTALL)

# reference layer3/hardcoded_patterns.ex:258-287 — literal escape sequences
# (opt-in, default off): `\t`/`\n`/... -> real control chars, `\uXXXX` and
# `\xXX` -> the codepoint (reference normalize_unicode_escapes /
# normalize_hex_escapes / normalize_standard_escapes, applied in that order)
# (?<!\\) guards escaped backslashes: in `"C:\\network"` the `\n` is the
# second half of an ESCAPED backslash, not an escape — converting it
# would corrupt valid JSON (the reference's String.replace has this bug;
# deviation documented, improvement over parity)
_ESC_SEQ_RE = re.compile(r"(?<!\\)\\([ntrbf])")

_ESC_MAP = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}


def normalize_smart_quotes(s: str) -> tuple[str, list[Repair]]:
    if not _SMART_QUOTE_RE.search(s):
        return s, []
    return s.translate(_SMART_QUOTES), [Repair(LAYER_PREPROCESSING, "normalized smart quotes", None)]


def inline_code_fence_string_values(s: str) -> tuple[str, list[Repair]]:
    if '"```json' not in s:
        return s, []
    out, n = _FENCE_IN_STRING_RE.subn(lambda m: m.group(1) + m.group(2).strip(), s)
    if n:
        return out, [Repair(LAYER_PREPROCESSING, "inlined code-fenced JSON string value", None)]
    return s, []


_ESC_U_RE = re.compile(r"(?<!\\)\\u([0-9a-fA-F]{4})")
_ESC_X_RE = re.compile(r"(?<!\\)\\x([0-9a-fA-F]{2})")


def normalize_escape_sequences(s: str) -> tuple[str, list[Repair]]:
    """Literal escape sequences -> real characters (opt-in, default off —
    matches the reference: converting `\\n` inside a VALID JSON string
    changes its parsed value, so this only runs when asked).  Reference
    order (hardcoded_patterns.ex:258-287): unicode, hex, then standard."""
    def _u(m: re.Match) -> str:
        cp = int(m.group(1), 16)
        # lone surrogates are not encodable UTF-8 (the reference's
        # <<codepoint::utf8>> raises on them too): leave the escape alone
        return m.group(0) if 0xD800 <= cp <= 0xDFFF else chr(cp)

    out, n2 = _ESC_U_RE.subn(_u, s)
    out, n3 = _ESC_X_RE.subn(lambda m: chr(int(m.group(1), 16)), out)
    out, n1 = _ESC_SEQ_RE.subn(lambda m: _ESC_MAP[m.group(1)], out)
    if n1 + n2 + n3:
        return out, [Repair(LAYER_SYNTAX, "normalized escape sequences", None)]
    return s, []


def preprocess(s: str, enable_escape_normalization: bool = False) -> tuple[str, list[Repair]]:
    repairs: list[Repair] = []
    s, r = normalize_smart_quotes(s)
    repairs.extend(r)
    s, r = inline_code_fence_string_values(s)
    repairs.extend(r)
    if enable_escape_normalization:
        s, r = normalize_escape_sequences(s)
        repairs.extend(r)
    return s, repairs
