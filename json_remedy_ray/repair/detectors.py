"""Cheap per-record predicates / detectors (SURVEY §2.2).

Behavior parity with the reference detectors:
  - plain_text:      reference utils/plain_text_detector.ex:5-27
  - layer1 gate:     reference layer1/content_cleaning.ex:191-203
  - layer2 gate:     reference layer2/structural_repair.ex:514-559
  - layer3 gate:     reference layer3/syntax_detectors.ex:15-70
"""

from __future__ import annotations

import re

_JSON_STRUCT_CHARS = set('{}[]":')
_STRUCT_CHAR_RE = re.compile(r'[{}\[\]":]')

# number-ish scalars the parser can repair: leading +, thousands commas,
# underscores, bare leading dot — these are NOT plain text
_NUMBER_RE = re.compile(r"^[+-]?(?:\d[\d_,]*(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d*)?$")
_LITERALS = {"true", "false", "null"}

_FENCE_RE = re.compile(r"```|//|/\*|<pre[\s>]|<code[\s>]|<json[\s>]")

_SYNTAX_ISSUE_RE = re.compile(
    r"""(
        '                                   # single quotes
      | (?<![\w"']) (?:True|False|None|NULL|Null|TRUE|FALSE) (?![\w"'])  # Python/uppercase literals
      | [{,]\s*[A-Za-z_][A-Za-z0-9_]*\s*:   # unquoted keys
      | ,\s*[}\]]                           # trailing commas
      | \.\.\.                              # ellipsis placeholders
      | “|”|‘|’|«|»                         # smart quotes
    )""",
    re.VERBOSE,
)

_DELIMS_RE = re.compile(r'[{}\[\]"\\]')


def plain_text(s: str) -> bool:
    """True when the input is prose, not JSON-ish: no structural chars and
    not a bare JSON literal/number.  Reference returns ``""`` for these
    (utils/plain_text_detector.ex:5-27; lib/json_remedy.ex:348-349)."""
    stripped = s.strip()
    if not stripped:
        return True
    if _STRUCT_CHAR_RE.search(stripped):
        return False
    if stripped in _LITERALS:
        return False
    if _NUMBER_RE.match(stripped):
        return False
    return True


def layer1_supports(s: str) -> bool:
    """Content-cleaning gate: fences / comments / html wrappers / long prose
    around JSON (reference layer1/content_cleaning.ex:191-203)."""
    if _FENCE_RE.search(s):
        return True
    stripped = s.strip()
    return len(stripped) > 100 and not stripped.startswith(("{", "["))


def _delimiter_counts(s: str) -> tuple[int, int, int, int]:
    """Counts of { } [ ] outside of double-quoted strings."""
    oc = cc = ob = cb = 0
    in_str = False
    esc = False
    for ch in s:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == "{":
            oc += 1
        elif ch == "}":
            cc += 1
        elif ch == "[":
            ob += 1
        elif ch == "]":
            cb += 1
    return oc, cc, ob, cb


def layer2_supports(s: str) -> bool:
    """Structural gate: delimiter imbalance (string-aware), reference
    layer2/structural_repair.ex:514-559."""
    oc, cc, ob, cb = _delimiter_counts(s)
    return oc != cc or ob != cb


def layer3_supports(s: str) -> bool:
    """Syntax gate: quotes / unquoted keys / Python literals / trailing
    commas / ellipsis (reference layer3/syntax_detectors.ex:15-70)."""
    return _SYNTAX_ISSUE_RE.search(s) is not None


def can_repair(s: str) -> bool:
    """True if any layer's gate fires (reference lib/json_remedy.ex:235-239)."""
    return bool(s.strip()) and (
        layer1_supports(s) or layer2_supports(s) or layer3_supports(s)
    )
