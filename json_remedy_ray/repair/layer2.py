"""Layer 2 — structural repair as a standalone string -> string operator.

A character-level state machine with a delimiter stack, string/escape
aware (behavior parity with reference
lib/json_remedy/layer2/structural_repair.ex:51-496):

  - extra closing delimiter with empty stack  -> removed   (:213-225)
  - `}` against a `[` frame                   -> rewritten `]` (:237-255)
  - `]` against `{` over `[`                  -> inject `}` (:283-318)
  - `]` against a `{` frame                   -> rewritten `}` (:320-337)
  - unclosed contexts at EOF                  -> closed LIFO (:379-400)

The full repair pipeline uses the Layer-5 tolerant parser instead (which
subsumes these recoveries in value space); this operator exists for the
string-domain API surface and for pipelines that only need balanced text.

Note: the redundant-double collapse (`[[1,2,3]]` -> `[1,2,3]`) fires on
BALANCED input too — that is deliberate reference parity (its unit suite
expects exactly this, layer2_structural_repair_test.exs:82-95).  Valid
JSON never reaches this operator in the full pipeline: the Layer-4 fast
path returns it first.
"""

from __future__ import annotations

import re

from json_remedy_ray.repair.actions import LAYER_STRUCTURAL, Repair

_SIBLING_AFTER = {"{": re.compile(r"\}\s*,\s*\{"), "[": re.compile(r"\]\s*,\s*\[")}


def repair_structure(s: str) -> tuple[str, list[Repair]]:
    out: list[str] = []
    repairs: list[Repair] = []
    stack: list[str] = []  # open delimiters
    in_str = False
    esc = False
    prev_sig = ""  # previous significant (non-ws) input char outside strings
    for i, ch in enumerate(s):
        if in_str:
            out.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            out.append(ch)
            prev_sig = ch
            continue
        if ch in "{[":
            # redundant doubles `{{` / `[[`: drop the second open unless a
            # sibling pattern (`}, {` / `], [`) appears downstream
            # (reference structural_repair.ex:162-210,350-377)
            if prev_sig == ch and not _SIBLING_AFTER[ch].search(s, i + 1):
                repairs.append(Repair(LAYER_STRUCTURAL, f"removed redundant {ch}", i))
                prev_sig = ch
                continue
            stack.append(ch)
            out.append(ch)
            prev_sig = ch
            continue
        if not ch.isspace():
            prev_sig = ch
        if ch == "}":
            if not stack:
                repairs.append(Repair(LAYER_STRUCTURAL, "removed extra closing brace", i))
                continue
            if stack[-1] == "[":
                repairs.append(Repair(LAYER_STRUCTURAL, "rewrote mismatched } as ]", i))
                out.append("]")
            else:
                out.append("}")
            stack.pop()
            continue
        if ch == "]":
            if not stack:
                repairs.append(Repair(LAYER_STRUCTURAL, "removed extra closing bracket", i))
                continue
            if stack[-1] == "{":
                if len(stack) >= 2 and stack[-2] == "[":
                    # missing `}` before `]`: inject it, then close the array
                    repairs.append(Repair(LAYER_STRUCTURAL, "added missing closing brace before ]", i))
                    out.append("}")
                    stack.pop()
                    out.append("]")
                    stack.pop()
                else:
                    repairs.append(Repair(LAYER_STRUCTURAL, "rewrote mismatched ] as }", i))
                    out.append("}")
                    stack.pop()
            else:
                out.append("]")
                stack.pop()
            continue
        out.append(ch)
    if in_str:
        repairs.append(Repair(LAYER_STRUCTURAL, "added missing closing quote at end of input", len(s)))
        out.append('"')
    while stack:
        open_ch = stack.pop()
        close_ch = "}" if open_ch == "{" else "]"
        repairs.append(Repair(LAYER_STRUCTURAL, f"added missing {close_ch} at end of input", len(s)))
        out.append(close_ch)
    return "".join(out), repairs
