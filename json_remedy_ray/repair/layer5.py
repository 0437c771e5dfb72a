"""Layer 5 — tolerant recursive-descent parser.

The workhorse of the repair pipeline (north_star: "Layer5 tolerant
recursive-descent parse").  It embodies the semantics of the reference's
Layer 2 state machine (delimiter stack, mismatch recovery — reference
layer2/structural_repair.ex:109-496), Layer 3 char-scan (quote /
literal / number / missing-comma-colon normalization — reference
layer3/syntax_normalization.ex:512-988, layer3/binary_processors.ex) and
the preprocessing patterns (multiple JSON values, object-boundary
merging, truncated keys — reference utils/multiple_json_detector.ex,
layer3/object_merger.ex, utils/preprocessing.ex).

Behavioral contracts verified against the reference ExUnit suites
(test/missing_patterns/*.exs, test/unit/*.exs); see tests/test_repair_core.py.

Docs are independent — this is pure per-document compute, so the Ray
stage simply loops it over each Arrow batch (SURVEY §2.5 "no
vectorization possible; docs are independent -> batch loop").
"""

from __future__ import annotations

import re

from json_remedy_ray.repair.actions import (
    LAYER_PARSE,
    LAYER_PREPROCESSING,
    LAYER_STRUCTURAL,
    LAYER_SYNTAX,
    Repair,
)


class _Skip:
    """Sentinel: parsed fragment should be discarded (empty mismatched
    object, filtered keyword, ellipsis placeholder)."""

    __repr__ = lambda self: "<SKIP>"  # noqa: E731


SKIP = _Skip()

# debug keywords stripped when unquoted (reference layer3/keyword_filter.ex:17-25).
# Case-sensitive: lowercase 'comment' is treated as an unquoted string value
# (reference test recent_python_cases_test.exs:68-92).  Beyond the named
# list, ANY all-caps identifier in a position expecting a key or a comma is
# junk (reference pattern4_comment_keywords_test.exs: SHOULD_NOT_EXIST,
# SEPARATOR, MARKER, HEADER, FOOTER, TRACE_END ... are all removed).
KEYWORDS = frozenset({"COMMENT", "DEBUG_INFO", "PLACEHOLDER", "TODO", "FIXME", "NOTE", "XXX"})

_ALLCAPS_RE = re.compile(r"^[A-Z][A-Z0-9_]+$")


def _is_junk_marker(word: str) -> bool:
    return word in KEYWORDS or bool(_ALLCAPS_RE.match(word))

# reference layer3/binary_processors.ex:487-523 literal normalization
LITERALS = {
    "true": True, "True": True, "TRUE": True,
    "false": False, "False": False, "FALSE": False,
    "null": None, "None": None, "NULL": None, "Null": None,
}

def _is_ident_start(c: str) -> bool:
    return bool(c) and (c.isalpha() or c == "_")


def _is_ident_char(c: str) -> bool:
    return bool(c) and (c.isalnum() or c == "_")


class _IdentStart:
    """Set-like helper: `c in _IDENT_START` with Unicode letters."""

    def __contains__(self, c: str) -> bool:  # pragma: no branch
        return _is_ident_start(c)


class _IdentChars:
    def __contains__(self, c: str) -> bool:  # pragma: no branch
        return _is_ident_char(c)


_IDENT_START = _IdentStart()
_IDENT_CHARS = _IdentChars()
_NUM_START = set("0123456789-+.$€£¥")
_WS = set(" \t\r\n")

_WS_RE = re.compile(r"[ \t\r\n]+")
_WORD_RE = re.compile(r"[^\W\d]\w*", re.UNICODE)
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?$|^[+-]?\d+[eE][+-]?\d+$")
_INCOMPLETE_EXP_RE = re.compile(r"[eE][+-]?$")
_KEY_AHEAD_RE = re.compile(r'^\s*,?\s*(?:"[^"\n]{0,200}"|[A-Za-z_][A-Za-z0-9_]{0,80})\s*:')
# `, 105,12,}` — only bare numbers between a value-less key and the close
_NUM_TOKEN_RE = re.compile(r"-?\d+(?:\.\d+)?")
_COMMA_NUM_TAIL_RE = re.compile(
    r",\s*(-?\d+(?:\.\d+)?(?:\s*,\s*-?\d+(?:\.\d+)?)*)\s*,?\s*\}")
_EMPTY_TRAILER_RE = re.compile(r"^\s*(?:\[\s*\]|\{\s*\})\s*$")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "/": "/", "\\": "\\", '"': '"', "'": "'"}


class ParseError(Exception):
    pass


class TolerantParser:
    def __init__(self, s: str, repairs: list[Repair] | None = None, max_depth: int = 128,
                 allow_ellipsis: bool = True, allow_keywords: bool = True):
        self.s = s
        self.n = len(s)
        self.i = 0
        self.repairs: list[Repair] = repairs if repairs is not None else []
        self.max_depth = max_depth
        self.allow_ellipsis = allow_ellipsis    # strip `...` placeholders
        self.allow_keywords = allow_keywords    # strip COMMENT/DEBUG_INFO/...
        self.pending_sibling = None  # truncated-key-in-array extra element
        self.array_depth = 0         # arrays currently open (issue8 recovery)

    # ------------------------------------------------------------- helpers
    def _rep(self, layer: str, action: str, pos: int | None = None) -> None:
        self.repairs.append(Repair(layer, action, self.i if pos is None else pos))

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def eof(self) -> bool:
        return self.i >= self.n

    def skip_ws(self) -> None:
        # C-speed scan (profiled hot: 264k calls on a 2.6 MB doc)
        m = _WS_RE.match(self.s, self.i)
        if m:
            self.i = m.end()

    def _peek_word(self) -> str:
        m = _WORD_RE.match(self.s, self.i)
        return m.group() if m else ""

    def _next_nonspace(self, j: int | None = None) -> str:
        j = self.i if j is None else j
        while j < self.n and self.s[j] in _WS:
            j += 1
        return self.s[j] if j < self.n else ""

    # ------------------------------------------------------- value dispatch
    def parse_value(self, depth: int, in_array: bool = False):
        if depth > self.max_depth:
            raise ParseError(f"max parse depth {self.max_depth} exceeded at position {self.i}")
        guard = -1
        while not self.eof():
            if self.i == guard:  # never stall
                self.i += 1
                continue
            guard = self.i
            self.skip_ws()
            c = self.peek()
            if c == "":
                break
            if c == "{":
                return self.parse_object(depth + 1, parent_is_array=in_array)
            if c == "[":
                return self.parse_array(depth + 1)
            if c in "\"'":
                # at top level (depth 0) strings terminate greedily; the
                # embedded-quote heuristic only applies inside structures
                return self.parse_string(c, plain=(depth == 0))
            if c in _NUM_START:
                # top level: don't absorb trailing letters into the number
                # (`123true` is two values, not the string "123true")
                return self.parse_number(plain=(depth == 0))
            if c == "<":
                return self.parse_html_value()
            if c in _IDENT_START:
                return self.parse_identifier_value()
            # stray char at a value position
            self._rep(LAYER_SYNTAX, f"removed invalid character {c!r}")
            self.i += 1
        return SKIP

    # -------------------------------------------------------------- object
    def parse_object(self, depth: int, parent_is_array: bool = False, cont_into: dict | None = None):
        """Parse an object.  Handles: missing close (EOF), mismatched ']'
        (reference structural_repair.ex:283-337), set-style coercion
        `{'a','b'}` -> ['a','b'] (reference utils/structure_coercion.ex:5-57),
        missing colons/values/commas, truncated trailing key in arrays
        (reference utils/preprocessing.ex:20-147)."""
        if depth > self.max_depth:
            raise ParseError(f"max parse depth {self.max_depth} exceeded at position {self.i}")
        if cont_into is None:
            assert self.peek() == "{"
            self.i += 1
            obj: dict = {}
        else:
            obj = cont_into
        items: list = []
        array_mode = False
        dangling_key: str | None = None
        guard = -1
        while True:
            if self.i == guard:
                self.i += 1
            guard = self.i
            self.skip_ws()
            while self.peek() == ",":
                self.i += 1
                self.skip_ws()
            if self.eof():
                self._rep(LAYER_STRUCTURAL, "added missing closing brace at end of input")
                break
            c = self.peek()
            if c == "}":
                self.i += 1
                break
            if c == "]":
                if not obj and not items and cont_into is None:
                    # `[{]` -> discard the empty object entirely
                    # (reference structural_repair.ex:283-318)
                    self._rep(LAYER_STRUCTURAL, "removed empty mismatched object")
                    return SKIP
                # missing `}` before `]`: close object, leave `]` for the array
                self._rep(LAYER_STRUCTURAL, "added missing closing brace before ]")
                break
            if c in "{[":
                if self.array_depth > 0:
                    # array-element recovery (reference issue #8,
                    # structural_repair.ex:340-462): a `{`/`[` where a key is
                    # expected inside an array context means this object was
                    # never closed — close it and let the array take the new
                    # element
                    self._rep(LAYER_STRUCTURAL, "closed object before new array element")
                    break
                # a structure where a key is expected (redundant doubles `{{`,
                # reference structural_repair.ex:162-210) or set-style element
                v = self.parse_value(depth + 1, in_array=True)
                if v is not SKIP:
                    if not obj and self._next_nonspace() in "}":
                        # `{{...}}` -> unwrap redundant wrapper
                        self.skip_ws()
                        if self.peek() == "}":
                            self.i += 1
                        self._rep(LAYER_STRUCTURAL, "removed redundant wrapper brace")
                        return v
                    array_mode = True
                    items.append(v)
                continue
            if c in _IDENT_START:
                word = self._peek_word()
                # junk marker at a key position: named keyword or any
                # all-caps identifier NOT followed by ':' (it would be an
                # unquoted key then) — reference pattern4 suite
                if (self.allow_keywords and word not in LITERALS
                        and _is_junk_marker(word)
                        and self._next_nonspace(self.i + len(word)) != ":"):
                    self._rep(LAYER_SYNTAX, f"removed debug keyword {word}")
                    self.i += len(word)
                    continue
            # ---- key
            key_was_quoted = c in "\"'"
            key = self.parse_key()
            if key is None:
                # junk where a key was expected: also discard its dangling
                # `: value` so the value doesn't masquerade as a key
                self.skip_ws()
                if self.peek() == ":":
                    self.i += 1
                    self.skip_ws()
                    if not self.eof() and self.peek() not in ",}]":
                        self.parse_value(depth + 1)
                continue
            self.skip_ws()
            if self.eof():
                dangling_key = key
                self._rep(LAYER_STRUCTURAL, "truncated trailing object key")
                break
            c = self.peek()
            if c == ":":
                self.i += 1
                self.skip_ws()
                if self.eof() or self.peek() in ",}]":
                    self._rep(LAYER_SYNTAX, "added empty value for missing value")
                    v = ""
                else:
                    v = self.parse_value(depth + 1)
                    if v is SKIP:
                        v = ""
                obj[key] = v
            elif c in ",}]":
                if c == "," and not obj and not items and key_was_quoted:
                    # `{"key", 105,12,}` -> {"key": "105,12"}: a value-less
                    # key followed ONLY by comma-separated bare numbers is
                    # the number-with-commas-as-string pattern (reference
                    # number_edge_cases_test.exs "comma in array context",
                    # tagged :layer5_target — deferred there)
                    m = _COMMA_NUM_TAIL_RE.match(self.s, self.i)
                    if m:
                        nums = _NUM_TOKEN_RE.findall(m.group(1))
                        obj[key] = ",".join(nums)
                        self._rep(LAYER_SYNTAX,
                                  "joined comma-separated numbers after value-less key")
                        self.i = m.end()
                        return obj
                if obj:
                    obj[key] = ""
                    self._rep(LAYER_SYNTAX, "added empty value for value-less key")
                else:
                    # set-style `{'a', 'b'}` -> array coercion
                    array_mode = True
                    # set-style elements are VALUES: literal words map to
                    # their JSON values (`{'a', TRUE}` -> ["a", true])
                    items.append(LITERALS[key] if key in LITERALS else key)
                    self._rep(LAYER_SYNTAX, "coerced object without colons to array", pos=self.i)
            else:
                # missing colon: `{"key" "value"}`
                # (reference layer3/post_processors.ex:25-39,525-629)
                self._rep(LAYER_SYNTAX, "added missing colon")
                v = self.parse_value(depth + 1)
                if v is SKIP:
                    v = ""
                obj[key] = v
        if dangling_key is not None:
            if parent_is_array:
                # `[{"key": "value", "key` -> [{"key": "value"}, ["key"]]
                self.pending_sibling = [dangling_key]
            else:
                obj[dangling_key] = ""
        if array_mode and not obj:
            return items
        if array_mode and obj:
            # mixed: keep the object, append stray items under a lineage note
            self._rep(LAYER_SYNTAX, "dropped stray non-pair items in object")
        return obj

    def parse_key(self):
        c = self.peek()
        if c in "\"'":
            return self.parse_string(c, key_mode=True)
        if c in _IDENT_START:
            word = self._peek_word()
            self.i += len(word)
            self._rep(LAYER_SYNTAX, f"quoted unquoted key {word!r}", pos=self.i - len(word))
            return word
        if c in "0123456789-+.":
            v = self.parse_number()
            if v is SKIP:
                return None  # bare sign/dot where a key was expected: junk
            return v if isinstance(v, str) else repr(v) if isinstance(v, bool) else str(v)
        # junk where a key was expected
        self._rep(LAYER_SYNTAX, f"removed invalid character {c!r} before key")
        self.i += 1
        return None

    # --------------------------------------------------------------- array
    def parse_array(self, depth: int):
        if depth > self.max_depth:
            raise ParseError(f"max parse depth {self.max_depth} exceeded at position {self.i}")
        assert self.peek() == "["
        self.i += 1
        self.array_depth += 1
        items: list = []
        need_comma = False  # True right after a value, before a separator
        guard = -1
        while True:
            if self.i == guard:
                self.i += 1
            guard = self.i
            self.skip_ws()
            while self.peek() == ",":
                self.i += 1
                need_comma = False
                self.skip_ws()
                # ellipsis after comma: `[1, 2, ...]`
                if self.allow_ellipsis and self.s.startswith("...", self.i):
                    self._rep(LAYER_SYNTAX, "removed ellipsis placeholder")
                    while self.peek() == ".":
                        self.i += 1
                    self.skip_ws()
            if self.eof():
                self._rep(LAYER_STRUCTURAL, "added missing closing bracket at end of input")
                break
            c = self.peek()
            if c == "]":
                self.i += 1
                break
            if c == "}":
                # mismatched close against `[` frame -> treat as `]`
                # (reference structural_repair.ex:237-255)
                self._rep(LAYER_STRUCTURAL, "rewrote mismatched } as ]")
                self.i += 1
                break
            if self.allow_ellipsis and self.s.startswith("...", self.i):
                self._rep(LAYER_SYNTAX, "removed ellipsis placeholder")
                while self.peek() == ".":
                    self.i += 1
                continue
            if c in _IDENT_START:
                word = self._peek_word()
                # named keywords are junk anywhere; a generic all-caps
                # identifier is junk only where a comma/close was expected
                # (`[1, 2, 3 FOOTER]` -> FOOTER dropped, but `[1, FOO]`
                # keeps "FOO" as an unquoted value) — reference pattern4
                if (self.allow_keywords and
                        (word in KEYWORDS or (need_comma and _is_junk_marker(word) and word not in LITERALS))):
                    self._rep(LAYER_SYNTAX, f"removed debug keyword {word}")
                    self.i += len(word)
                    continue
            v = self.parse_value(depth + 1, in_array=True)
            if v is not SKIP:
                items.append(v)
                need_comma = True
            if self.pending_sibling is not None:
                items.append(self.pending_sibling)
                self.pending_sibling = None
        self.array_depth -= 1
        return items

    # -------------------------------------------------------------- string
    def _has_unescaped_ahead(self, quote: str, start: int | None = None) -> bool:
        j = self.i if start is None else start
        while j < self.n:
            c = self.s[j]
            if c == "\\":
                j += 2
                continue
            if c == quote:
                return True
            j += 1
        return False

    def parse_string(self, quote: str, key_mode: bool = False, plain: bool = False) -> str:
        """Single- or double-quoted string with embedded-quote heuristics.

        Termination rule at a candidate closing quote (reference
        layer3/syntax_normalization.ex:612-650): the quote closes the string
        unless the immediately following character is alphanumeric (then it
        is an embedded quote and is kept literally).  After an embedded
        quote has been seen, a quote directly before `}`/`]` is also kept
        (`{"key": "v"alue"}` -> value `v"alue"`).  Unterminated strings are
        closed at the first structural delimiter or EOF (reference
        lib/json_remedy.ex:645-688 and syntax_normalization.ex:529-541).
        """
        assert self.peek() == quote
        start = self.i
        self.i += 1
        if quote == "'":
            self._rep(LAYER_SYNTAX, "normalized single-quoted string", pos=start)
        if not plain and self.peek() == quote:
            # quote RUN at string start: doubled/tripled quotes — the
            # reference's declared Layer-5 target (deferred there; see
            # test/missing_patterns/doubled_quotes_test.exs and
            # layer3/hardcoded_patterns.ex:237-244 no-op).  Rules:
            #   run + terminator            -> empty string (whole run)
            #   run + whitespace            -> CLOSED empty string (the gap
            #     means the run is open+close, e.g. `["" 1]`, `{"a": ""
            #     "b": 1}` — round-1 recovery for missing commas takes over)
            #   run + content directly      -> doubled opening
            #     (`""value""` -> "value", json_repair parse_string.py:54-93)
            j = self.i
            while j < self.n and self.s[j] == quote:
                j += 1
            terms = ":,}" if key_mode else ",}]"
            after_ns = self._next_nonspace(j)
            after_direct = self.s[j] if j < self.n else ""
            if after_ns == "" or after_ns in terms:
                # all-quote token: empty string; N>2 means doubled quotes
                if j - start > 2:
                    self._rep(LAYER_SYNTAX, "removed doubled quotes around empty string", pos=start)
                self.i = j
                return ""
            if after_direct in _WS:
                # `"" x` — a doubled OPENING is always glued to its
                # content; a gap means this run closed an empty string
                self.i = start + 2
                return ""
            self._rep(LAYER_SYNTAX, "removed doubled opening quotes", pos=start)
            self.i = j
            return self._parse_doubled_string(quote, start)
        if not self._has_unescaped_ahead(quote):
            # unterminated: consume until `}` / `]` (string-unaware — we are
            # the string) or EOF
            out = []
            while not self.eof():
                c = self.s[self.i]
                if c in "}]":
                    break
                if c == "\\" and self.i + 1 < self.n:
                    out.append(self._decode_escape())
                    continue
                out.append(c)
                self.i += 1
            self._rep(LAYER_SYNTAX, "closed unterminated string", pos=start)
            return "".join(out).rstrip()
        out = []
        had_embedded = False
        s, n = self.s, self.n
        while not self.eof():
            # bulk-copy ordinary chars up to the next quote/backslash;
            # bound the backslash search by the quote position so neither
            # scan runs past the current string
            jq = s.find(quote, self.i)
            jb = s.find("\\", self.i, jq if jq != -1 else n)
            if jb != -1:
                j = jb
            elif jq != -1:
                j = jq
            else:
                j = n
            if j > self.i:
                out.append(s[self.i:j])
                self.i = j
            if self.i >= n:
                break
            c = s[self.i]
            if c == "\\" and self.i + 1 < self.n:
                out.append(self._decode_escape())
                continue
            if c == quote:
                nxt = self.s[self.i + 1] if self.i + 1 < self.n else ""
                if not plain and nxt and (nxt.isalnum() or nxt == "_"):
                    # embedded quote: keep it, stay in string
                    had_embedded = True
                    self._rep(LAYER_SYNTAX, "escaped embedded quote")
                    out.append(c)
                    self.i += 1
                    continue
                if had_embedded and nxt in "}]":
                    # `v"alue"}` -> the final quote is also part of the value
                    # and the string ends here (the `}` closes the object)
                    out.append(c)
                    self.i += 1
                    return "".join(out)
                self.i += 1
                if not plain and self.i < n and s[self.i] == quote:
                    # asymmetric doubled CLOSE: `"value""` -> consume the
                    # stray quote run when a terminator follows
                    m2 = self.i
                    while m2 < n and s[m2] == quote:
                        m2 += 1
                    k2 = m2
                    while k2 < n and s[k2] in " \t\r\n":
                        k2 += 1
                    after2 = s[k2] if k2 < n else ""
                    if after2 == "" or after2 in ":,}]":
                        self._rep(LAYER_SYNTAX, "removed doubled closing quote")
                        self.i = m2
                return "".join(out)
            out.append(c)
            self.i += 1
        self._rep(LAYER_SYNTAX, "closed unterminated string", pos=start)
        return "".join(out)

    def _parse_doubled_string(self, quote: str, start: int) -> str:
        """Content scan after a doubled/tripled opening quote run.

        Close rule mirrors the normal-string path: a run of >=2 quotes
        always closes (doubled close); a single quote followed DIRECTLY by
        an identifier char is embedded content (the `"v"alue"` heuristic);
        any other single quote closes (asymmetric `""value"`).  A doubled
        string with NO quote ahead stops at `}`/`]`/EOF exactly like the
        pre-existing unterminated-string branch — it must not swallow the
        enclosing structure."""
        out: list[str] = []
        s, n = self.s, self.n
        if not self._has_unescaped_ahead(quote):
            while not self.eof():
                c = s[self.i]
                if c in "}]":
                    break
                if c == "\\" and self.i + 1 < n:
                    out.append(self._decode_escape())
                    continue
                out.append(c)
                self.i += 1
            self._rep(LAYER_SYNTAX, "closed unterminated string", pos=start)
            return "".join(out).rstrip()
        while not self.eof():
            c = s[self.i]
            if c == "\\" and self.i + 1 < n:
                out.append(self._decode_escape())
                continue
            if c == quote:
                m = self.i
                while m < n and s[m] == quote:
                    m += 1
                runlen = m - self.i
                if runlen >= 2:
                    self.i = m
                    return "".join(out)
                nxt = s[m] if m < n else ""
                if nxt and (nxt.isalnum() or nxt == "_"):
                    # embedded quote: keep it, stay in string
                    out.append(c)
                    self.i += 1
                    continue
                self.i = m
                return "".join(out)
            out.append(c)
            self.i += 1
        self._rep(LAYER_SYNTAX, "closed unterminated string", pos=start)
        return "".join(out)

    def _decode_escape(self) -> str:
        """Decode one backslash escape at self.i (pointing at the backslash)."""
        e = self.s[self.i + 1]
        if e == "u" and self.i + 5 < self.n:
            hexs = self.s[self.i + 2:self.i + 6]
            try:
                cp = int(hexs, 16)
                self.i += 6
                if 0xD800 <= cp <= 0xDBFF and self.s.startswith("\\u", self.i) and self.i + 5 < self.n:
                    lo = int(self.s[self.i + 2:self.i + 6], 16)
                    if 0xDC00 <= lo <= 0xDFFF:
                        self.i += 6
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                return chr(cp)
            except ValueError:
                pass
        if e in _ESCAPES:
            self.i += 2
            if e == "'":
                self._rep(LAYER_SYNTAX, "unescaped invalid \\' escape")
            return _ESCAPES[e]
        # unknown escape: keep both chars
        self.i += 2
        return "\\" + e

    # -------------------------------------------------------------- number
    def parse_number(self, plain: bool = False):
        """Number with edge-case normalization (reference
        layer3/binary_processors.ex:240-455): thousands separators,
        underscores, leading dots, incomplete exponents, ranges/fractions/
        versions/currency -> quoted strings."""
        start = self.i
        s, n = self.s, self.n
        i = self.i
        while i < n:
            c = s[i]
            if c.isdigit() or c in "._$€£¥/":
                i += 1
            elif c in "+-":
                # sign at start, after exponent, or a range `10-20`
                if i == start or s[i - 1] in "eE" or (c == "-" and s[i - 1].isdigit()):
                    i += 1
                else:
                    break
            elif c in "eE":
                if plain and not (
                    i + 1 < n and (s[i + 1].isdigit() or (s[i + 1] in "+-" and i + 2 < n and s[i + 2].isdigit()))
                ):
                    break
                i += 1
            elif c == ",":
                # thousands separator: exactly 3 digits then a non-digit
                if (
                    i + 3 < n
                    and s[i + 1:i + 4].isdigit()
                    and (i + 4 >= n or not s[i + 4].isdigit())
                ):
                    i += 4
                else:
                    break
            elif c.isalpha():
                if plain:
                    break
                i += 1
            else:
                break
        token = s[start:i]
        self.i = i
        # stray quote right after a number value: `12345",` -> 12345
        if self.peek() == '"' and self._next_nonspace(self.i + 1) in ",}]:" + "":
            self._rep(LAYER_SYNTAX, "removed stray quote after number")
            self.i += 1
        return self._classify_number(token, start)

    def _classify_number(self, token: str, pos: int):
        raw = token
        # incomplete exponent `1e` / `1e+` -> drop it
        if _INCOMPLETE_EXP_RE.search(token):
            token = _INCOMPLETE_EXP_RE.sub("", token)
            self._rep(LAYER_SYNTAX, "removed incomplete exponent", pos=pos)
        t = token
        if "_" in t and re.fullmatch(r"[+-]?\d[\d_]*(?:\.\d[\d_]*)?", t):
            t = t.replace("_", "")
            self._rep(LAYER_SYNTAX, "removed underscore separators", pos=pos)
        if "," in t and re.fullmatch(r"[+-]?\d{1,3}(?:,\d{3})+(?:\.\d+)?", t):
            t = t.replace(",", "")
            self._rep(LAYER_SYNTAX, "removed thousands separators", pos=pos)
        if t.startswith("+"):
            t = t[1:]
        if t in ("-", "+", ".", "-.", "") or raw in ("-", "+", "."):
            # a bare sign/dot is junk, not a value (`[- ]` -> [])
            self._rep(LAYER_SYNTAX, f"removed stray token {raw!r}", pos=pos)
            return SKIP
        if _INT_RE.match(t):
            return int(t)
        if t.endswith(".") and _INT_RE.match(t[:-1]):
            self._rep(LAYER_SYNTAX, "completed trailing decimal point", pos=pos)
            return float(t)
        if t.startswith(".") and _FLOAT_RE.match("0" + t):
            self._rep(LAYER_SYNTAX, "added leading zero to decimal", pos=pos)
            return float("0" + t)
        if t.startswith("-.") and _FLOAT_RE.match("-0" + t[1:]):
            self._rep(LAYER_SYNTAX, "added leading zero to decimal", pos=pos)
            return float("-0" + t[1:])
        if _FLOAT_RE.match(t):
            return float(t)
        # ranges, fractions, versions, currency, trailing units -> string
        self._rep(LAYER_SYNTAX, f"quoted non-numeric token {raw!r}", pos=pos)
        return raw

    # ---------------------------------------------------------- identifier
    def parse_identifier_value(self):
        """Bare identifier at a value position: literal normalization
        (True/False/None/...), debug-keyword removal, else quote as string
        with multi-word lookahead (reference binary_processors.ex:42-145,
        487-523: `Weiss Savage` -> "Weiss Savage")."""
        word = self._peek_word()
        wstart = self.i
        self.i += len(word)
        if word in LITERALS:
            if word not in ("true", "false", "null"):
                self._rep(LAYER_SYNTAX, f"normalized literal {word}", pos=wstart)
            return LITERALS[word]
        if self.allow_keywords and word in KEYWORDS:
            self._rep(LAYER_SYNTAX, f"removed debug keyword {word}", pos=wstart)
            return SKIP
        words = [word]
        # multi-word lookahead: absorb following bare words unless the next
        # word is a key (followed by ':')
        while True:
            save = self.i
            j = self.i
            while j < self.n and self.s[j] in " \t":
                j += 1
            if j >= self.n or self.s[j] not in _IDENT_START:
                break
            self.i = j
            nxt = self._peek_word()
            after = self._next_nonspace(j + len(nxt))
            if after == ":":
                self.i = save
                break
            self.i = j + len(nxt)
            words.append(nxt)
        # stray quote right after: `abcdef",` -> "abcdef"
        if self.peek() == '"':
            nxt = self._next_nonspace(self.i + 1)
            if nxt in ",}]" or nxt == "":
                self._rep(LAYER_SYNTAX, "removed stray quote after unquoted value")
                self.i += 1
        value = " ".join(words)
        self._rep(LAYER_SYNTAX, f"quoted unquoted value {value!r}", pos=wstart)
        return value

    # ---------------------------------------------------------------- html
    _VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed", "source", "track", "wbr", "!doctype"})

    def parse_html_value(self):
        """Unquoted HTML at a value position -> quote the whole fragment
        (reference layer3/html_handlers.ex:16-85,258-284).  Consumes until a
        structural delimiter at tag-depth 0.

        Bail-out: a '<' with no well-formed first tag, or an opening tag
        whose close never appears, is NOT HTML — treat the '<' as a stray
        char instead of swallowing the rest of the document."""
        start = self.i
        gt = self.s.find(">", start + 1, start + 512)
        if gt == -1:
            self._rep(LAYER_SYNTAX, "removed stray '<'")
            self.i += 1
            return SKIP
        first_tag = self.s[start + 1:gt].strip()
        first_name = first_tag.split()[0].lower() if first_tag.split() else ""
        if not (first_tag.startswith("!")
                or first_name.rstrip("/") in self._VOID_TAGS
                or first_tag.endswith("/")):
            if not first_name.isalnum() or f"</{first_name}" not in self.s[gt:].lower():
                self._rep(LAYER_SYNTAX, "removed stray '<'")
                self.i += 1
                return SKIP
        depth = 0
        seen_tag = False
        i = self.i
        s, n = self.s, self.n
        while i < n:
            c = s[i]
            if c == "<":
                j = s.find(">", i + 1)
                if j == -1:
                    i = n
                    break
                tag = s[i + 1:j].strip()
                name = tag.split()[0].lower() if tag.split() else ""
                if tag.startswith("!") or name.rstrip("/") in self._VOID_TAGS or tag.endswith("/"):
                    pass
                elif tag.startswith("/"):
                    depth = max(0, depth - 1)
                else:
                    depth += 1
                seen_tag = True
                i = j + 1
                continue
            if depth == 0 and seen_tag and c in ",}]":
                break
            i += 1
        value = s[start:i].strip()
        self.i = i
        self._rep(LAYER_SYNTAX, "quoted unquoted HTML value", pos=start)
        return value


# ---------------------------------------------------------------- document

_JSON_START = set('{["\'-+.0123456789tfn')


def _same_structure(a, b) -> bool:
    """Structurally identical (same keys / same shape, values may differ) —
    the 'updates replace previous value' rule
    (reference utils/multiple_json_detector.ex:252-268)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return sorted(a.keys()) == sorted(b.keys())
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_same_structure(x, y) for x, y in zip(a, b))
    return False


def _is_empty(v) -> bool:
    return (isinstance(v, str) and v == "") or (isinstance(v, (list, dict)) and len(v) == 0)


def parse_document(s: str, repairs: list[Repair] | None = None, max_depth: int = 128,
                   allow_multiple: bool = True, allow_merge: bool = True,
                   allow_ellipsis: bool = True, allow_keywords: bool = True):
    """Parse one document into a JSON value, tolerating and repairing
    malformations.  Implements the top-level multiple-JSON-values
    aggregation (reference utils/multiple_json_detector.ex:28-107) and
    object-boundary merging (reference layer3/object_merger.ex:20-92).

    Returns (value, repairs).  Raises ParseError on pathological input.
    """
    p = TolerantParser(s, repairs=repairs, max_depth=max_depth,
                       allow_ellipsis=allow_ellipsis, allow_keywords=allow_keywords)
    p.skip_ws()
    wrapper_text = (not p.eof()) and p.peek() not in _JSON_START
    values: list = []
    parsed_count = 0
    guard = -1
    while not p.eof():
        if p.i == guard:
            p.i += 1
            continue
        guard = p.i
        p.skip_ws()
        if p.eof():
            break
        c = p.peek()
        # ---- object continuation / trailing-empty after a dict
        if values and isinstance(values[-1], dict) and c == ",":
            rest = p.s[p.i + 1:]
            if _EMPTY_TRAILER_RE.match(rest):
                # `{...}, []` / `{...}, {}` -> drop the empty trailer
                # (reference layer3/object_merger.ex:95-194)
                p._rep(LAYER_PREPROCESSING, "dropped trailing empty structure")
                break
            if allow_merge and _KEY_AHEAD_RE.match(rest):
                p.i += 1
                p._rep(LAYER_PREPROCESSING, "merged object boundary")
                p.parse_object(1, cont_into=values[-1])
                parsed_count += 1
                continue
        if values and isinstance(values[-1], dict) and allow_merge and _KEY_AHEAD_RE.match(p.s[p.i:]) and c not in "{[":
            # `{"a":"b"} "c":"d"}` without comma
            p._rep(LAYER_PREPROCESSING, "merged object boundary")
            p.parse_object(1, cont_into=values[-1])
            parsed_count += 1
            continue
        # ---- junk / literal words at top level
        if c in _IDENT_START:
            word = p._peek_word()
            if word in LITERALS:
                v = p.parse_identifier_value()
                _update_values(values, v, p)
                parsed_count += 1
                continue
            # bare prose word at top level is junk (wrapper text)
            p.i += len(word)
            continue
        if c not in _JSON_START:
            p.i += 1  # junk char
            continue
        if c == "'":
            # top-level single quotes are wrapper-prose apostrophes unless a
            # quoted token with a JSON continuation follows (`'abc',` etc.)
            j = p.i + 1
            while j < p.n and p.s[j] != "'" and j - p.i < 80:
                j += 1
            nxt = p._next_nonspace(j + 1) if j < p.n and p.s[j] == "'" else ""
            looks_like_string = bool(nxt) and nxt in ",:]}"
            if not looks_like_string:
                p.i += 1
                continue
        v = p.parse_value(0)
        if v is SKIP:
            continue
        _update_values(values, v, p)
        parsed_count += 1
        if not allow_multiple and values:
            break
    # ---- post rules (reference utils/multiple_json_detector.ex:44-75)
    if wrapper_text and any(isinstance(v, (list, dict)) for v in values):
        last_struct = max(i for i, v in enumerate(values) if isinstance(v, (list, dict)))
        if last_struct < len(values) - 1:
            p.repairs.append(Repair(LAYER_PREPROCESSING, "dropped trailing primitives after structures", None))
            values = values[: last_struct + 1]
    if len(values) == 2 and values[0] == []:
        return (values[0] if _is_empty(values[1]) else values[1]), p.repairs
    if len(values) == 1:
        return values[0], p.repairs
    if not values:
        return SKIP, p.repairs
    return values, p.repairs


def _update_values(values: list, v, p: TolerantParser) -> None:
    if values and _same_structure(values[-1], v):
        p.repairs.append(Repair(LAYER_PREPROCESSING, "replaced structurally identical previous value", None))
        values[-1] = v
    else:
        values.append(v)
