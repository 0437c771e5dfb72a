"""Full port of the reference hardcoded-patterns suite.

Reference: test/unit/layer3_hardcoded_patterns_test.exs (47 tests).
Elixir `nil` maps to the Python functions' contract of str-in/str-out
(callers never pass None; the nil rows assert non-crash, ported as
empty-string rows).  The reference's fix_doubled_quotes is a declared
NO-OP there (deferred to Layer 5); this engine implements the
:layer5_target rows, exceeding parity.
"""

from __future__ import annotations

import pytest

from json_remedy_ray.repair.layer3 import fix_doubled_quotes, normalize_number_formats
from json_remedy_ray.repair.preprocessing import (
    normalize_escape_sequences,
    normalize_smart_quotes,
)


def smart(s: str) -> str:
    return normalize_smart_quotes(s)[0]


def esc(s: str) -> str:
    return normalize_escape_sequences(s)[0]


# ------------------------------------------- smart quotes (exs:24-72)

@pytest.mark.parametrize("inp,want", [
    ('{“key”: “value”}', '{"key": "value"}'),
    ('{“key”: "value"}', '{"key": "value"}'),
    ('{"outer": {“inner”: “value”}}', '{"outer": {"inner": "value"}}'),
    ('[“item1”, “item2”]', '["item1", "item2"]'),
    ("«value»", '"value"'),
    ("‹value›", '"value"'),
    ('{"key": "value"}', '{"key": "value"}'),   # standard quotes preserved
    ("", ""),
    ('{“café”: “résumé”}', '{"café": "résumé"}'),
])
def test_normalize_smart_quotes(inp, want):
    assert smart(inp) == want


def test_smart_single_quotes_normalize_to_ascii_single():
    # ‘/’ -> ' (the parser then handles single-quoted strings)
    assert smart("{‘key’: ‘value’}") == "{'key': 'value'}"


# --------------------------------------- escape sequences (exs:76-138)

@pytest.mark.parametrize("inp,want", [
    ('{"text": "hello\\tworld"}', '{"text": "hello\tworld"}'),
    ('{"text": "line1\\nline2"}', '{"text": "line1\nline2"}'),
    ('{"text": "text\\rmore"}', '{"text": "text\rmore"}'),
    ('{"text": "back\\bspace"}', '{"text": "back\bspace"}'),
    ('{"text": "form\\ffeed"}', '{"text": "form\ffeed"}'),
    ('{"emoji": "\\u263a"}', '{"emoji": "☺"}'),
    ('{"hex": "\\x41"}', '{"hex": "A"}'),
    ('{"text": "tab\\there\\nnewline"}', '{"text": "tab\there\nnewline"}'),
    ('{"text": "already\\nescaped"}', '{"text": "already\nescaped"}'),
    ("", ""),
])
def test_normalize_escape_sequences(inp, want):
    assert esc(inp) == want


def test_escape_sequences_in_keys_do_not_crash():
    # exs:130-136: result just needs to be a string
    out = esc('{"key\\n": "value"}')
    assert isinstance(out, str)


def test_escape_sequences_lone_surrogate_left_alone():
    out = esc('{"bad": "\\ud800"}')
    assert "\\ud800" in out
    out.encode("utf-8")  # must stay encodable


# ----------------------------------------- number formats (exs:143-192)

@pytest.mark.parametrize("inp,want", [
    ('{"amount": 1,234,567}', '{"amount": 1234567}'),
    ('{"price": "10/20"}', '{"price": "10/20"}'),
    ('{"value": 123.45}', '{"value": 123.45}'),
    ('{"sci": 1.23e10}', '{"sci": 1.23e10}'),
    ('{"neg": -1,234}', '{"neg": -1234}'),
    ('{"normal": 12345}', '{"normal": 12345}'),
    ('{"a": 1,234, "b": 5,678}', '{"a": 1234, "b": 5678}'),
    ('{"text": "1,234 items"}', '{"text": "1,234 items"}'),
    ("", ""),
])
def test_normalize_number_formats(inp, want):
    assert normalize_number_formats(inp) == want


# ---------------------------------------- doubled quotes (exs:199-247)

@pytest.mark.parametrize("inp,want", [
    ('{"key": ""value""}', '{"key": "value"}'),            # :layer5_target
    ('{"key": ""}', '{"key": ""}'),                        # legit empty
    ('{"a": ""val1"", "b": ""val2""}', '{"a": "val1", "b": "val2"}'),
    ('{"outer": {"inner": ""value""}}', '{"outer": {"inner": "value"}}'),
    ('{"text": "He said \\"hello\\""}', '{"text": "He said \\"hello\\""}'),
    ('[""item1"", ""item2""]', '["item1", "item2"]'),
    ("", ""),
])
def test_fix_doubled_quotes(inp, want):
    assert fix_doubled_quotes(inp) == want


# ------------------------------------------- integration (exs:252-291)

def test_patterns_combine_smart_then_escape():
    out = esc(smart('{“text”: "hello\\nworld"}'))
    assert out == '{"text": "hello\nworld"}'


def test_all_pattern_types_combined():
    inp = '{"amount": 1,234, "text": “value”, "escaped": "line\\n"}'
    out = normalize_number_formats(esc(smart(inp)))
    assert "1234" in out and "line\n" in out and '"value"' in out


def test_complex_real_world_llm_output():
    inp = '{"name": "John", "balance": 1,234.56, "message": "Hello\\nWorld"}'
    out = normalize_number_formats(esc(inp))
    assert '"name": "John"' in out and "1234.56" in out and "Hello\nWorld" in out


# ------------------------------------- edge cases / perf (exs:296-325)

def test_very_long_strings_efficient():
    long_string = "x" * 10_000
    out = smart('{"key": "%s"}' % long_string)
    assert len(out) > 10_000


def test_deeply_nested_structures():
    inp = '{“a”: {“b”: {“c”: {“d”: “value”}}}}'
    assert smart(inp) == '{"a": {"b": {"c": {"d": "value"}}}}'


def test_malformed_json_graceful():
    assert isinstance(smart('{"key": "value'), str)


def test_null_bytes_graceful():
    assert smart("test\0null") == "test\0null"


def test_escape_normalization_no_cascade():
    """Second review round: \\x5c produces a backslash — the standard-
    escape pass must NOT re-interpret it with an adjacent 'n'."""
    out = esc('{"p": "a\\x5cnb"}')
    assert out == '{"p": "a\\nb"}'  # backslash + letter n, NOT a newline
    assert "\n" not in out
