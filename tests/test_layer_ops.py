"""Unit tests for the standalone string -> string layer operators."""

from __future__ import annotations

from json_remedy_ray.repair import detectors, layer1, layer2, layer3


# ---------------------------------------------------------------- detectors

def test_plain_text_detector():
    assert detectors.plain_text("hello world")
    assert detectors.plain_text("")
    assert not detectors.plain_text('{"a":1}')
    assert not detectors.plain_text("true")
    assert not detectors.plain_text("-12.5")


def test_layer_gates():
    assert detectors.layer1_supports('```json {"a":1} ```')
    assert detectors.layer2_supports('{"a": 1')
    assert not detectors.layer2_supports('{"a": "}"}')  # brace inside string
    assert detectors.layer3_supports("{'a': 1}")
    assert detectors.layer3_supports('{"a": True}')
    assert not detectors.layer3_supports('{"a": 1}')


# ------------------------------------------------------------------ layer 1

def test_remove_comments_string_aware():
    out, reps = layer1.remove_comments('{"url": "http://x//y", "a": 1 // c\n}')
    assert out == '{"url": "http://x//y", "a": 1 \n}'
    assert len(reps) == 1


def test_nested_block_comments():
    out, _ = layer1.remove_comments('{"a": /* x /* y */ z */ 1}')
    assert out == '{"a":  1}'


def test_strip_trailing_dots_threshold():
    out, reps = layer1.strip_trailing_dots('{"k": "v...........', 10)
    assert out == '{"k": "v'
    out2, reps2 = layer1.strip_trailing_dots('{"k": "v..."}', 10)
    assert out2 == '{"k": "v..."}' and reps2 == []


def test_code_fence_single_block():
    out, _ = layer1.remove_code_fences('```json\n{"a": 1}\n```')
    assert out == '{"a": 1}'


def test_code_fence_unterminated():
    out, _ = layer1.remove_code_fences('```json\n{"a": 1}')
    assert out == '{"a": 1}'


# ------------------------------------------------------------------ layer 2

def test_l2_missing_closers():
    out, reps = layer2.repair_structure('{"a": [1, 2')
    assert out == '{"a": [1, 2]}'
    assert len(reps) == 2


def test_l2_extra_closers():
    out, _ = layer2.repair_structure('{"a": 1}}')
    assert out == '{"a": 1}'


def test_l2_mismatched():
    assert layer2.repair_structure('{"a": [1, 2}')[0] == '{"a": [1, 2]}'
    assert layer2.repair_structure('[{"a": 1]')[0] == '[{"a": 1}]'


def test_l2_reference_unit_cases():
    """Pairs from reference test/unit/layer2_structural_repair_test.exs:5-171."""
    cases = [
        ('{"name": "Alice"', '{"name": "Alice"}'),
        ('{"name": "Alice", "age": 30', '{"name": "Alice", "age": 30}'),
        ('{"nested": {"inner": "value"', '{"nested": {"inner": "value"}}'),
        ("[1, 2, 3", "[1, 2, 3]"),
        ('[{"name": "Alice"}, {"name": "Bob"}', '[{"name": "Alice"}, {"name": "Bob"}]'),
        ("[[1, 2], [3, 4]", "[[1, 2], [3, 4]]"),
        ('{"level1": {"level2": {"level3": "value"',
         '{"level1": {"level2": {"level3": "value"}}}'),
        ('{"name": "Alice"}}', '{"name": "Alice"}'),
        ('{"name": "Alice"}}}', '{"name": "Alice"}'),
        ('{{"name": "Alice"}}', '{"name": "Alice"}'),
        ("[1, 2, 3]]", "[1, 2, 3]"),
        ("[1, 2, 3]]]", "[1, 2, 3]"),
        ("[[1, 2, 3]]", "[1, 2, 3]"),
        ('{"name": "Alice"]', '{"name": "Alice"}'),
        ('["item1", "item2"}', '["item1", "item2"]'),
        ('{"data": [1, 2, 3}', '{"data": [1, 2, 3]}'),
        ('[{"name": "Alice"}]', '[{"name": "Alice"}]'),
        ('{"users": [{"name": "Alice"}, {"name": "Bob"}}',
         '{"users": [{"name": "Alice"}, {"name": "Bob"}]}'),
        ('{"key": "value", "array": [1, 2, {"nested": true}]}', None),
        ('{"message": "Use { and } carefully", "note": "Arrays use [ and ]"}', None),
        ('{"message": "She said \\"hello\\" to me", "value": 42}', None),
        ("", ""),
        ("   ", "   "),
    ]
    for inp, want in cases:
        want = inp if want is None else want
        got, _ = layer2.repair_structure(inp)
        assert got == want, f"{inp!r} -> {got!r}, want {want!r}"


def test_l2_string_aware():
    out, reps = layer2.repair_structure('{"a": "}{"}')
    assert out == '{"a": "}{"}'
    assert reps == []


# ------------------------------------------------------------------ layer 3

def test_normalize_quotes():
    assert layer3.normalize_quotes("{'a': 'b'}") == '{"a": "b"}'
    # double quotes inside single-quoted string get escaped
    assert layer3.normalize_quotes("{'a': 'say \"hi\"'}") == '{"a": "say \\"hi\\""}'


def test_normalize_literals():
    assert layer3.normalize_literals('{"a": True, "b": None}') == '{"a": true, "b": null}'
    # not inside strings
    assert layer3.normalize_literals('{"a": "True"}') == '{"a": "True"}'


def test_fix_commas():
    assert layer3.fix_commas('{"a": 1,}') == '{"a": 1}'
    assert layer3.fix_commas("[1, 2,]") == "[1, 2]"
    assert layer3.fix_commas('{"a": ",}"}') == '{"a": ",}"}'


def test_quote_unquoted_keys():
    assert layer3.quote_unquoted_keys('{key: 1, other_key: 2}') == '{"key": 1, "other_key": 2}'
    assert layer3.quote_unquoted_keys('{"already": 1}') == '{"already": 1}'


def test_fix_missing_values():
    assert layer3.fix_missing_values('{"a": }') == '{"a": ""}'
    assert layer3.fix_missing_values('{"a": 1}') == '{"a": 1}'


def test_fix_colons():
    assert layer3.fix_colons('{"key" "value"}') == '{"key": "value"}'
    # array of strings must NOT get colons
    assert layer3.fix_colons('["a" "b"]') == '["a" "b"]'


def test_filter_ellipsis():
    assert layer3.filter_ellipsis("[1, 2, ...]") == "[1, 2]"
    assert layer3.filter_ellipsis("[...]") == "[]"
    assert layer3.filter_ellipsis('["..."]') == '["..."]'


def test_filter_keywords():
    assert layer3.filter_keywords('{"a":1, COMMENT "b":2}') == '{"a":1, "b":2}'


def test_normalize_number_formats():
    assert layer3.normalize_number_formats('{"n": 1,234,567}') == '{"n": 1234567}'
    assert layer3.normalize_number_formats('{"n": 1,234.56}') == '{"n": 1234.56}'
    assert layer3.normalize_number_formats("[1, 2]") == "[1, 2]"


def test_inside_string():
    s = '{"a": "b,c", "d": 1}'
    assert layer3.inside_string(s, s.index("b,c") + 1)
    assert not layer3.inside_string(s, s.index("1"))


def test_normalize_syntax_chain():
    out, reps = layer3.normalize_syntax("{'a': True, b: 1,}")
    assert out == '{"a": true, "b": 1}'
    assert reps
