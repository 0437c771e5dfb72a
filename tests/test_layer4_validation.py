"""Full port of the reference Layer-4 validation suite.

Reference: test/layer4/validation_test.exs (52 tests).  The Elixir
`Validation.process/2` maps to `try_fast_path` here: `{:ok, parsed, ctx}`
== (True, value); `{:continue, input, ctx}` == (False, None) with the
input left untouched for the repair layers.  Elixir-runtime-specific
tests (priority/0, name/0, atom keys, Task scheduling) are adapted to
the nearest Python equivalent; the behavioral assertions are identical.
"""

from __future__ import annotations

import json
import threading

import pytest

from json_remedy_ray import repair
from json_remedy_ray.repair.layer4 import try_fast_path, validate_strict


# ---------------------------------------------------- contract (exs:7-62)

def test_process_signature_and_result_types():
    ok, value = try_fast_path('{"name": "Alice"}')
    assert ok is True and value == {"name": "Alice"}
    ok, value = try_fast_path("{name: 'Alice'}")
    assert ok is False and value is None


def test_supports_any_potentially_valid_input():
    # the fast path is TRIED on everything parse-shaped; it succeeds only
    # on valid JSON (reference supports?/1 semantics)
    for s in ['{"valid": true}', "[1, 2, 3]", '"string"', "42", "true", "null"]:
        assert try_fast_path(s)[0] is True
    for s in ["{name: 'Alice'}", "[1, 2, 3,]"]:
        assert try_fast_path(s)[0] is False
    # nil / empty never fast-path
    assert try_fast_path("")[0] is False


# ------------------------------------------ basic validation (exs:63-156)

def test_validates_simple_object():
    ok, r = try_fast_path('{"name": "Alice", "age": 30, "active": true}')
    assert ok and r["name"] == "Alice" and r["age"] == 30 and r["active"] is True


def test_validates_empty_object():
    ok, r = try_fast_path("{}")
    assert ok and r == {}


def test_validates_multiple_kv_types():
    ok, r = try_fast_path('{"str": "value", "num": 42, "bool": false, "null": null}')
    assert ok and r == {"str": "value", "num": 42, "bool": False, "null": None}


def test_validates_whitespace_variations():
    ok, r = try_fast_path(' { "key" : "value" } ')
    assert ok and r["key"] == "value"


def test_validates_special_characters_in_strings():
    ok, r = try_fast_path('{"quote": "Say \\"hello\\"", "backslash": "Path\\\\to\\\\file"}')
    assert ok and r["quote"] == 'Say "hello"' and r["backslash"] == "Path\\to\\file"


def test_validates_nested_structures():
    ok, r = try_fast_path('{"user": {"profile": {"settings": {"theme": "dark"}}}}')
    assert ok and r["user"]["profile"]["settings"]["theme"] == "dark"


def test_validates_object_containing_arrays():
    ok, r = try_fast_path('{"numbers": [1, 2, 3], "mixed": [1, "two", true, null]}')
    assert ok and r["numbers"] == [1, 2, 3] and r["mixed"] == [1, "two", True, None]


def test_validates_arrays_containing_objects():
    ok, r = try_fast_path('[{"name": "Alice"}, {"name": "Bob"}, {"name": "Charlie"}]')
    assert ok and [x["name"] for x in r] == ["Alice", "Bob", "Charlie"]


def test_validates_all_primitive_types():
    ok, r = try_fast_path(
        '{"string": "text", "integer": 42, "float": 3.14, "boolean_true": true, '
        '"boolean_false": false, "null_value": null}')
    assert ok and r == {"string": "text", "integer": 42, "float": 3.14,
                        "boolean_true": True, "boolean_false": False, "null_value": None}


# ------------------------------------------ fast path (exs:156-199)

def test_fast_path_on_clean_json_preserves_prior_repairs():
    # repair() tries the fast path FIRST: valid input -> zero repairs
    res = repair('{"repaired": "value"}')
    assert res.ok and res.repairs == [] and res.repaired_json == '{"repaired":"value"}'


def test_fast_path_returns_parsed_terms():
    ok, r = try_fast_path('[1, "two", true, null, ["nested"]]')
    assert ok and r == [1, "two", True, None, ["nested"]]


def test_fast_path_large_valid_json():
    data = [{"id": i, "data": f"value_{i}"} for i in range(1, 101)]
    ok, r = try_fast_path(json.dumps(data))
    assert ok and len(r) == 100 and r[0]["id"] == 1


def test_validates_complex_deeply_nested():
    ok, r = try_fast_path('{"level1": {"level2": {"level3": {"meta": {"valid": true}}}}}')
    assert ok and r["level1"]["level2"]["level3"]["meta"]["valid"] is True


# --------------------------------- decode-error handling (exs:200-260)

@pytest.mark.parametrize("inp", [
    '{"missing": "closing brace"',
    '["missing", "closing bracket"',
    '"missing": "opening brace"}',
    '"missing", "opening bracket"]',
    '{"mismatched": "delimiter"]',
])
def test_decode_error_invalid_syntax(inp):
    assert try_fast_path(inp) == (False, None)


@pytest.mark.parametrize("inp", [
    '{"name": "Alice", "age":',
    "[1, 2, 3",
    '{"nested": {"incomplete":',
    '[{"id": 1}, {"id": 2',
])
def test_decode_error_truncated(inp):
    assert try_fast_path(inp) == (False, None)


@pytest.mark.parametrize("inp", [
    "{name: \"Alice\"}",
    "{user: {name: \"Bob\"}}",
    "[{id: 1, active: true}]",
])
def test_decode_error_unquoted_keys(inp):
    assert try_fast_path(inp) == (False, None)


@pytest.mark.parametrize("inp", [
    '{"active": True}',
    '{"inactive": False}',
    '{"empty": None}',
    "[True, False, None]",
])
def test_decode_error_python_booleans(inp):
    assert try_fast_path(inp) == (False, None)


# ------------------------------------- pass-through (exs:262-316)

@pytest.mark.parametrize("inp", [
    "{name: 'Alice'}",
    "{'name': 'Alice'}",
    '{"trailing": "comma",}',
    '{"missing" "colon"}',
    '// comment\n{"valid": true}',
])
def test_continue_for_malformed(inp):
    ok, v = try_fast_path(inp)
    assert ok is False and v is None  # input untouched: caller keeps it


def test_preserves_input_exactly_when_passing_through():
    inp = " { name : 'Alice' , active : True } "
    s_before = inp
    assert try_fast_path(inp) == (False, None)
    assert inp == s_before  # strings immutable, but asserts intent


def test_malformed_does_not_fabricate_repairs():
    # the repair() pipeline records repairs only from layers that ACTED
    res = repair('{"a":1}')
    assert res.repairs == []


# -------------------------------------- edge cases (exs:317-350)

def test_handles_empty_string():
    assert try_fast_path("") == (False, None)


def test_handles_very_large_json():
    data = [f"item_{i}" for i in range(1, 10_001)]
    ok, r = try_fast_path(json.dumps(data))
    assert ok and len(r) == 10_000


def test_handles_max_nesting_depth():
    value = "deep_value"
    obj = value
    for _ in range(100):
        obj = {"nested": obj}
    ok, r = try_fast_path(json.dumps(obj))
    assert ok
    for _ in range(100):
        r = r["nested"]
    assert r == value


# ---------------------------------------- UTF-8 (exs:351-378)

def test_utf8_keys_and_values():
    ok, r = try_fast_path('{"café": "piñata", "москва": "киев"}')
    assert ok and r["café"] == "piñata" and r["москва"] == "киев"


def test_emoji_values():
    ok, r = try_fast_path('{"reaction": "👍", "weather": "☀️🌧️"}')
    assert ok and r["reaction"] == "👍" and r["weather"] == "☀️🌧️"


def test_malformed_utf8_handled_gracefully():
    # surrogate escapes parse but are sanitized in canonical output
    res = repair('{"invalid": "\\udcff"}')
    assert res.ok
    res.repaired_json.encode("utf-8")  # must not raise


# ------------------------- integration with previous layers (exs:381-427)

def test_processes_layer3_output():
    res = repair("{'name': 'Alice', 'age': 30}")
    assert res.ok
    assert json.loads(res.repaired_json) == {"name": "Alice", "age": 30}
    assert any("single-quoted" in rep.action or "quote" in rep.action.lower()
               for rep in res.repairs)


def test_validates_repaired_json_from_all_layers():
    res = repair('```json\n{"user": {"profile": {"active": True}}\n```')
    assert res.ok
    assert json.loads(res.repaired_json)["user"]["profile"]["active"] is True
    layers = {rep.layer for rep in res.repairs}
    assert len(layers) >= 2  # content cleaning + syntax at least


def test_preserves_repair_history_order():
    res = repair("```json\n{'a': True,}\n```")
    assert res.ok and len(res.repairs) >= 2
    # layer-1 actions recorded before layer-3/5 actions
    first_layers = [rep.layer for rep in res.repairs]
    assert first_layers.index("content_cleaning") == 0


# ------------------------------------ performance (exs:429-479)

def test_fast_path_quick_on_simple_json():
    import time

    try_fast_path('{"performance": "test"}')  # warm
    t0 = time.perf_counter()
    for _ in range(100):
        try_fast_path('{"performance": "test"}')
    assert (time.perf_counter() - t0) / 100 < 0.001  # well under 1 ms


def test_no_leak_on_repeated_calls():
    for _ in range(1000):
        ok, _ = try_fast_path('{"memory": "test"}')
        assert ok


# ------------------------------------- option validation (exs:480-515)

def test_strict_mode_option_surface():
    # strict mode is the engine's validation option: dup/empty keys reject
    ok, v = validate_strict('{"test": "value"}')
    assert ok and v == {"test": "value"}
    ok, why = validate_strict('{"a": 1, "a": 2}')
    assert not ok and "duplicate" in why
    ok, why = validate_strict('{"": 1}')
    assert not ok


def test_unknown_config_fields_rejected():
    from json_remedy_ray.config import RepairConfig

    with pytest.raises(TypeError):
        RepairConfig(invalid_option=True)  # noqa: unexpected keyword


# ------------------------------------ security and safety (exs:516-547)

def test_malicious_deep_nesting_safe():
    malicious = '{"a":' * 1000 + "1" + "}" * 1000
    ok, v = try_fast_path(malicious)
    assert ok or v is None  # parse or pass through, never crash
    res = repair(malicious)  # full pipeline is depth-guarded
    assert res.ok or res.error


def test_json_bomb_array_safe():
    bomb = "[" + '"x",' * 100_000 + '"x"]'
    ok, r = try_fast_path(bomb)
    assert ok and len(r) == 100_001


def test_long_string_value_safe():
    long_string = "x" * 1_000_000
    ok, r = try_fast_path('{"data": "%s"}' % long_string)
    assert ok and len(r["data"]) == 1_000_000


# ------------------------------------- real-world scenarios (exs:548-614)

def test_api_response_json():
    api_response = """
    {
      "status": "success",
      "data": {
        "users": [
          {"id": 1, "name": "Alice", "email": "alice@example.com"},
          {"id": 2, "name": "Bob", "email": "bob@example.com"}
        ]
      },
      "meta": {"total": 2, "page": 1, "per_page": 10}
    }
    """
    ok, r = try_fast_path(api_response)
    assert ok and r["status"] == "success"
    assert len(r["data"]["users"]) == 2 and r["meta"]["total"] == 2


def test_configuration_file_json():
    config_json = """
    {
      "database": {"host": "localhost", "port": 5432, "name": "myapp_prod", "ssl": true},
      "cache": {"redis_url": "redis://localhost:6379/0", "ttl": 3600},
      "features": {"new_ui": true, "beta_features": false}
    }
    """
    ok, r = try_fast_path(config_json)
    assert ok and r["database"]["host"] == "localhost"
    assert r["cache"]["ttl"] == 3600 and r["features"]["new_ui"] is True


def test_user_input_json():
    ok, r = try_fast_path(
        '{"name": "John Doe", "preferences": {"theme": "dark", "notifications": true}}')
    assert ok and r["name"] == "John Doe" and r["preferences"]["theme"] == "dark"


# ----------------------------------------- concurrency (exs:615-690)

def test_multiple_simultaneous_validations():
    results = {}

    def worker(i):
        ok, r = try_fast_path('{"concurrent": "test"}')
        results[i] = (ok, r)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(ok and r["concurrent"] == "test" for ok, r in results.values())


def test_thread_safety_distinct_inputs():
    inputs = ['{"test1": "value1"}', '{"test2": "value2"}', '{"test3": "value3"}']
    results = [None] * 3

    def worker(i):
        results[i] = try_fast_path(inputs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (ok, r) in enumerate(results):
        assert ok and r == {f"test{i + 1}": f"value{i + 1}"}


def test_no_shared_state_corruption():
    # two concurrent full repairs must keep separate repair lists
    out = [None, None]

    def worker(i, s):
        out[i] = repair(s)

    t1 = threading.Thread(target=worker, args=(0, "{'a': 1,}"))
    t2 = threading.Thread(target=worker, args=(1, '{"b": 2}'))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert out[0].ok and out[1].ok
    assert len(out[0].repairs) >= 1 and out[1].repairs == []
