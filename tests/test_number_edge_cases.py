"""Full port of the reference number-edge-case suite.

Reference: test/missing_patterns/number_edge_cases_test.exs (45 tests).
Asserts PARSED values like the ExUnit originals (repair -> json.loads ->
compare), including the `:layer5_target`-tagged case the reference
defers (`{"key", 105,12,}`) — this engine's Layer 5 implements it.
"""

from __future__ import annotations

import json

import pytest

from json_remedy_ray import repair

CASES = [
    # python-style numeric underscores (exs:23-37)
    ('{"value": 82_461_110}', {"value": 82461110}),
    ('{"value": 1_234.5_6}', {"value": pytest.approx(1234.56)}),
    # fractions as values (exs:40-76)
    ('{"key": 1/3}', {"key": "1/3"}),
    ('{"ratio": 12345/67890}', {"ratio": "12345/67890"}),
    ('[1, 2, 1/3, 4]', [1, 2, "1/3", 4]),
    ('{"here": "now", "key": 1/3, "foo": "bar"}',
     {"here": "now", "key": "1/3", "foo": "bar"}),
    ('{"value": -5/10}', {"value": "-5/10"}),
    # ranges and dashes (exs:79-110)
    ('{"range": 10-20}', {"range": "10-20"}),
    ('{"years": 1990-2020}', {"years": "1990-2020"}),
    ('{"temp": -20}', {"temp": -20}),
    ('[10-20, 30-40]', ["10-20", "30-40"]),
    # invalid decimal formats (exs:113-137)
    ('{"version": 1.1.1}', {"version": "1.1.1"}),
    ('{"version": 2.3.4.5}', {"version": "2.3.4.5"}),
    ('{"value": 3.14159}', {"value": 3.14159}),
    # leading decimal point (exs:140-171)
    ('{"key": .25}', {"key": 0.25}),
    ('{"probability": .999}', {"probability": 0.999}),
    ('[.5, .75, 1.0]', [0.5, 0.75, 1.0]),
    ('{"value": -.5}', {"value": -0.5}),
    # text-number hybrids (exs:174-205)
    ('{"key": 1notanumber}', {"key": "1notanumber"}),
    ('[1, 2notanumber]', [1, "2notanumber"]),
    ('{"count": 42}', {"count": 42}),
    ('{"value": 1e10notvalid}', {"value": "1e10notvalid"}),
    # trailing operators / incomplete numbers (exs:208-244)
    ('{"key": 1e}', {"key": 1}),
    ('{"key": 1.}', {"key": 1.0}),
    ('{"key": 1e-}', {"key": 1}),
    ('[- ]', []),
    (' - { "test_key": ["test_value", "test_value2"] }',
     {"test_key": ["test_value", "test_value2"]}),
    # thousands separators (exs:247-272), incl. the :layer5_target case
    ('{"population": 1,234,567}', {"population": 1234567}),
    ('{"key", 105,12,}', {"key": "105,12"}),
    ('{"amount": 1,234.56}', {"amount": 1234.56}),
    # scientific notation (exs:275-306)
    ('{"key": 1e10}', {"key": 1e10}),
    ('{"key": 2.5e+5}', {"key": 2.5e5}),
    ('{"key": 3.14e-2}', {"key": 3.14e-2}),
    ('{"key": 5e}', {"key": 5}),
    # mixed patterns (exs:309-340)
    ('{"fraction": 1/3, "range": 10-20, "decimal": .5, "version": 1.0.0}',
     {"fraction": "1/3", "range": "10-20", "decimal": 0.5, "version": "1.0.0"}),
    ('[1, .5, 1/2, 10-20, 1.1.1, 42]', [1, 0.5, "1/2", "10-20", "1.1.1", 42]),
    ('{"outer": {"inner": 1/3, "value": .75}}',
     {"outer": {"inner": "1/3", "value": 0.75}}),
    # unchanged valid numbers (exs:343-376)
    ('{"pi": 3.14159}', {"pi": 3.14159}),
    ('{"temp": -273.15}', {"temp": -273.15}),
    ('{"value": 0}', {"value": 0}),
    ('{"bignum": 9007199254740991}', {"bignum": 9007199254740991}),
    # unicode / currency (exs:379-396)
    ('{"value": 123€}', {"value": "123€"}),
    ('{"price": $100}', {"price": "$100"}),
]


@pytest.mark.parametrize("inp,want", CASES, ids=[c[0][:40] for c in CASES])
def test_number_edge_case(inp, want):
    r = repair(inp)
    assert r.ok, r.error
    assert json.loads(r.repaired_json) == want


def test_number_performance_many_edge_cases():
    """exs:399-427: 100 pairs of mixed malformed number formats."""
    parts = []
    for i in range(1, 101):
        if i % 4 == 0:
            parts.append(f'"key{i}": {i}/{i + 1}')
        elif i % 4 == 1:
            parts.append(f'"key{i}": .{i}')
        elif i % 4 == 2:
            parts.append(f'"key{i}": {i}-{i + 10}')
        else:
            parts.append(f'"key{i}": {i}.{i}.{i}')
    r = repair("{" + ", ".join(parts) + "}")
    assert r.ok
    d = json.loads(r.repaired_json)
    assert "key1" in d and len(d) == 100
