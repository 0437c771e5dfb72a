"""Property-based robustness: repair() never crashes, and when it reports
ok the canonical output is valid JSON.  (The reference has no fuzzing —
SURVEY §5 — this is an engine-hardening addition.)"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from json_remedy_ray import repair

_JSONISH_ALPHABET = st.sampled_from(list("{}[]\"':,.0123456789abcTFN \n\\t-+_`/“”‘’é🚀"))


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_JSONISH_ALPHABET, max_size=60))
def test_repair_never_crashes_jsonish(s):
    res = repair(s)
    if res.ok:
        json.loads(res.repaired_json)  # canonical output must be valid JSON
    else:
        assert res.error


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_repair_never_crashes_any_unicode(s):
    res = repair(s)
    if res.ok:
        json.loads(res.repaired_json)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_JSONISH_ALPHABET, max_size=60))
def test_repair_idempotent(s):
    """Repairing already-repaired output is a no-op — required for safe
    Ray task retries (SURVEY §4.2 determinism/idempotence row)."""
    first = repair(s)
    if first.ok:
        second = repair(first.repaired_json)
        assert second.ok and second.repaired_json == first.repaired_json


@settings(max_examples=100, deadline=None)
@given(st.recursive(
    st.none() | st.booleans() | st.integers(-10**6, 10**6) | st.text(max_size=8),
    lambda inner: st.lists(inner, max_size=4) | st.dictionaries(st.text(max_size=6), inner, max_size=4),
    max_leaves=12,
))
def test_valid_json_roundtrips_unchanged(value):
    """Fast path: any valid JSON document is returned semantically
    unchanged with zero repairs."""
    s = json.dumps(value)
    res = repair(s)
    assert res.ok and res.repairs == []
    assert json.loads(res.repaired_json) == value
