"""Full port of the reference Layer-4 UTF-8 / encoding suite.

Reference: test/layer4/utf8_encoding_test.exs (22 tests).  `{:ok,...}`
maps to try_fast_path == (True, value); `{:continue,...}` maps to
(False, None) — and where the reference only asserts pass-through, this
port ALSO asserts the full repair() pipeline fixes the row (exceeding
the reference's layer-4-only scope).  One documented divergence:
Python's json.loads accepts escaped lone surrogates where Jason
rejects; repair() sanitizes them so output stays valid UTF-8.
"""

from __future__ import annotations

import json
import unicodedata

import pytest

from json_remedy_ray import repair
from json_remedy_ray.repair.layer4 import try_fast_path


# --------------------------------------- valid UTF-8 (exs:7-105)

def test_latin_accents():
    ok, r = try_fast_path(
        '{"name": "José García", "city": "São Paulo", "country": "México",'
        ' "description": "Café, piñata, niño"}')
    assert ok and r["name"] == "José García" and r["city"] == "São Paulo"
    assert r["country"] == "México" and r["description"] == "Café, piñata, niño"


def test_european_characters():
    ok, r = try_fast_path(
        '{"german": "Mädchen, Größe, weiß", "french": "éléphant, français, naïve",'
        ' "nordic": "København, Malmö, Århus", "slavic": "Москва, Киев, Прага"}')
    assert ok and r["german"] == "Mädchen, Größe, weiß"
    assert r["nordic"] == "København, Malmö, Århus" and r["slavic"] == "Москва, Киев, Прага"


def test_asian_characters():
    ok, r = try_fast_path(
        '{"chinese": "你好世界", "japanese": "こんにちは世界", "korean": "안녕하세요 세계",'
        ' "thai": "สวัสดีโลก", "arabic": "مرحبا بالعالم"}')
    assert ok and r["chinese"] == "你好世界" and r["japanese"] == "こんにちは世界"
    assert r["korean"] == "안녕하세요 세계" and r["thai"] == "สวัสดีโลก"


def test_mixed_scripts():
    ok, r = try_fast_path(
        '{"multilingual": "Hello 世界 🌍 مرحبا Здравствуй",'
        ' "mixed_name": "André 李 José Иван", "technical": "UTF-8: ñ α β γ δ ε"}')
    assert ok and r["multilingual"] == "Hello 世界 🌍 مرحبا Здравствуй"
    assert r["mixed_name"] == "André 李 José Иван"


def test_right_to_left():
    ok, r = try_fast_path(
        '{"arabic": "هذا نص عربي", "hebrew": "זה טקסט עברי",'
        ' "mixed_direction": "English النص العربي English again"}')
    assert ok and r["arabic"] == "هذا نص عربي" and r["hebrew"] == "זה טקסט עברי"


# ------------------------------------------- emoji (exs:107-204)

def test_basic_emoji():
    ok, r = try_fast_path(
        '{"faces": "😀😃😄😁😆😅😂🤣", "hearts": "❤️💙💚💛💜🖤🤍🤎",'
        ' "symbols": "✅❌⭐🔥💯⚡🚀💎"}')
    assert ok and r["faces"] == "😀😃😄😁😆😅😂🤣" and r["symbols"] == "✅❌⭐🔥💯⚡🚀💎"


def test_complex_emoji_sequences():
    ok, r = try_fast_path(
        '{"families": "👨‍👩‍👧‍👦", "flags": "🇺🇸🇬🇧🇫🇷",'
        ' "skin_tones": "👋🏻👋🏼👋🏽👋🏾👋🏿", "professions": "👩‍⚕️👨‍💻"}')
    assert ok and r["families"] == "👨‍👩‍👧‍👦"
    assert r["skin_tones"] == "👋🏻👋🏼👋🏽👋🏾👋🏿"


def test_emoji_in_object_keys():
    ok, r = try_fast_path('{"🚀": "rocket", "💯": "hundred", "🔥": "fire", "😀🎉": "celebration"}')
    assert ok and r["🚀"] == "rocket" and r["😀🎉"] == "celebration"


def test_mixed_emoji_and_text():
    ok, r = try_fast_path(
        '{"message": "Hello 👋 world 🌍!", "status": "Working hard 💪 or hardly working? 😄",'
        ' "celebration": "Party time! 🎉🎊🥳"}')
    assert ok and r["message"] == "Hello 👋 world 🌍!"


def test_emoji_arrays():
    ok, r = try_fast_path('["🍎", "🍌", "🍇", "🍓", "🥝", "🚗", "🚕", "🚙", "🚌", "🏍️",'
                          ' "⚽", "🏀", "🏈", "⚾", "🎾"]')
    assert ok and len(r) == 15 and "🍎" in r and "🏍️" in r and "⚾" in r


# ---------------------- malformed JSON with UTF-8 content (exs:206-274)

def test_continue_unquoted_keys_with_utf8_then_repair():
    inp = '{name: "José", city: "São Paulo"}'
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)  # and the full pipeline must fix it, UTF-8 intact
    assert res.ok and json.loads(res.repaired_json) == {"name": "José", "city": "São Paulo"}


def test_continue_malformed_with_emoji_then_repair():
    inp = '{status: "Working 💪", mood: "Happy 😄"}'
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)
    assert res.ok and json.loads(res.repaired_json) == {"status": "Working 💪", "mood": "Happy 😄"}


@pytest.mark.parametrize("inp", [
    '{"name": "José',
    '{"emoji": "🚀',
    '{name: "こんにち',
    '["testing", "café',
])
def test_truncated_multibyte_rows_continue_and_repair(inp):
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)
    assert res.ok  # tolerant close preserves the multi-byte content
    res.repaired_json.encode("utf-8")


@pytest.mark.parametrize("inp,want", [
    ('{user_name: "André", active: True}', {"user_name": "André", "active": True}),
    ('{\'français\': "café", \'active\': False}', {"français": "café", "active": False}),
    ('{"🚀": rocket, "💯": score}', {"🚀": "rocket", "💯": "score"}),
    ('[True, "世界", False, "emoji: 🎉",]', [True, "世界", False, "emoji: 🎉"]),
])
def test_mixed_encoding_and_syntax_issues(inp, want):
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)
    assert res.ok and json.loads(res.repaired_json) == want


# ------------------------------ byte-exact pass-through (exs:276-325)

def test_preserves_exact_utf8_on_continue():
    inp = '{name: "José García", city: "São Paulo"}'
    assert try_fast_path(inp) == (False, None)  # no partial/transcoded value
    # the repair pipeline must carry the multi-byte content through intact
    res = repair(inp)
    assert res.ok and "José García" in res.repaired_json and "São Paulo" in res.repaired_json


def test_preserves_emoji_bytes():
    inp = '{mood: "😄", activity: "🚀"}'
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)
    assert "😄" in res.repaired_json and "🚀" in res.repaired_json


def test_complex_multibyte_valid_json():
    inp = '{"families": "👨‍👩‍👧‍👦", "flags": "🇺🇸🇬🇧"}'
    ok, parsed = try_fast_path(inp)
    assert ok and parsed["families"] == "👨‍👩‍👧‍👦"
    assert parsed["flags"] == "🇺🇸🇬🇧"


# ------------------------------------- UTF-8 edge cases (exs:327-420)

def test_zero_width_characters():
    ok, r = try_fast_path(
        '{"invisible": "a​b‌c‍d", "joiners": "👨‍💻👩‍🔬",'
        ' "marks": "éàî"}')
    assert ok and "a" in r["invisible"] and "b" in r["invisible"]
    assert "👨" in r["joiners"] and "👩" in r["joiners"]


def test_normalization_edge_cases():
    ok1, r1 = try_fast_path('{"name": "José"}')            # composed
    ok2, r2 = try_fast_path('{"name": "Jose\\u0301"}')     # decomposed escape
    assert ok1 and ok2
    assert r1["name"] == "José" and r2["name"] == "José"
    assert unicodedata.normalize("NFC", r1["name"]) == unicodedata.normalize("NFC", r2["name"])


def test_bom_and_unicode_whitespace():
    inp = '{\u00A0"name":\u2000"Alice"\u2001}'
    assert try_fast_path(inp) == (False, None)  # invalid strict JSON
    res = repair(inp)  # tolerant parser skips unicode whitespace
    assert res.ok and json.loads(res.repaired_json) == {"name": "Alice"}


def test_large_utf8_strings():
    large = "🚀💯世界" * 1000
    ok, r = try_fast_path(json.dumps({"large_utf8": large}, ensure_ascii=False))
    assert ok and r["large_utf8"] == large and len(r["large_utf8"]) == 4000


def test_malformed_surrogates_and_syntax():
    # divergence note: json.loads ACCEPTS '😀' (valid pair) and
    # even a lone '\uD83D' where Jason rejects; the repair pipeline
    # guarantees UTF-8-clean output either way
    ok, v = try_fast_path('{"text": "\\uD83D\\uDE00"}')
    assert ok and v["text"] == "😀"
    res = repair('{"text": "\\uD83D"}')  # lone high surrogate
    assert res.ok
    res.repaired_json.encode("utf-8")    # sanitized, never invalid UTF-8
    inp = '{emoji: "😀", valid: True}'
    assert try_fast_path(inp) == (False, None)
    res = repair(inp)
    assert res.ok and json.loads(res.repaired_json) == {"emoji": "😀", "valid": True}
