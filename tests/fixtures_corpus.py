"""Conformance corpus: (input, expected) pairs ported from the reference
ExUnit suites (behavioral pairs only — no code).

Sources (reference, file:line):
  test/missing_patterns/recent_python_cases_test.exs:19-313
  test/missing_patterns/pattern1_multiple_json_test.exs:19-130
  test/missing_patterns/pattern2_object_merging_test.exs:18-80
  test/missing_patterns/pattern3_ellipsis_test.exs
  test/missing_patterns/pattern4_comment_keywords_test.exs
  test/unit/layer1_content_cleaning_test.exs, layer2_structural_repair_test.exs,
  layer3_syntax_normalization_test.exs
  FIXTURES.md representative rows

`expected` is the canonical serialization json.dumps(value, sort_keys=True,
separators=(",", ":"), ensure_ascii=False); "ERROR" marks reference
{:error, _} outcomes.  Note: FIXTURES.md lists `[]{}` -> `[[],{}]`, but the
reference's own suite (pattern1:19-24) expects `[]`; we follow the
reference implementation (utils/multiple_json_detector.ex:56-68).
"""

CASES: list[tuple[str, str, str]] = [
    # (category, input, expected_canonical)
    # --- valid fast path
    ("valid_fastpath", '{"a": 1, "b": [true, null]}', '{"a":1,"b":[true,null]}'),
    ("valid_fastpath", "[]", "[]"),
    ("valid_fastpath", "{}", "{}"),
    ("valid_fastpath", "123", "123"),
    ("valid_fastpath", '"hello"', '"hello"'),
    ("valid_fastpath", "true", "true"),
    ("valid_fastpath", '{"key": "``"}', '{"key":"``"}'),
    ("valid_fastpath", '{"key": "```json"}', '{"key":"```json"}'),
    ("valid_fastpath", '{"response": "```json{}"}', '{"response":"```json{}"}'),
    # --- plain text (recent_python_cases_test.exs:179-187)
    ("plain_text", "string", '""'),
    ("plain_text", " \n\t ", '""'),
    ("plain_text", "just some prose, no json", '""'),
    # --- array edge cases (recent_python_cases_test.exs:19-93)
    ("structural", "[{]", "[]"),
    ("truncation", '[{"key": "value", "key', '[{"key":"value"},["key"]]'),
    ("structure_coercion", "{'key1', 'key2'}", '["key1","key2"]'),
    ("quotes", '["value1" value2", "value3"]', '["value1","value2","value3"]'),
    ("missing_commas", '["a" "b" "c" 1', '["a","b","c",1]'),
    ("missing_commas", '{"key": ["value" "value1" "value2"]}', '{"key":["value","value1","value2"]}'),
    (
        "missing_commas",
        '{"bad_one":["Lorem Ipsum", "consectetur" comment" ], "good_one":[ "elit", "sed", "tempor"]}',
        '{"bad_one":["Lorem Ipsum","consectetur","comment"],"good_one":["elit","sed","tempor"]}',
    ),
    (
        "missing_commas",
        '{"bad_one": ["Lorem Ipsum","consectetur" comment],"good_one": ["elit","sed","tempor"]}',
        '{"bad_one":["Lorem Ipsum","consectetur","comment"],"good_one":["elit","sed","tempor"]}',
    ),
    # --- object edge cases (recent_python_cases_test.exs:95-143)
    ("embedded_quotes", '{"key": "v"alue"}', '{"key":"v\\"alue\\""}'),
    ("quotes", '{ "words": abcdef", "numbers": 12345", "words2": ghijkl" }',
     '{"numbers":12345,"words":"abcdef","words2":"ghijkl"}'),
    ("quotes", '{"number": 1,"reason": "According...""ans": "YES"}',
     '{"ans":"YES","number":1,"reason":"According..."}'),
    ("code_fence", '{"key": "value, value2"```', '{"key":"value, value2"}'),
    ("code_fence", '{"key": "value}```', '{"key":"value"}'),
    ("structural", '{"array":[{"key": "value"], "key2": "value2"}',
     '{"array":[{"key":"value"}],"key2":"value2"}'),
    # --- string parsing (recent_python_cases_test.exs:145-177)
    ("embedded_quotes", '{"key": "v"alue", "key2": "value2"}',
     '{"key":"v\\"alue","key2":"value2"}'),
    ("embedded_quotes", '[{"key": "v"alu,e", "key2": "value2"}]',
     '[{"key":"v\\"alu,e","key2":"value2"}]'),
    ("escapes", '{"key": "valu\\\'e"}', '{"key":"valu\'e"}'),
    ("escapes", '{\'key\': "{\\"key\\": 1, \\"key2\\": 1}"}',
     '{"key":"{\\"key\\": 1, \\"key2\\": 1}"}'),
    # --- code fence in string (recent_python_cases_test.exs:189-221)
    ("code_fence_in_string",
     '{"key": "```json {"key": [{"key1": 1},{"key2": 2}]}```"}',
     '{"key":{"key":[{"key1":1},{"key2":2}]}}'),
    # --- FIXTURES.md representative rows
    ("literals", "{name: 'Alice', age: 30, active: True}",
     '{"active":true,"age":30,"name":"Alice"}'),
    ("commas_colons", "[1, 2, 3,]", "[1,2,3]"),
    ("code_fence", '```json\n{"valid": true}\n```', '{"valid":true}'),
    ("truncation", '{"incomplete": "data"', '{"incomplete":"data"}'),
    ("object_merge", '{"a":"b"},"c":"d"}', '{"a":"b","c":"d"}'),
    ("ellipsis", "[1, 2, 3, ...]", "[1,2,3]"),
    ("keywords", '{"a":1, COMMENT "b":2}', '{"a":1,"b":2}'),
    ("numbers", '{"amount": 1,234}', '{"amount":1234}'),
    ("trailing_dots", '{"key": "val..............', '{"key":"val"}'),
    # --- pattern 1: multiple JSON values (pattern1_multiple_json_test.exs)
    ("multiple_json", "[]{}", "[]"),
    ("multiple_json", '[]{"key":"value"}', '{"key":"value"}'),
    ("multiple_json", '{"key":"value"}[1,2,3]', '[{"key":"value"},[1,2,3]]'),
    ("multiple_json", '[1,2,3]{"key":"value"}', '[[1,2,3],{"key":"value"}]'),
    ("multiple_json", '{"a":1}{"b":2}{"c":3}', '[{"a":1},{"b":2},{"c":3}]'),
    ("multiple_json", "[1,2][3,4][5,6]", "[[1,2],[3,4],[5,6]]"),
    ("multiple_json", '"string"123true{"key":"value"}', '["string",123,true,{"key":"value"}]'),
    ("multiple_json", '{"a":1}[2,3]"four"5', '[{"a":1},[2,3],"four",5]'),
    ("multiple_json", '  {"a":1}  \n  [2,3]  \n  "text"  ', '[{"a":1},[2,3],"text"]'),
    ("multiple_json", '{"outer":{"inner":"value"}}[1,[2,[3]]]',
     '[{"outer":{"inner":"value"}},[1,[2,[3]]]]'),
    ("multiple_json", '{}{"key":"value"}[]', '[{},{"key":"value"},[]]'),
    ("multiple_json", '{"key":"value"}[1,2,3,True]', '[{"key":"value"},[1,2,3,true]]'),
    ("multiple_json",
     'lorem ```json {"key":"value"} ``` ipsum ```json [1,2,3,True] ``` 42',
     '[{"key":"value"},[1,2,3,true]]'),
    ("multiple_json", '[{"key":"value"}][{"key":"value_after"}]', '[{"key":"value_after"}]'),
    # --- pattern 2: object merging (pattern2_object_merging_test.exs)
    ("object_merge", '{"key": "value"}, "key2": "value2"}', '{"key":"value","key2":"value2"}'),
    ("object_merge", '{"key1": "value1"}, "key2": "value2", "key3": "value3"}',
     '{"key1":"value1","key2":"value2","key3":"value3"}'),
    ("object_merge", '{"key1": "value1"}, "key2": }', '{"key1":"value1","key2":""}'),
    ("object_merge", '{"key": "value"}, []', '{"key":"value"}'),
    ("object_merge", '{"key": "value"}, {}', '{"key":"value"}'),
    ("object_merge", '{"outer": {"inner": "value"}}, "extra": "field"}',
     '{"extra":"field","outer":{"inner":"value"}}'),
    ("object_merge", '{"items": [1, 2, 3]}, "count": 3}', '{"count":3,"items":[1,2,3]}'),
    ("object_merge", '  {"key1": "value1"}  ,  \n  "key2": "value2"  }  ',
     '{"key1":"value1","key2":"value2"}'),
    # --- layer 1: content cleaning
    ("comments", '{"a": 1} // trailing comment', '{"a":1}'),
    ("comments", '// leading comment\n{"a": 1}', '{"a":1}'),
    ("comments", '{"a": /* block */ 1}', '{"a":1}'),
    ("comments", '{"a": /* outer /* inner */ still outer */ 1}', '{"a":1}'),
    ("html_wrapper", '<pre>{"a": 1}</pre>', '{"a":1}'),
    ("html_wrapper", '<code class="json">{"a": 1}</code>', '{"a":1}'),
    ("wrapper_text", '[{"id":1}]\n1 Volume(s) created', '[{"id":1}]'),
    ("prose",
     "The server returned the following configuration data for your request today: "
     '{"status": "ok", "count": 2} which you should parse.',
     '{"count":2,"status":"ok"}'),
    # --- layer 2: structural
    ("missing_delim", '{"a": {"b": 1}', '{"a":{"b":1}}'),
    ("missing_delim", "[1, [2, 3]", "[1,[2,3]]"),
    ("extra_delim", '{"a": 1}}', '{"a":1}'),
    ("extra_delim", "[1, 2]]", "[1,2]"),
    ("mismatched_delim", '{"a": [1, 2}', '{"a":[1,2]}'),
    ("mismatched_delim", '[{"a": 1]', '[{"a":1}]'),
    # --- layer 3: syntax
    ("quotes", "{'single': 'quotes'}", '{"single":"quotes"}'),
    ("unquoted_keys", "{key: value}", '{"key":"value"}'),
    ("unquoted_keys", '{key: "value"}', '{"key":"value"}'),
    ("literals", '{"a": True, "b": False, "c": None}', '{"a":true,"b":false,"c":null}'),
    ("literals", '{"a": TRUE, "b": FALSE, "c": NULL}', '{"a":true,"b":false,"c":null}'),
    ("commas_colons", '{"a": 1,}', '{"a":1}'),
    ("commas_colons", '{"key" "value"}', '{"key":"value"}'),
    ("multiword", '{name: Weiss Savage, age: 30}', '{"age":30,"name":"Weiss Savage"}'),
    ("smart_quotes", '{“key”: “value”}', '{"key":"value"}'),
    ("numbers", '{"a": .25}', '{"a":0.25}'),
    ("numbers", '{"a": -.5}', '{"a":-0.5}'),
    ("numbers", '{"a": 1_000}', '{"a":1000}'),
    ("numbers", '{"a": 1.}', '{"a":1.0}'),
    ("numbers", '{"a": 10-20}', '{"a":"10-20"}'),
    ("numbers", '{"a": 1.1.1}', '{"a":"1.1.1"}'),
    ("numbers", '{"a": 1/3}', '{"a":"1/3"}'),
    ("numbers", '{"a": $100}', '{"a":"$100"}'),
    ("numbers", '{"a": 123abc}', '{"a":"123abc"}'),
    ("missing_values", '{"key": , "key2": "value2"}', '{"key":"","key2":"value2"}'),
    ("unquoted_values", "{key:value}", '{"key":"value"}'),
]

STRICT_ERROR_CASES = [
    # strict mode rejections (recent_python_cases_test.exs:265-313)
    '{"key":"value"}["value"]',
    '[{"key": "first", "key": "second"}]',
    '{"" : "value"}',
    '{"missing" "colon"}',
    '{"key": , "key2": "value2"}',
    '{"dangling"}',
    '{"key": """"}',
    '{"key": "" "value"}',
]
