"""HTML -> text extraction stage (stages/extract.py)."""

import duckdb
import pyarrow as pa

from json_remedy_ray.stages.extract import (
    HTML_ENTITY_PASSES, extract_text, extract_text_sql)


def _one(html):
    return extract_text(pa.array([html], type=pa.string()))[0].as_py()


def test_basic_page():
    out = _one("<html><head><title>T</title></head>"
               "<body><p>hello world</p><p>second para</p></body></html>")
    assert out == "T\nhello world\nsecond para"


def test_script_style_comments_removed():
    out = _one("<body><script>var x = '<p>not text</p>';</script>"
               "<style>p{color:red}</style><!-- hidden\nmultiline -->"
               "<p>kept</p></body>")
    assert out == "kept"


def test_script_case_insensitive_and_attrs():
    out = _one('<SCRIPT type="text/javascript">junk()</SCRIPT><p>ok</p>')
    assert out == "ok"


def test_entities_decoded_amp_last():
    out = _one("<p>Fish &amp; Chips &lt;tag&gt; &quot;q&quot; &#39;a&#39;"
               " &copy; &amp;lt;</p>")
    # double-encoded &amp;lt; must become &lt; (amp decoded LAST), not <
    assert out == "Fish & Chips <tag> \"q\" 'a' © &lt;"


def test_block_tags_become_newlines_inline_do_not():
    out = _one("<div>a</div><span>b</span> <em>c</em><br><h2>d</h2>")
    assert out == "a\nb c\nd"


def test_whitespace_collapsed():
    out = _one("<p>  a \t b  </p>\n\n\n<p>   c</p>   ")
    assert out == "a b\nc"


def test_null_and_empty():
    arr = pa.array([None, "", "<p>x</p>"], type=pa.string())
    assert extract_text(arr).to_pylist() == ["", "", "x"]


def test_binary_input_zero_copy_path():
    arr = pa.array(["<p>bin &amp; ok</p>".encode()], type=pa.binary())
    assert extract_text(arr)[0].as_py() == "bin & ok"
    big = pa.array(["<p>big</p>".encode()], type=pa.large_binary())
    assert extract_text(big)[0].as_py() == "big"


def test_chunked_input():
    ca = pa.chunked_array([pa.array(["<p>a</p>"]), pa.array(["<p>b</p>"])])
    assert extract_text(ca).to_pylist() == ["a", "b"]


def test_sql_expression_matches_arrow_chain():
    """The generated DuckDB expression is byte-identical to the Arrow
    chain on an adversarial sample (entities, nested boilerplate,
    multiline comments, quotes in attributes, unicode)."""
    samples = [
        None, "", "plain no tags",
        "<html><head><title>Doc 1</title><style>a{b}</style>"
        "<script>if(1<2){x='</p>'}</script></head><body>"
        "<nav><a href='/'>Home</a> | <a href='/x'>X</a></nav>"
        "<!-- c1 --><h1>H</h1><p>p1 &amp; p2</p>"
        "<footer>&copy; 2026 A &amp; B</footer></body></html>",
        "text with & raw amp < raw lt",
        "<ul><li>one</li><li>two</li></ul>",
        "<p>«naïve» — café &#39;ok&#39;</p>",
        "<br/><BR CLEAR=all>tail",
        "a  \t  b\n\n\nc",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join("(?)" for _ in samples) + ") v(h)",
                samples)
    got_sql = [r[0] for r in con.execute(
        f"SELECT {extract_text_sql('h')} FROM t").fetchall()]
    got_arrow = extract_text(
        pa.array(samples, type=pa.string())).to_pylist()
    assert got_sql == got_arrow


def test_entity_order_amp_is_last():
    assert HTML_ENTITY_PASSES[-1][0] == "&amp;"
