"""Unit tests for the C4 line filter and Gopher line-stats batches
(stages/c4.py) — pure batch kernels, no Ray session needed."""

import numpy as np
import pyarrow as pa

from json_remedy_ray.stages.c4 import c4_line_filter_batch, line_stats_batch


def _batch(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


GOOD = "one two three four five six."          # terminal ., 6 words


def test_c4_keeps_clean_doc_and_rebuilds_text():
    doc = "\n".join([GOOD, "short line.", GOOD + "  ",
                     "no terminal punctuation here at all",
                     'quoted line with five words here"', GOOD])
    out = c4_line_filter_batch(_batch([doc]))
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    # kept: GOOD, GOOD+trailing-ws, quoted, GOOD  (short + unterminated drop)
    assert row["kept_lines"] == 4
    assert row["total_lines"] == 6
    assert row["clean_text"] == "\n".join(
        [GOOD, GOOD + "  ", 'quoted line with five words here"', GOOD])


def test_c4_line_rules():
    # javascript mention kills the line, case-insensitive
    doc = "\n".join([GOOD, GOOD, "enable JavaScript to view this page.", GOOD])
    row = c4_line_filter_batch(_batch([doc])).to_pylist()[0]
    assert row["kept_lines"] == 3
    # exactly-five words passes, four words fails
    doc2 = "\n".join(["a b c d e.", "a b c d.", GOOD, GOOD])
    row2 = c4_line_filter_batch(_batch([doc2])).to_pylist()[0]
    assert row2["kept_lines"] == 3
    # terminal punctuation may be followed by unicode whitespace
    doc3 = "\n".join([GOOD + " ", GOOD + "  ", GOOD])
    row3 = c4_line_filter_batch(_batch([doc3])).to_pylist()[0]
    assert row3["kept_lines"] == 3
    # ! and ? count as terminal
    doc4 = "\n".join(["is this five whole words?", "yes it is five words!", GOOD])
    row4 = c4_line_filter_batch(_batch([doc4])).to_pylist()[0]
    assert row4["kept_lines"] == 3


def test_c4_doc_drops():
    three_good = "\n".join([GOOD] * 3)
    out = c4_line_filter_batch(_batch([
        three_good,                               # kept
        three_good + " {",                        # brace -> drop
        three_good + "\nLorem Ipsum dolor.",      # lorem (ci) -> drop
        "\n".join([GOOD] * 2),                    # only 2 kept lines -> drop
    ]))
    assert out["doc_id"].to_pylist() == [0]


def test_c4_empty_and_null():
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["", None], type=pa.string())})
    out = c4_line_filter_batch(tbl)
    assert out.num_rows == 0
    st = line_stats_batch(tbl)
    assert st["n_lines"].to_pylist() == [1, 1]
    assert st["line_keep"].to_pylist() == [True, True]


def test_line_stats_counts_and_decision():
    doc = "\n".join([
        "- first bullet item",
        "  • indented unicode bullet",
        "* star bullet",
        "trailing ellipsis here...",
        "unicode ellipsis here… ",
        "a normal line",
    ])
    row = line_stats_batch(_batch([doc])).to_pylist()[0]
    assert row["n_lines"] == 6
    assert row["bullet_lines"] == 3
    assert row["ellipsis_lines"] == 2
    # 2/6 ellipsis > 30%? 20 > 18 -> yes, drop
    assert row["line_keep"] is False


def test_line_stats_boundaries_are_exact():
    # exactly 30% ellipsis lines: 3 of 10 -> 30 > 30 false -> keep
    doc = "\n".join(["x..."] * 3 + ["plain"] * 7)
    row = line_stats_batch(_batch([doc])).to_pylist()[0]
    assert row["ellipsis_lines"] == 3 and row["line_keep"] is True
    # 4 of 10 -> drop
    doc2 = "\n".join(["x..."] * 4 + ["plain"] * 6)
    assert line_stats_batch(_batch([doc2])).to_pylist()[0]["line_keep"] is False
    # exactly 90% bullets: 9 of 10 -> keep; 10 of 10 -> drop
    doc3 = "\n".join(["- b"] * 9 + ["plain"])
    assert line_stats_batch(_batch([doc3])).to_pylist()[0]["line_keep"] is True
    doc4 = "\n".join(["- b"] * 10)
    assert line_stats_batch(_batch([doc4])).to_pylist()[0]["line_keep"] is False


def test_line_stats_hyphen_word_is_not_bullet():
    # '-' must start the line (after optional whitespace) to count
    row = line_stats_batch(_batch(["well-known phrase\nacross two lines"]))
    assert row.to_pylist()[0]["bullet_lines"] == 0


def test_quality_classifier_batch_scoring():
    from json_remedy_ray.stages.classifier import quality_classifier_batch

    texts = [
        "the quick brown fox jumps over the lazy dog and runs home now",
        "@@@@ #### $$$$ %%%%",
        "",
        "caf\xa0e the of and with",       # NBSP counts as space
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    out = quality_classifier_batch(tbl).to_pylist()
    # clean English-ish text keeps; pure symbols drop; empty drops
    assert out[0]["keep"] is True and out[0]["quality_score"] > 0.5
    assert out[1]["keep"] is False
    assert out[2]["keep"] is False and out[2]["word_count"] == 0
    # NBSP is alpha_space, not a symbol
    assert out[3]["alpha_space_chars"] == len(texts[3])
    # scalar recomputation matches exactly (float32)
    import math
    for row, t in zip(out, texts):
        wc, als = row["word_count"], row["alpha_space_chars"]
        nch = max(len(t), 1)
        logit = -3.0 + 0.8 * math.log(1 + wc) + 2.0 * (als / nch) \
            + 0.3 * row["stopword_capped"]
        assert row["quality_score"] == np.float32(1 / (1 + math.exp(-logit)))


def test_c4_large_string_corpus():
    """large_string text columns (big-corpus blocks) take the int64
    offsets + type-matched separator path and match the string path."""
    doc = "\n".join([GOOD] * 3 + ["tiny."])
    small = c4_line_filter_batch(_batch([doc]))
    big = c4_line_filter_batch(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([doc], type=pa.large_string()),
    }))
    assert big["clean_text"].to_pylist() == small["clean_text"].to_pylist()
    assert big["kept_lines"].to_pylist() == small["kept_lines"].to_pylist()
