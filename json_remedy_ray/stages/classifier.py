"""Model-based quality scoring: a fixed linear (logistic) classifier
over the heuristic features — the corpus-scale stand-in for a
fastText-style quality model (training is offline; SCORING every
document is the pipeline operator, same family as the perplexity
scorer).  Weights are fixed constants, so the whole scorer is a
deterministic closed-form function of integer text features and gets a
FULL DuckDB oracle.

Parity contract (the repo's standard float pattern): features are exact
integers; the logit is accumulated in fixed order with the same decimal
literals the SQL uses; the score narrows to float32 so libm exp/ln ulp
differences cancel; the keep decision compares the FLOAT32 score to the
literal 0.5 on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from json_remedy_ray.stages.heuristics import EDGE_PUNCT_CHARS, STOPWORDS
from json_remedy_ray.stages.textstats import UWS_RE2_CLASS, pc_fill_null_empty

# fixed classifier weights (documented constants, shared with the SQL)
W_BIAS = -3.0
W_LOGWC = 0.8
W_ALPHA = 2.0
W_STOPW = 0.3
STOPW_CAP = 8


def quality_classifier_batch(batch: pa.Table, text_col: str = "text",
                             id_col: str = "doc_id") -> pa.Table:
    """(doc_id, text) -> (doc_id, word_count, alpha_space_chars,
    stopword_capped, quality_score: float32, keep: bool).

    logit = -3.0 + 0.8 * ln(1 + word_count)
                 + 2.0 * (alpha_space_chars / max(n_chars, 1))
                 + 0.3 * min(stopword_count, 8)
    score = sigmoid(logit), narrowed to float32; keep = score >= 0.5.
    """
    col = pc_fill_null_empty(batch[text_col])
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.utf8_split_whitespace(col)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    wc = np.bincount(parents[flat_lens > 0], minlength=n).astype(np.int64)
    non_alpha = pc.count_substring_regex(
        col, f"[^\\pL{UWS_RE2_CLASS}]").to_numpy(zero_copy_only=False)
    alpha_space = n_chars - non_alpha
    norm = pc.utf8_lower(pc.utf8_trim(flat, EDGE_PUNCT_CHARS))
    sw_mask = pc.is_in(norm, value_set=pa.array(sorted(STOPWORDS))).to_numpy(
        zero_copy_only=False)
    sw = np.minimum(np.bincount(parents[sw_mask], minlength=n), STOPW_CAP)

    logit = (W_BIAS
             + W_LOGWC * np.log(1 + wc.astype(np.float64))
             + W_ALPHA * (alpha_space / np.maximum(n_chars, 1).astype(np.float64))
             + W_STOPW * sw.astype(np.float64))
    score = (1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
    return pa.table({
        id_col: batch[id_col],
        "word_count": pa.array(wc, type=pa.int64()),
        "alpha_space_chars": pa.array(alpha_space, type=pa.int64()),
        "stopword_capped": pa.array(sw.astype(np.int64), type=pa.int64()),
        "quality_score": pa.array(score, type=pa.float32()),
        "keep": pa.array(score >= np.float32(0.5)),
    })
