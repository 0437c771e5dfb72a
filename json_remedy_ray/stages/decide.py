"""Keep/drop decision — stateless vectorized map_batches projection.

Pure numpy boolean logic over the feature columns the earlier stages
appended; emits ``keep: bool`` and ``drop_reason: string`` (first
failing rule, in fixed order, so labels are deterministic — the
north_rule grades keep/drop agreement at F1>=0.99, which requires a
total order over rules)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from json_remedy_ray.config import DEFAULT_FILTER_CONFIG, FilterConfig


def decide_batch(batch: pa.Table, config: FilterConfig = DEFAULT_FILTER_CONFIG) -> pa.Table:
    n = len(batch)

    def col(name, default=None):
        if name in batch.column_names:
            return batch[name].to_numpy(zero_copy_only=False)
        return np.full(n, default)

    word_count = col("word_count", 0)
    mean_word_len = col("mean_word_len", 0.0)
    alpha_ratio = col("alpha_ratio", 1.0)
    symbol_ratio = col("symbol_word_ratio", 0.0)
    stopword_hits = col("stopword_hits", 0)
    dup_line_frac = col("dup_line_frac", 0.0)
    ppl = col("ppl", 0.0)
    lang_pred = col("lang_pred", "en")
    lang_conf = col("lang_conf", 1.0)
    toxic = col("toxic", False)
    repair_ok = col("repair_ok", True)

    # ordered rules: (name, failed_mask)
    rules = [
        ("too_few_words", word_count < config.min_words),
        ("too_many_words", word_count > config.max_words),
        ("mean_word_len", (mean_word_len < config.min_mean_word_len) | (mean_word_len > config.max_mean_word_len)),
        ("symbol_ratio", symbol_ratio > config.max_symbol_word_ratio),
        ("nonalpha", (1.0 - alpha_ratio) > config.max_nonalpha_ratio),
        ("no_stopwords", stopword_hits < config.min_stopword_hits),
        ("dup_lines", dup_line_frac > config.max_duplicate_line_frac),
        ("perplexity", ppl > config.max_ppl),
        ("lang", ~np.isin(lang_pred, config.allowed_langs) | (lang_conf < config.min_lang_conf)),
        ("toxic", toxic.astype(bool)),
        ("repair_failed", ~repair_ok.astype(bool)),
    ]

    keep = np.ones(n, dtype=bool)
    reason = np.full(n, "", dtype=object)
    for name, failed in rules:
        failed = np.asarray(failed, dtype=bool)
        newly = failed & keep
        reason[newly] = name
        keep &= ~failed

    batch = batch.append_column("keep", pa.array(keep, type=pa.bool_()))
    batch = batch.append_column("drop_reason", pa.array(list(reason), type=pa.string()))
    return batch
