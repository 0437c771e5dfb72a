"""Golden keep/drop labels (north_rule F1 gate).

tests/golden/flagship_sf0001.parquet freezes the round-1 flagship output
per url: keep, drop_reason, md5 of repaired_json and scrubbed_text, and
lang_pred.  Every later run (and later round) must reproduce these
byte-identically per url — keep/drop F1 == 1.0 and byte-identical
scrubbed/repaired text, which is the north_rule acceptance bar.

If a deliberate semantic change invalidates the golden file, regenerate
it explicitly (see the generation snippet in git history) and say so in
the commit message — never silently.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

GOLDEN = "tests/golden/flagship_sf0001.parquet"


@pytest.fixture(scope="module")
def flagship_df(ray_session, tmp_path_factory):
    import ray.data as rd

    from json_remedy_ray.pipelines.quality_filter import FLAGSHIP_COLUMNS, quality_filter
    from json_remedy_ray.sources.corpus import build_webpages

    out = tmp_path_factory.mktemp("golden_run")
    corpus = build_webpages("/root/testdata/sf0.001", str(out / "pages"), num_files=4)
    df = quality_filter(rd.read_parquet(corpus, columns=FLAGSHIP_COLUMNS)).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def test_keep_drop_f1_against_golden(flagship_df):
    golden = pd.read_parquet(GOLDEN).sort_values("url").reset_index(drop=True)
    df = flagship_df
    assert list(df["url"]) == list(golden["url"])
    tp = int(((df["keep"]) & (golden["keep"])).sum())
    fp = int(((df["keep"]) & (~golden["keep"])).sum())
    fn = int(((~df["keep"]) & (golden["keep"])).sum())
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    assert f1 >= 0.99, f"keep/drop F1 {f1} vs golden"
    assert (df["drop_reason"] == golden["drop_reason"]).all()


def test_byte_identical_text_per_url(flagship_df):
    golden = pd.read_parquet(GOLDEN).sort_values("url").reset_index(drop=True)
    df = flagship_df
    rep = df["repaired_json"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    scr = df["scrubbed_text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    assert (rep.values == golden["repaired_md5"].values).all()
    assert (scr.values == golden["scrubbed_md5"].values).all()
    assert (df["lang_pred"].values == golden["lang_pred"].values).all()
