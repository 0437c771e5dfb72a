"""tfidf_topk_terms: scoring rule + determinism on a tiny planted corpus."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("tfidf_sf")
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "apple banana apple cherry",
            "banana cherry cherry date",
            "apple apple apple",
            "",                      # empty doc: contributes no rows
        ]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([25, 25, 17, 0], type=pa.int64()),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def _scalar_reference(texts: dict[int, str], k: int = 5) -> pd.DataFrame:
    n = len(texts)
    df: dict[str, set] = {}
    for did, t in texts.items():
        for tok in set(t.lower().split()):
            df.setdefault(tok, set()).add(did)
    rows = []
    for did, t in texts.items():
        toks = t.lower().split()
        for tok in sorted(set(toks)):
            idf = math.floor(1e6 * math.log((n + 1) / (len(df[tok]) + 1)))
            rows.append((did, tok, toks.count(tok),
                         toks.count(tok) * idf))
    out = pd.DataFrame(rows, columns=["doc_id", "token", "tf",
                                      "score_micro"])
    out = out.sort_values(["doc_id", "score_micro", "token"],
                          ascending=[True, False, True], kind="mergesort")
    out["rank"] = out.groupby("doc_id").cumcount() + 1
    return (out[out["rank"] <= k]
            [["doc_id", "rank", "token", "tf", "score_micro"]]
            .reset_index(drop=True))


def test_matches_scalar_reference(ray_session, tiny_sf):
    from json_remedy_ray.functions.queries import tfidf_topk_terms

    got = (tfidf_topk_terms(tiny_sf).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    want = _scalar_reference({
        1: "apple banana apple cherry",
        2: "banana cherry cherry date",
        3: "apple apple apple",
        4: "",
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # doc 2: cherry (tf=2, idf ln(5/3)) outranks date (tf=1, idf
    # ln(5/2)) — 1021650 > 916290; empty doc contributes no rows
    d2 = got[got["doc_id"] == 2]
    assert d2.iloc[0]["token"] == "cherry"
    assert d2.iloc[1]["token"] == "date"
    assert 4 not in got["doc_id"].to_numpy()


def test_integer_scores_exact(ray_session, tiny_sf):
    from json_remedy_ray.functions.queries import tfidf_topk_terms

    got = tfidf_topk_terms(tiny_sf).to_pandas()
    # doc 3: 'apple' tf=3, df=2, n=4 -> idf = floor(1e6*ln(5/3))
    row = got[(got["doc_id"] == 3) & (got["token"] == "apple")].iloc[0]
    assert row["score_micro"] == 3 * math.floor(1e6 * math.log(5 / 3))
    assert got["score_micro"].to_numpy().dtype == np.int64
