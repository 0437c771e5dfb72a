"""nb_source_classifier: trained NB against an exact scalar reference."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = {
    1: ("sports", "goal match team win"),
    2: ("sports", "team team goal score"),
    3: ("sports", "match win score"),
    4: ("cooking", "salt pepper oven bake"),
    5: ("cooking", "bake oven salt dish"),
    6: ("cooking", "dish pepper salt"),
    7: ("sports", ""),               # empty doc: prior-only argmax
    8: ("cooking", "goal bake"),     # mixed evidence
}


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("nb_sf")
    docs = pa.table({
        "doc_id": pa.array(sorted(TEXTS), type=pa.int64()),
        "source": pa.array([TEXTS[i][0] for i in sorted(TEXTS)]),
        "text": pa.array([TEXTS[i][1] for i in sorted(TEXTS)]),
        "lang": pa.array(["en"] * len(TEXTS)),
        "n_chars": pa.array([len(TEXTS[i][1]) for i in sorted(TEXTS)],
                            type=pa.int64()),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def _scalar_nb() -> pd.DataFrame:
    classes = sorted({c for c, _ in TEXTS.values()})
    d_c = {c: sum(1 for cc, _ in TEXTS.values() if cc == c)
           for c in classes}
    d_all = sum(d_c.values())
    prior = {c: math.floor(1e6 * math.log(d_c[c] / d_all) + 0.5)
             for c in classes}
    counts: dict[tuple[str, str], int] = {}
    n_c = {c: 0 for c in classes}
    vocab = set()
    for c, t in TEXTS.values():
        for tok in t.lower().split():
            counts[(tok, c)] = counts.get((tok, c), 0) + 1
            n_c[c] += 1
            vocab.add(tok)
    V = len(vocab)
    rows = []
    for did in sorted(TEXTS):
        c_true, t = TEXTS[did]
        best = None
        for c in classes:                      # ascending = tie-break
            s = prior[c]
            for tok in t.lower().split():
                s += math.floor(1e6 * math.log(
                    (counts.get((tok, c), 0) + 1.0) / (n_c[c] + V)) + 0.5)
            if best is None or s > best[1]:
                best = (c, s)
        rows.append((did, c_true, best[0], best[1], best[0] == c_true))
    return pd.DataFrame(rows, columns=[
        "doc_id", "source", "predicted", "score_micro", "correct"])


def test_matches_scalar_reference(ray_session, tiny_sf):
    from json_remedy_ray.functions.queries import nb_source_classifier

    got = (nb_source_classifier(tiny_sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _scalar_nb()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_learns_separable_classes(ray_session, tiny_sf):
    from json_remedy_ray.functions.queries import nb_source_classifier

    got = nb_source_classifier(tiny_sf).to_pandas()
    # every doc with class-exclusive evidence classifies correctly —
    # strictly better than the majority-class baseline (4/8)
    strong = got[~got.doc_id.isin([7, 8])]
    assert strong["correct"].all()
    # the empty doc falls back to the (tied-prior, lexicographic) class
    assert got[got.doc_id == 7]["predicted"].item() == "cooking"
