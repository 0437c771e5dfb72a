"""Epoch-plan edge semantics: a source whose documents carry zero
tokens (empty/whitespace text) gets ZERO epochs and zero copies on both
engine and oracle — never a divide-by-zero — and the materialized
multiset matches the plan's row arithmetic exactly."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def plan_dir(tmp_path):
    """Tiny documents table: two real sources plus one whose docs are
    all empty/whitespace (sum_tokens == 0)."""
    rows = []
    for i in range(12):
        rows.append({"doc_id": i, "source": "web",
                     "text": f"alpha beta gamma delta doc {i}"})
    for i in range(12, 18):
        rows.append({"doc_id": i, "source": "news",
                     "text": f"epsilon zeta eta {i}"})
    for i in range(18, 22):
        rows.append({"doc_id": i, "source": "empty_src",
                     "text": "   " if i % 2 else ""})
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_zero_token_source_gets_zero_epochs(ray_session, plan_dir):
    from json_remedy_ray.functions.queries import source_epoch_plan

    plan = source_epoch_plan(plan_dir)
    row = plan[plan["source"] == "empty_src"].iloc[0]
    assert row["sum_tokens"] == 0
    assert row["epochs_micro"] == 0
    assert row["full_epochs"] == 0
    assert row["n_partial_docs"] == 0
    # the real sources still get a positive budget share
    assert (plan.loc[plan["source"] != "empty_src",
                     "epochs_micro"] > 0).all()


def test_epoch_expand_matches_oracle_with_empty_source(ray_session,
                                                       plan_dir):
    from json_remedy_ray.functions.queries import (
        ORACLES,
        epoch_expand_documents,
        source_epoch_plan,
    )

    got = epoch_expand_documents(plan_dir).to_pandas()
    # multiset size == plan arithmetic
    plan = source_epoch_plan(plan_dir)
    expect_total = int((plan["full_epochs"] * plan["n_docs"]
                        + plan["n_partial_docs"]).sum())
    assert len(got) == expect_total
    assert (got["source"] != "empty_src").all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{plan_dir}/documents.parquet')")
    want = con.execute(ORACLES["epoch_expand_documents"]).df()
    cols = ["doc_id", "source", "epoch"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g, w.astype({c: g[c].dtype for c in cols}))

    # force the histogram-refinement rounds (tiny pull cap, coarse
    # buckets -> several narrowing passes over the 32-bit hash domain)
    # and require the byte-identical multiset
    forced = (epoch_expand_documents(plan_dir, pull_cap=4, nb=256)
              .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(g, forced)
