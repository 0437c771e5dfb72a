"""Regression tests for the round-1 ADVICE findings.

1. _LITERALISH_PATTERN must cover sign-then-dot numbers ('-.5') so the
   vectorized plain-text shortcut never contradicts scalar repair().
2. run_to_parquet stage_versions must include the partitioning scheme:
   resuming with a different num_buckets must NOT treat old-scheme
   manifests as complete, and stale manifests must be cleaned up.
3. PerplexityScorer batch path must return inf (not the float32 cap) for
   docs shorter than 2 bytes, matching scalar ppl_one.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_literalish_prefilter_sign_dot_numbers():
    """'-.5' / '+.5' must be routed to scalar repair, not the '""' shortcut."""
    from json_remedy_ray.repair.pipeline import repair
    from json_remedy_ray.stages.repair_stage import repair_arrow_batch

    texts = ["-.5", "+.5", ".5", "- .5", "+", "-", ".", "plain prose"]
    batch = pa.table({"text": texts})
    out = repair_arrow_batch(batch)
    got = dict(zip(out["text"].to_pylist(), out["repaired_json"].to_pylist()))
    for t in texts:
        r = repair(t)
        assert got[t] == (r.repaired_json if r.ok else ""), t
    # and the specific reported divergence:
    assert got["-.5"] == "-0.5"
    assert got["+.5"] == "0.5"


def test_perplexity_batch_scalar_parity_short_docs(ray_session):
    from json_remedy_ray.stages.perplexity import PerplexityScorer

    s = PerplexityScorer()
    texts = ["", "a", "ab", "hello world", "x"]
    batch = pa.table({"text": texts})
    out = s(batch)
    ppl = out["ppl"].to_pylist()
    for t, p in zip(texts, ppl):
        want = s.ppl_one(t)
        if np.isinf(want):
            assert np.isinf(p), (t, p)
        else:
            assert p == pytest.approx(want, rel=1e-5), t

    # whole-batch-shorter-than-2-bytes path
    tiny = s(pa.table({"text": ["", ""]}))
    assert all(np.isinf(v) for v in tiny["ppl"].to_pylist())


@pytest.fixture(scope="module")
def small_corpus(ray_session, tmp_path_factory):
    from json_remedy_ray.sources.corpus import build_webpages

    out = tmp_path_factory.mktemp("advice_corpus")
    return build_webpages("/root/testdata/sf0.001", str(out / "pages"), num_files=2)


def test_resume_num_buckets_change_recomputes(small_corpus, tmp_path):
    """Changing num_buckets must invalidate old manifests (no skipped rows)
    and remove manifests from the old partitioning scheme."""
    import ray.data as rd

    from json_remedy_ray.pipelines.quality_filter import FLAGSHIP_COLUMNS, run_to_parquet

    out_dir = str(tmp_path / "out")

    def total_rows():
        files = glob.glob(os.path.join(out_dir, "host_bucket=*", "*.parquet"))
        return sum(pq.read_metadata(p).num_rows for p in files)

    ds = rd.read_parquet(small_corpus, columns=FLAGSHIP_COLUMNS)
    run_to_parquet(ds, out_dir, num_buckets=8)
    rows_8 = total_rows()
    assert rows_8 == 500

    # re-run with a DIFFERENT bucket count: nothing may be skipped, output
    # must still be complete (500 rows, no duplicates), and no manifest
    # from the 8-bucket scheme may survive
    ds = rd.read_parquet(small_corpus, columns=FLAGSHIP_COLUMNS)
    res = run_to_parquet(ds, out_dir, num_buckets=4)
    assert res["skipped_buckets"] == []
    assert total_rows() == 500
    for mpath in glob.glob(os.path.join(out_dir, "_manifests", "bucket=*.json")):
        import json

        with open(mpath) as f:
            m = json.load(f)
        assert m["stage_versions"]["partitioning"].split("/")[1] == "4"

    # third run, same config as second: everything skips
    ds = rd.read_parquet(small_corpus, columns=FLAGSHIP_COLUMNS)
    res3 = run_to_parquet(ds, out_dir, num_buckets=4)
    assert len(res3["skipped_buckets"]) > 0
    assert total_rows() == 500


def test_option_validation_reference_style():
    """Per-layer option validation (reference layer_behaviour.ex:36-60
    validate_options/1): wrong-typed values are rejected with
    reference-style errors; unknown keys raise TypeError."""
    from json_remedy_ray.config import FilterConfig, RepairConfig

    with pytest.raises(ValueError, match="must be a boolean"):
        RepairConfig(fast_path="yes")
    with pytest.raises(ValueError, match="must be a positive integer"):
        RepairConfig(max_parse_depth=0)
    with pytest.raises(ValueError, match="must be a positive integer"):
        RepairConfig(max_doc_bytes=-1)
    with pytest.raises(TypeError):
        RepairConfig(not_an_option=True)
    with pytest.raises(ValueError, match="non-negative number"):
        FilterConfig(max_ppl=-1.0)
    with pytest.raises(ValueError, match="min_words must be <="):
        FilterConfig(min_words=100, max_words=10)
    with pytest.raises(ValueError, match="allowed_langs"):
        FilterConfig(allowed_langs="en")
    # valid configs still construct and hash deterministically
    assert RepairConfig().config_hash() == RepairConfig().config_hash()
    assert FilterConfig(min_words=5).config_hash() != FilterConfig().config_hash()


def test_asof_join_no_match_and_null_ts(ray_session, tmp_path):
    """Fourth review round: the no-orders group path must LEFT-join with
    NaN (it crashed with IndexError before — dead path in testdata), and
    a NULL event ts must match DuckDB ASOF's observed sorts-NULL-last
    semantics (matches the latest order)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import events_asof_join_orders

    d = str(tmp_path / "asof")
    import os

    os.makedirs(d)
    ev = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01T00:00:00", "us"),
                        np.datetime64("NaT", "us")]),
        "user_id": pa.array([999, 0], type=pa.int64()),
        "event_type": ["a", "a"], "value": [1.0, 2.0], "props": ["{}", "{}"],
    })
    pq.write_table(ev, f"{d}/events.parquet")
    shutil.copy("/root/testdata/sf0.001/orders.parquet", f"{d}/orders.parquet")
    out = events_asof_join_orders(d).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert np.isnan(out.loc[0, "matched_orderkey"])       # no orders for 999
    assert not np.isnan(out.loc[1, "matched_orderkey"])   # NaT -> latest order
