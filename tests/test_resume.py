"""End-to-end resumable-output test: run_to_parquet writes partitioned
parquet + manifests; a re-run with the same configs skips completed
buckets; a config change invalidates them."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from json_remedy_ray.sources.corpus import build_webpages

    out = tmp_path_factory.mktemp("resume_corpus")
    return build_webpages("/root/testdata/sf0.001", str(out / "pages"), num_files=4)


def _read_all(out_dir: str):
    import glob

    files = glob.glob(os.path.join(out_dir, "host_bucket=*", "*.parquet"))
    return pq.read_table(files) if files else None


def test_run_to_parquet_and_resume(corpus, tmp_path):
    import ray.data as rd

    from json_remedy_ray.pipelines.quality_filter import FLAGSHIP_COLUMNS, run_to_parquet
    from json_remedy_ray.config import RepairConfig

    out_dir = str(tmp_path / "out")
    ds = rd.read_parquet(corpus, columns=FLAGSHIP_COLUMNS)
    res1 = run_to_parquet(ds, out_dir, num_buckets=8)
    assert res1["skipped_buckets"] == []
    t = _read_all(out_dir)
    assert t.num_rows == 500
    assert "keep" in t.column_names and "repaired_json" in t.column_names

    manifests = os.listdir(os.path.join(out_dir, "_manifests"))
    assert len(manifests) > 0
    # manifests carry real per-partition lineage
    import json

    with open(os.path.join(out_dir, "_manifests", sorted(manifests)[0])) as f:
        m = json.load(f)
    assert m["rows_out"] > 0
    assert "repairs_syntax" in m["repair_layer_hit_counts"]
    total_rows = sum(
        json.load(open(os.path.join(out_dir, "_manifests", name)))["rows_out"]
        for name in manifests
    )
    assert total_rows == 500

    # re-run with identical config: every existing bucket skipped
    ds2 = rd.read_parquet(corpus, columns=FLAGSHIP_COLUMNS)
    res2 = run_to_parquet(ds2, out_dir, num_buckets=8)
    assert len(res2["skipped_buckets"]) == len(manifests)

    # config change -> stage version changes -> nothing skipped
    ds3 = rd.read_parquet(corpus, columns=FLAGSHIP_COLUMNS)
    res3 = run_to_parquet(ds3, out_dir, num_buckets=8,
                          repair_config=RepairConfig(enable_keyword_filtering=False))
    assert res3["skipped_buckets"] == []
