"""The flagship quality-filter pipeline (north_star composition).

read_parquet(webpages, columns pruned — `html` is NEVER projected)
  -> repair        (stateless map_batches, zero-copy Arrow)
  -> heuristics    (stateless, vectorized)
  -> langid        (actor pool — model built once per actor)
  -> perplexity    (actor pool — model built once per actor)
  -> scrub         (stateless, regex pre-filtered)
  -> decide        (stateless numpy projection)
  [-> host bucketing -> partitioned parquet + per-partition manifests]

The pipeline is lazy end-to-end: nothing materializes until the caller
writes or aggregates, so Ray's streaming executor pipelines all stages
with backpressure (SURVEY §4.2).
"""

from __future__ import annotations

import ray.data as rd

from json_remedy_ray.config import (
    DEFAULT_CONFIG,
    DEFAULT_FILTER_CONFIG,
    FilterConfig,
    RepairConfig,
)
from json_remedy_ray.stages.decide import decide_batch
from json_remedy_ray.stages.heuristics import heuristics_batch
from json_remedy_ray.stages.langid import LangIdScorer
from json_remedy_ray.stages.perplexity import PerplexityScorer
from json_remedy_ray.stages.repair_stage import make_repair_fn
from json_remedy_ray.stages.scrub import scrub_batch

# Input pruning: the repair stage must never materialize the `html` binary
# column (SURVEY §4.2 memory row).
FLAGSHIP_COLUMNS = ["url", "warc_ts", "text", "lang"]


def quality_filter(
    ds: rd.Dataset,
    repair_config: RepairConfig = DEFAULT_CONFIG,
    filter_config: FilterConfig = DEFAULT_FILTER_CONFIG,
    text_col: str = "text",
    repair_batch_size: int = 1024,
    scorer_batch_size: int = 4096,
    scorer_concurrency=(1, 8),
) -> rd.Dataset:
    """Apply the full filter chain to a Dataset with a ``text`` column."""
    ds = ds.map_batches(
        make_repair_fn(repair_config, text_col=text_col),
        batch_format="pyarrow",
        batch_size=repair_batch_size,
    )
    ds = ds.map_batches(
        lambda b: heuristics_batch(b, text_col=text_col),
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
    )
    ds = ds.map_batches(
        LangIdScorer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
        concurrency=scorer_concurrency,
    )
    ds = ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
        concurrency=scorer_concurrency,
    )
    ds = ds.map_batches(
        lambda b: scrub_batch(b, text_col=text_col),
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
    )
    ds = ds.map_batches(
        lambda b: decide_batch(b, filter_config),
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
    )
    return ds


def run_to_parquet(
    ds: rd.Dataset,
    out_dir: str,
    repair_config: RepairConfig = DEFAULT_CONFIG,
    filter_config: FilterConfig = DEFAULT_FILTER_CONFIG,
    num_buckets: int = 64,
    url_col: str = "url",
) -> dict:
    """Full run with host bucketing + resumable partitioned output.

    Returns summary stats.  On re-run with identical configs, buckets
    with matching manifests are skipped (resume-by-manifest)."""
    import pyarrow.compute as pc

    from json_remedy_ray.state.manifest import completed_buckets, make_manifest, write_manifest
    from json_remedy_ray.state.partitioning import add_host_bucket

    stage_versions = {
        "repair": repair_config.config_hash(),
        "filter": filter_config.config_hash(),
    }
    done = completed_buckets(out_dir, stage_versions)
    scored = quality_filter(ds, repair_config, filter_config)
    scored = scored.map_batches(
        lambda b: add_host_bucket(b, num_buckets=num_buckets, url_col=url_col),
        batch_format="pyarrow",
    )
    if done:
        keep_mask_fn = lambda b: b.filter(  # noqa: E731
            ~pc.is_in(b["host_bucket"], value_set=__import__("pyarrow").array(sorted(done)))
        )
        scored = scored.map_batches(keep_mask_fn, batch_format="pyarrow")
    scored.write_parquet(out_dir, partition_cols=["host_bucket"])

    # one manifest per bucket, written after the data lands
    import os

    rows_out = 0
    for bucket_dir in sorted(os.listdir(out_dir)):
        if not bucket_dir.startswith("host_bucket="):
            continue
        bucket = int(bucket_dir.split("=")[1])
        if bucket in done:
            continue
        files = os.listdir(os.path.join(out_dir, bucket_dir))
        write_manifest(out_dir, bucket, make_manifest(
            bucket, input_fragments=[], stage_versions=stage_versions,
            rows_in=-1, rows_out=-1, layer_hits={}, output_files=files,
        ))
    return {"out_dir": out_dir, "skipped_buckets": sorted(done), "stage_versions": stage_versions}
