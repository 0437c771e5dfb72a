"""Production job script — the `ray job submit` entry point (north_rule).

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/run_pipeline.py --input <corpus_dir> --output <out_dir>

In this sandbox it runs against the local session.  The run is resumable:
re-submitting after a failure skips buckets whose manifests match the
current stage versions (see json_remedy_ray/state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webpages parquet dir")
    ap.add_argument("--output", required=True, help="output dir (partitioned parquet + manifests)")
    ap.add_argument("--num-buckets", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data as rd

    from json_remedy_ray.pipelines.quality_filter import FLAGSHIP_COLUMNS, run_to_parquet

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input, columns=FLAGSHIP_COLUMNS)
    summary = run_to_parquet(ds, args.output, num_buckets=args.num_buckets)
    summary["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
