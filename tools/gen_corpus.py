"""Generate the Common-Crawl-shaped webpages corpus (input_hint schema)
from a driver testdata dir (SURVEY §7.1 step 1).

Usage: python tools/gen_corpus.py [sf_dir] [out_dir] [--replicate N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("out_dir", nargs="?", default="/tmp/jrr_webpages_gen")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--malformed-frac", type=float, default=0.5)
    ap.add_argument("--num-files", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from json_remedy_ray.sources.corpus import build_webpages

    out = build_webpages(args.sf_dir, args.out_dir, malformed_frac=args.malformed_frac,
                         replicate=args.replicate, num_files=args.num_files)
    print(out)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
