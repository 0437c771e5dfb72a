"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

  - ``entry()``   — flagship quality-filter pipeline on sf0.001
  - ``queries()`` — one callable per implemented operator (SURVEY §2)
  - ``oracle_sql()`` — DuckDB-equivalent SQL, same column names
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")


def entry() -> Any:
    """Flagship pipeline: synthesize the Common-Crawl-shaped webpages
    corpus (input_hint) from sf0.001 documents, run repair + langid +
    perplexity + heuristics + scrub + keep/drop, return the scored
    Dataset."""
    import ray.data as rd

    from json_remedy_ray.pipelines.quality_filter import FLAGSHIP_COLUMNS, quality_filter
    from json_remedy_ray.sources.corpus import build_webpages

    corpus_dir = build_webpages("/root/testdata/sf0.001", "/tmp/jrr_webpages_sf0.001")
    ds = rd.read_parquet(corpus_dir, columns=FLAGSHIP_COLUMNS)
    return quality_filter(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    from json_remedy_ray.functions.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from json_remedy_ray.functions.queries import ORACLES

    return dict(ORACLES)
