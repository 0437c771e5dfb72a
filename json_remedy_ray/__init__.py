"""json_remedy_ray — a Ray-Data-native web-text quality-filter engine.

Re-implements (from scratch, Ray-Data-first) the capabilities of the
Elixir reference `nshkrdotcom/json_remedy` (five-layer malformed-JSON
repair) as the per-document core of a Common-Crawl-style quality-filter
pipeline: repair + langid + perplexity + C4/Gopher heuristics + PII
scrub + dedup, all expressed as `ray.data.Dataset` batch transforms
over zero-copy Arrow batches.

Layers (reference parity map, see SURVEY.md §2):
  Layer 1  content cleaning       json_remedy_ray.repair.layer1
  Layer 2  structural repair      json_remedy_ray.repair.layer2
  Layer 3  syntax normalization   json_remedy_ray.repair.layer3
  Layer 4  fast-path validation   json_remedy_ray.repair.layer4
  Layer 5  tolerant recursive-descent parse  json_remedy_ray.repair.layer5
"""

from json_remedy_ray.config import RepairConfig
from json_remedy_ray.repair.pipeline import (
    repair,
    repair_to_string,
    analyze,
    can_repair,
)

__version__ = "0.2.0"  # round 2

__all__ = [
    "RepairConfig",
    "repair",
    "repair_to_string",
    "analyze",
    "can_repair",
]
