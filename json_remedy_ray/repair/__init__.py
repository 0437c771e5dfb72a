"""Pure-Python repair core (no Ray imports).

Usable standalone for unit tests; wrapped for Ray by
json_remedy_ray.stages.repair_stage.
"""

from json_remedy_ray.repair.pipeline import (
    repair,
    repair_to_string,
    analyze,
    can_repair,
    RepairResult,
)

__all__ = ["repair", "repair_to_string", "analyze", "can_repair", "RepairResult"]
