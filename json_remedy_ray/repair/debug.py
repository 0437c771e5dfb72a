"""Introspection / debug operators (SURVEY §2.8 parity).

  reference `analyze/1`          -> pipeline.analyze (repairs only)
  reference `repair_with_debug/2`-> repair_with_debug here: per-phase
                                    wall time (us), input/output sizes,
                                    repair counts per phase.
"""

from __future__ import annotations

import time

from json_remedy_ray.config import DEFAULT_CONFIG, RepairConfig
from json_remedy_ray.repair import detectors, layer1, layer4, preprocessing
from json_remedy_ray.repair.layer5 import SKIP, parse_document


def repair_with_debug(text: str, config: RepairConfig = DEFAULT_CONFIG) -> dict:
    """Run the pipeline phase by phase, timing each (reference
    lib/json_remedy.ex:297-343,464-636).  Returns {ok, value, steps:[...]}.
    Phases mirror pipeline.repair(); this is a diagnostics path, not the
    hot path."""
    steps: list[dict] = []
    repairs: list = []

    def step(name: str, fn, s):
        t0 = time.perf_counter_ns()
        out = fn(s)
        us = (time.perf_counter_ns() - t0) / 1000
        steps.append({
            "layer": name,
            "us": round(us, 1),
            "input_size": len(s) if isinstance(s, str) else None,
            "output_size": len(out) if isinstance(out, str) else None,
            "repairs_so_far": len(repairs),
        })
        return out

    ok, value = layer4.try_fast_path(text)
    steps.append({"layer": "fast_path", "us": 0.0, "hit": ok,
                  "input_size": len(text), "output_size": None, "repairs_so_far": 0})
    if ok:
        return {"ok": True, "value": value, "steps": steps}
    if detectors.plain_text(text):
        steps.append({"layer": "plain_text_detector", "us": 0.0, "hit": True,
                      "input_size": len(text), "output_size": 0, "repairs_so_far": 0})
        return {"ok": True, "value": "", "steps": steps}

    def pre(s):
        out, r = preprocessing.preprocess(s, config.enable_escape_normalization)
        repairs.extend(r)
        return out

    def l1(s):
        out, r = layer1.clean(s, config.trailing_dots_threshold)
        repairs.extend(r)
        return out

    s = step("preprocessing", pre, text)
    s = step("content_cleaning", l1, s)

    t0 = time.perf_counter_ns()
    try:
        value, all_repairs = parse_document(
            s, repairs=repairs, max_depth=config.max_parse_depth,
            allow_multiple=config.enable_multiple_json_aggregation,
            allow_merge=config.enable_object_merging,
        )
        ok = value is not SKIP
    except Exception as e:  # noqa: BLE001 — diagnostics path mirrors layer rescue
        value, ok, all_repairs = str(e), False, repairs
    steps.append({"layer": "tolerant_parse",
                  "us": round((time.perf_counter_ns() - t0) / 1000, 1),
                  "input_size": len(s), "output_size": None,
                  "repairs_so_far": len(all_repairs)})
    return {"ok": ok, "value": None if not ok else value, "steps": steps,
            "repairs": [r.as_dict() for r in all_repairs]}
