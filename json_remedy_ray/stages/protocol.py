"""User-extension surface: the Stage protocol (SURVEY §2.9 last row).

The reference exposes ``LayerBehaviour`` (process/2, supports?/1,
priority/0, name/0 — layer_behaviour.ex:36-60) so users can inject
custom layers.  The Ray-native equivalent: a ``Stage`` is a named,
orderable, toggleable batch transform; ``build_pipeline`` folds an
ordered list of stages over a Dataset with per-stage lineage columns
optional.

    pipeline = [
        Stage("repair", make_repair_fn(cfg)),
        Stage("my_custom_filter", my_fn, enabled=flags.custom),
    ]
    ds = build_pipeline(ds, pipeline)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data as rd


@dataclass
class Stage:
    name: str
    fn: Callable[[pa.Table], pa.Table]
    enabled: bool = True
    priority: int = 100          # lower runs earlier (reference priority/0)
    batch_size: int | None = None
    batch_format: str = "pyarrow"
    # optional cheap gate: skip the stage entirely when no row needs it
    # (reference supports?/1); receives the batch, returns bool
    supports: Callable[[pa.Table], bool] | None = None
    kwargs: dict[str, Any] = field(default_factory=dict)


def build_pipeline(ds: rd.Dataset, stages: list[Stage]) -> rd.Dataset:
    """Fold enabled stages in priority order onto the Dataset."""
    for stage in sorted([s for s in stages if s.enabled], key=lambda s: s.priority):
        fn = stage.fn
        if stage.supports is not None:
            gate = stage.supports
            inner = fn

            def gated(batch, _gate=gate, _inner=inner):
                return _inner(batch) if _gate(batch) else batch

            fn = gated
        ds = ds.map_batches(fn, batch_format=stage.batch_format,
                            batch_size=stage.batch_size, **stage.kwargs)
    return ds
