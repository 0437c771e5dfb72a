"""Fault tolerance: a worker dying mid-stage must not change results.

SURVEY §4.2 claims the repair UDF is deterministic + idempotent so Ray's
task retries are safe.  This test makes that claim empirical: a stage
kills its own worker process on the first attempt of one batch; Ray
retries the task, and the final output must be byte-identical to a
fault-free run."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _kill_once_fn(flag_path: str):
    from json_remedy_ray.stages.repair_stage import make_repair_fn

    inner = make_repair_fn()

    def fn(batch: pa.Table) -> pa.Table:
        # the first task to claim the flag kills its worker process hard
        try:
            fd = os.open(flag_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)  # simulate node/worker loss mid-task
        except FileExistsError:
            pass
        return inner(batch)

    return fn


def test_worker_death_mid_stage_is_transparent(ray_session, tmp_path):
    import ray.data as rd

    texts = [f"{{'id': {i}, vals: [1, 2,]}}" for i in range(2000)]
    flag = str(tmp_path / "killed.flag")

    ds = rd.from_items([{"text": t} for t in texts]).repartition(8)
    faulty = ds.map_batches(_kill_once_fn(flag), batch_format="pyarrow",
                            batch_size=None).to_pandas()
    assert os.path.exists(flag), "fault was never injected"

    clean = rd.from_items([{"text": t} for t in texts]).repartition(8).map_batches(
        __import__("json_remedy_ray.stages.repair_stage", fromlist=["make_repair_fn"]).make_repair_fn(),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()

    a = faulty.sort_values("text").reset_index(drop=True)
    b = clean.sort_values("text").reset_index(drop=True)
    assert len(a) == len(texts)
    assert a["repaired_json"].equals(b["repaired_json"])
    assert a["repair_ok"].all()
