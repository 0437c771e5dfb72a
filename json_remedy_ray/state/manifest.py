"""Per-partition checkpoint manifests for resumable output.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  Output layout (SURVEY §4.2):

    out_dir/
      bucket=0007/ part-*.parquet        # one directory per host bucket
      _manifests/bucket=0007.json        # written AFTER the data, atomically

A manifest records: partition key, input fragments, stage versions
(RepairConfig/FilterConfig hashes), repair-layer hit counts, rows
in/out, output files.  On restart, buckets whose manifest exists with
matching stage versions are skipped; everything else re-runs
idempotently (the pipeline is a pure function of input + config).
"""

from __future__ import annotations

import json
import os
import tempfile


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_manifests", f"bucket={bucket:04d}.json")


def write_manifest(out_dir: str, bucket: int, payload: dict) -> str:
    """Atomic write: temp file + rename (same filesystem)."""
    path = manifest_path(out_dir, bucket)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)
    return path


def load_manifest(out_dir: str, bucket: int) -> dict | None:
    path = manifest_path(out_dir, bucket)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def completed_buckets(out_dir: str, stage_versions: dict[str, str]) -> set[int]:
    """Buckets already finished under the SAME stage versions — safe to skip."""
    mdir = os.path.join(out_dir, "_manifests")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.startswith("bucket=") or not name.endswith(".json"):
            continue
        bucket = int(name[len("bucket="):-len(".json")])
        m = load_manifest(out_dir, bucket)
        if m and m.get("stage_versions") == stage_versions:
            done.add(bucket)
    return done


def make_manifest(bucket: int, input_fragments: list[str], stage_versions: dict[str, str],
                  rows_in: int, rows_out: int, layer_hits: dict[str, int],
                  output_files: list[str]) -> dict:
    return {
        "partition_key": f"host_bucket={bucket}",
        "input_fragments": sorted(input_fragments),
        "stage_versions": stage_versions,
        "repair_layer_hit_counts": layer_hits,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "output_files": sorted(output_files),
    }
