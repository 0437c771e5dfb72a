"""Sources: file/stream entry points (SURVEY §2.1 parity).

  reference `from_file/2`      -> read_and_repair_file / read_and_repair_text
  reference `repair_stream/2`  -> repair_dataset (keeps failed rows as
                                  columns instead of silently dropping,
                                  SURVEY §3.2) + repair_stream_drop_errors
                                  for exact reference semantics
"""

from __future__ import annotations

import ray.data as rd

from json_remedy_ray.config import DEFAULT_CONFIG, RepairConfig
from json_remedy_ray.repair.pipeline import repair
from json_remedy_ray.stages.repair_stage import make_repair_fn


def read_and_repair_file(path: str, config: RepairConfig = DEFAULT_CONFIG):
    """Repair ONE file's whole contents (reference ``from_file/2``,
    lib/json_remedy.ex:182-187).  Driver-side — one document."""
    with open(path, encoding="utf-8", errors="replace") as f:
        return repair(f.read(), config)


def read_and_repair_text(paths, config: RepairConfig = DEFAULT_CONFIG,
                         line_mode: bool = True) -> rd.Dataset:
    """Text file(s) -> repaired Dataset.  ``line_mode=True`` treats each
    line as one document (NDJSON-ish), the distributed analogue of the
    reference's ``File.stream! |> repair_stream``; ``line_mode=False``
    repairs each whole file as one document."""
    if line_mode:
        ds = rd.read_text(paths)
    else:
        import pyarrow as pa

        ds = rd.read_binary_files(paths, include_paths=True)

        def decode(batch: pa.Table) -> pa.Table:
            texts = [b.decode("utf-8", errors="replace") for b in batch["bytes"].to_pylist()]
            return pa.table({
                "path": batch["path"],
                "text": pa.array(texts, type=pa.large_string()),
            })

        ds = ds.map_batches(decode, batch_format="pyarrow", batch_size=None)
    return repair_dataset(ds, config)


def repair_dataset(ds: rd.Dataset, config: RepairConfig = DEFAULT_CONFIG,
                   text_col: str = "text") -> rd.Dataset:
    """Map the fused repair stage over any Dataset with a text column."""
    return ds.map_batches(make_repair_fn(config, text_col=text_col),
                          batch_format="pyarrow", batch_size=None)


def repair_stream_drop_errors(ds: rd.Dataset, config: RepairConfig = DEFAULT_CONFIG,
                              text_col: str = "text") -> rd.Dataset:
    """Exact reference ``repair_stream/2`` semantics: failed rows dropped
    (lib/json_remedy.ex:204-216).  Prefer repair_dataset, which keeps
    errors measurable."""
    import pyarrow.compute as pc

    out = repair_dataset(ds, config, text_col)
    return out.map_batches(lambda b: b.filter(pc.equal(b["repair_ok"], True)),
                           batch_format="pyarrow", batch_size=None)
