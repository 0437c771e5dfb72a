"""Deterministic sampling operators for training-data curation.

A 100-TB corpus is subsampled constantly — per-source mixing ratios,
held-out eval splits, debugging slices.  Random sampling is useless at
scale (not reproducible, not resumable, can't be re-derived by a later
job); these operators use a DETERMINISTIC per-record hash so the same
sample falls out of every run, any engine can replicate it (the SQL
oracles recompute it independently), and a resumed job selects exactly
the rows the crashed one did.

Two shapes:

  stratified_sample_rate — keep each row iff
      hash(id) < rate(stratum) * 2^32
    Pure per-row filter inside map_batches: NO shuffle, no state, scales
    to any corpus; per-stratum rates are the training-mix knob (e.g.
    books 3x web).

  stratified_sample_k — exactly k rows per stratum: the k SMALLEST
    hash values within each stratum (a uniform ordered sample).  Runs
    as the group-wise top-N shape: a per-block combiner keeps only each
    block's local k-smallest per stratum, so the final
    groupby(stratum) shuffles at most k * n_blocks rows — never the
    corpus.

The hash is the 32-bit Knuth multiplicative hash (2654435761 = floor
(2^32 / phi), public domain folklore) — chosen over the engine's
splitmix64 because it is exactly replicable in ANSI SQL with BIGINT
arithmetic, which is what makes the sample auditable by any warehouse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def sample_hash(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 as uint64 — SQL:
    ``(id * 2654435761) % 4294967296``."""
    return (ids.astype(np.uint64) * _KNUTH) & _M32


def stratified_sample_rate(ds: rd.Dataset, rates, id_col: str = "doc_id",
                           stratum_col: str = "source",
                           default_rate: float = 0.0) -> rd.Dataset:
    """Keep each row iff sample_hash(id) < rate(stratum) * 2^32.
    ``rates`` is a dict (broadcast in the task closure — small side) or
    a callable stratum -> rate; unknown strata use ``default_rate``."""
    rate_fn = rates.get if isinstance(rates, dict) else rates
    default = np.uint64(int(default_rate * 4294967296))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        strata = batch[stratum_col].to_numpy(zero_copy_only=False)
        h = sample_hash(ids)
        # vectorized threshold lookup over the (few) distinct strata
        thr = np.empty(len(ids), dtype=np.uint64)
        thr[:] = default
        for s in pd.unique(strata):
            r = rate_fn(s)
            if r is not None:
                thr[strata == s] = np.uint64(int(r * 4294967296))
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def stratified_sample_k(ds: rd.Dataset, k: int,
                        id_col: str = "doc_id",
                        stratum_col: str = "source") -> rd.Dataset:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest hash
    values (ties broken by id — the hash is injective on ids < 2^32 but
    the tie-break keeps the contract explicit).  Per-block combiner
    first, then one small groupby."""

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "stratum": batch[stratum_col].to_numpy(zero_copy_only=False),
            "id": ids,
            "h": sample_hash(ids).view(np.int64),  # signed for arrow
        })
        df = df.sort_values(["stratum", "h", "id"], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("stratum", sort=False).head(k),
                                    preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "id"], kind="mergesort").head(k)
        return pd.DataFrame({
            "stratum": g["stratum"].to_numpy(),
            "id": g["id"].astype("int64").to_numpy(),
            "sample_rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    local = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    return local.groupby("stratum").map_groups(final_topk, batch_format="pandas")
